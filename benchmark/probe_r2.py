"""Round-2 design probes on the real TPU (p2p-Gnutella31, F=32).

Questions:
 A. actual ESC pad ratios over (row_block, edge_tile)
 B. take cost at those padded row counts (the gather wall)
 C. unique-row scatter (.at[rows].set) vs gather — recombination options
 D. per-tile overhead of the existing segment_matmul at E=128/256/512
 E. bucketed-ELL pad with a finer K ladder
 F. hub coverage: top-k in-degree columns' edge share (VMEM-resident
    one-hot hybrid potential)
 G. today's end-to-end numbers for the existing algorithms (re-baseline)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgsparse_tpu.utils.cache import enable

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def dev_time(fn, x, iters=50):
    """On-device fori_loop timing; consumes full outputs."""
    @jax.jit
    def timed(s):
        def body(i, s):
            out = fn(x * s)
            return 1.0 + 0.0 * jnp.sum(out)
        return jax.lax.fori_loop(0, iters, body, s)

    jax.block_until_ready(timed(jnp.float32(1.0)))
    t0 = time.perf_counter()
    jax.block_until_ready(timed(jnp.float32(1.0)))
    return (time.perf_counter() - t0) / iters


def main():
    from dgsparse_tpu.utils.testing import load_mtx

    mtx = "/root/reference/example/data/p2p-Gnutella31.mtx"
    rowptr, col, vals, (m, n) = load_mtx(mtx)
    nnz = len(col)
    print(f"M={m} nnz={nnz}", flush=True)
    deg = np.diff(rowptr)

    # --- A: pad ratios ---
    print("\n[A] ESC pad ratios (padded_edges/nnz):", flush=True)
    for rb in (128, 256, 512, 1024):
        row_ids = np.arange(m) // rb
        blk = np.zeros(row_ids[-1] + 1, np.int64)
        np.add.at(blk, row_ids, deg)
        for e in (64, 128, 256, 512):
            padded = (-(-blk // e) * e).sum()
            print(f"  R={rb:5d} E={e:4d} pad={padded/nnz:.3f} "
                  f"tiles={padded//e}", flush=True)

    # --- E: bucketed-ELL ladder comparison ---
    print("\n[E] bucketed-ELL pad by ladder:", flush=True)
    for name, ladder in (
        ("pow1.41 (current)", [1, 2, 3, 4, 6, 8, 11, 16, 22, 32, 45, 64,
                               91, 128]),
        ("pow1.19 fine", [1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 17, 20, 24,
                          29, 34, 41, 49, 58, 69, 83, 99, 128]),
        ("exact<=16", list(range(1, 17)) + [20, 24, 29, 34, 41, 49, 58,
                                            69, 83, 99, 128]),
    ):
        lad = np.array(ladder, np.int64)
        kb = np.minimum(np.maximum(deg, 1), lad[-1])
        b = np.searchsorted(lad, kb)
        padded = lad[b].astype(np.int64)
        # rows above ladder max would overflow; p2p max deg:
        print(f"  {name:20s} pad={(padded.sum())/nnz:.3f} "
              f"buckets={len(np.unique(b))} maxdeg={deg.max()}", flush=True)

    # --- F: hub coverage ---
    indeg = np.zeros(n, np.int64)
    np.add.at(indeg, col, 1)
    order = np.argsort(-indeg)
    csum = np.cumsum(indeg[order])
    print("\n[F] hub (in-degree) coverage:", flush=True)
    for k in (128, 256, 512, 1024, 2048, 4096):
        print(f"  top {k:5d} cols cover {csum[k-1]/nnz*100:.1f}% of edges",
              flush=True)

    # --- B: take cost ---
    rng = np.random.default_rng(0)
    b32 = jnp.asarray(rng.standard_normal((n, 32)).astype(np.float32))
    print("\n[B] jnp.take row-gather cost from [62586, 32]:", flush=True)
    for cnt in (62586, 147892, 157000, 188000, 210000):
        idx = jnp.asarray(rng.integers(0, n, cnt).astype(np.int32))
        dt = dev_time(lambda x, idx=idx: jnp.take(x, idx, axis=0), b32)
        print(f"  {cnt:7d} rows: {dt*1e6:8.1f} us ({dt/cnt*1e9:.2f} ns/row)",
              flush=True)

    # --- C: row scatter vs gather for recombination ---
    print("\n[C] recombination: gather vs unique-row scatter (62586 rows):",
          flush=True)
    perm = rng.permutation(m).astype(np.int32)
    src = jnp.asarray(rng.standard_normal((m, 32)).astype(np.float32))
    pj = jnp.asarray(perm)
    dt = dev_time(lambda x: jnp.take(x, pj, axis=0), src)
    print(f"  gather x[perm]:        {dt*1e6:8.1f} us", flush=True)
    dt = dev_time(lambda x: jnp.zeros_like(x).at[pj].set(
        x, unique_indices=True, mode="promise_in_bounds"), src)
    print(f"  scatter .at[perm].set: {dt*1e6:8.1f} us", flush=True)
    # sorted-segment variant: indices nearly sorted (bucket-concat is
    # blockwise-sorted) — approximate with a blockwise-shuffled perm
    blocks = perm.reshape(-1, 2)  # mild locality
    dt = dev_time(lambda x: jnp.take(x, pj, axis=0).astype(jnp.float32), src)

    # --- D: segment_matmul per-tile overhead (existing kernel) ---
    print("\n[D] segment_matmul standalone (F_pad=128):", flush=True)
    from dgsparse_tpu.kernels.pallas_spmm import segment_matmul

    for e in (128, 256, 512):
        tiles = 147892 // e + 1
        lrow = jnp.asarray(rng.integers(0, 128, tiles * e).astype(np.int32))
        tile_rb = jnp.asarray(
            np.sort(rng.integers(0, m // 128, tiles)).astype(np.int32))
        contrib = jnp.asarray(
            rng.standard_normal((tiles * e, 128)).astype(np.float32))
        dt = dev_time(
            lambda x, lrow=lrow, tile_rb=tile_rb, tiles=tiles, e=e:
            segment_matmul(x, lrow, tile_rb, tiles, e, 128, m), contrib)
        print(f"  E={e:4d} tiles={tiles:5d}: {dt*1e6:8.1f} us "
              f"({dt/tiles*1e9:.0f} ns/tile)", flush=True)

    # --- G: end-to-end today ---
    print("\n[G] end-to-end spmm today (fresh SparseTensor):", flush=True)
    from dgsparse_tpu import Algorithm, SparseTensor, spmm

    t0 = time.perf_counter()
    sp = SparseTensor.from_csr(rowptr, col, vals, sparse_sizes=(m, n))
    print(f"  construction: {time.perf_counter()-t0:.2f}s", flush=True)
    for alg in ("PALLAS_ROW_TILE", "PALLAS_EDGE_TILE", "XLA_SEGMENT"):
        try:
            dt = dev_time(
                lambda x, a=Algorithm[alg]: spmm(sp, x, "sum", a), b32)
            gf = 2 * nnz * 32 / dt / 1e9
            print(f"  {alg:18s} {dt*1e6:8.1f} us  {gf:6.2f} GFLOP/s",
                  flush=True)
        except Exception as ex:
            print(f"  {alg:18s} FAILED: {ex}", flush=True)


if __name__ == "__main__":
    main()
