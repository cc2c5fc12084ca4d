"""Random row-gather cost vs table size (round 4).

Recorded floors disagree per graph: p2p's 62.6K x 32 table (8 MB) gathers
at 1.76-2.06 ns/row while reddit's 233K x 64 (60 MB) pays 5.6 ns/row —
suggesting the XLA gather's issue rate is (cache/TLB) table-size bound.
If so, COLUMN-CHUNKING the ELL residue (per-chunk local indices into a
[chunk_n, F] slice of B) buys back up to ~3x of the reddit residue cost,
at the price of per-chunk K re-bucketing pad.

This probe measures ns/row for 16M random row gathers from tables of
4/8/16/32/64/128 MB at F=64, plus the same with bf16 tables, plus the
chunked formulation (gather from a sliced table) to confirm slicing
itself doesn't break the fast regime.

Run: python benchmark/probe_gather_tablesize.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgsparse_tpu.utils.cache import enable

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from dgsparse_tpu.utils.bench import time_pytree_2pt

    feat = 64
    n_idx = 16_000_000
    rng = np.random.default_rng(0)

    def t(fn, args, label, rows):
        dt = time_pytree_2pt(fn, args, iters=(3, 9), repeats=3)
        log(f"  [{label:34s}] {dt*1e3:9.2f} ms  "
            f"({dt*1e9/rows:5.2f} ns/row)")
        return dt

    for mb in (4, 8, 16, 32, 64, 128):
        n = mb * (1 << 20) // (feat * 4)
        tab = jnp.asarray(
            rng.standard_normal((n, feat)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, n, n_idx).astype(np.int32))
        t(lambda x, i: jnp.sum(jnp.take(x, i, axis=0)) * 1e-30
          + jnp.float32(0), (tab, idx), f"f32 take, table {mb:4d} MB",
          n_idx)
        tb = tab.astype(jnp.bfloat16)
        t(lambda x, i: jnp.sum(jnp.take(x, i, axis=0).astype(jnp.float32))
          * 1e-30 + jnp.float32(0), (tb, idx),
          f"bf16 take, table {mb:4d} MB ({mb//2} MB)", n_idx)

    # chunked formulation at the 64 MB point: indices pre-sorted into 8
    # chunks of the table (plan-time in the real op); each gather sees a
    # 1/8 slice. Includes the per-chunk output concat to be honest about
    # the assembly the real op would keep (the K-sum subsumes it there).
    mb = 64
    n = mb * (1 << 20) // (feat * 4)
    tab = jnp.asarray(rng.standard_normal((n, feat)).astype(np.float32))
    idx_np = rng.integers(0, n, n_idx).astype(np.int32)
    for nchunks in (4, 8, 16):
        cs = (n + nchunks - 1) // nchunks
        order = np.argsort(idx_np // cs, kind="stable")
        sorted_idx = idx_np[order]
        bounds = np.searchsorted(sorted_idx // cs, np.arange(nchunks + 1))
        locals_ = sorted_idx - (sorted_idx // cs) * cs
        # static per-chunk slot counts, padded to multiples of 8
        parts = []
        for c in range(nchunks):
            li = locals_[bounds[c]:bounds[c + 1]]
            pad = (-len(li)) % 8
            if pad:
                li = np.pad(li, (0, pad), mode="edge")
            parts.append(jnp.asarray(li))

        def chunked(x, *part_idx):
            outs = []
            for c, li in enumerate(part_idx):
                sl = jax.lax.slice(
                    x, (c * cs, 0),
                    (min((c + 1) * cs, x.shape[0]), feat))
                outs.append(jnp.take(sl, li, axis=0, mode="clip"))
            return sum(jnp.sum(o) for o in outs) * 1e-30 + jnp.float32(0)

        rows_tot = sum(p.shape[0] for p in parts)
        t(chunked, (tab, *parts),
          f"f32 chunked x{nchunks} (64 MB table)", rows_tot)


if __name__ == "__main__":
    main()
