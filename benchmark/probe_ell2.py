"""Measure the reworked bucketed-ELL (empty-row exclusion + zeros-block
recombination) on p2p F=32, vs the XLA path, plus stage ablations."""

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
    @jax.jit
    def timed(s):
        def body(i, s):
            out = fn(x * s)
            return 1.0 + 0.0 * jnp.sum(out)
        return jax.lax.fori_loop(0, iters, body, s)

    jax.block_until_ready(timed(jnp.float32(1.0)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(timed(jnp.float32(1.0)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    from dgsparse_tpu import Algorithm, SparseTensor, spmm
    from dgsparse_tpu.utils.testing import load_mtx, spmm_oracle

    mtx = "/root/reference/example/data/p2p-Gnutella31.mtx"
    rowptr, col, vals, (m, n) = load_mtx(mtx)
    nnz = len(col)
    t0 = time.perf_counter()
    sp = SparseTensor.from_csr(rowptr, col, vals, sparse_sizes=(m, n))
    print(f"construction {time.perf_counter()-t0:.2f}s", flush=True)
    plan = sp.storage.ell_plan()
    print(f"buckets={len(plan.ks)} pad={plan.pad_ratio():.3f} "
          f"concat_rows={plan.concat_rows}", flush=True)

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, 32)).astype(np.float32))

    out = np.asarray(spmm(sp, b, "sum", Algorithm.PALLAS_ROW_TILE))
    ref = spmm_oracle(rowptr, col, vals, np.asarray(b), "sum")
    err = np.abs(out - ref).max()
    print(f"correctness maxerr={err:.2e}", flush=True)

    # stage ablation: raw gather of the plan's padded slots
    dt = dev_time(lambda x: jnp.take(x, plan.cols, axis=0), b)
    print(f"edge gather ({plan.cols.shape[0]} rows): {dt*1e6:.1f} us",
          flush=True)
    # recombination gather alone
    src = jnp.asarray(rng.standard_normal((m, 32)).astype(np.float32))
    dt = dev_time(lambda x: jnp.take(x, plan.inv_row, axis=0), src)
    print(f"inv_row gather ({m} rows): {dt*1e6:.1f} us", flush=True)

    for alg in ("PALLAS_ROW_TILE", "XLA_SEGMENT"):
        dt = dev_time(lambda x, a=Algorithm[alg]: spmm(sp, x, "sum", a), b)
        gf = 2 * nnz * 32 / dt / 1e9
        print(f"{alg:18s} {dt*1e6:8.1f} us  {gf:6.2f} GFLOP/s", flush=True)


if __name__ == "__main__":
    main()
