"""Headline benchmark: CSR SpMM GFLOP/s on p2p-Gnutella31, feat=32, fp32.

Mirrors the reference harness (example/ge-spmm/spmm.cu: correctness check
vs reference impl, warmup + timed iterations, GFLOPS = 2*nnz*N/t) on the
same bundled graph the reference publishes numbers for. Baseline to beat:
GE-SpMM alg0 on V100 = 207.23 GFLOP/s (example/README.md:49-50, see
BASELINE.md).

Prints ONE JSON line to stdout; diagnostics go to stderr.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_GFLOPS = 207.23  # GE-SpMM seqreduce row-balance, V100 (BASELINE.md)
MTX = "/root/reference/example/data/p2p-Gnutella31.mtx"
FEAT = 32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_graph():
    if os.path.exists(MTX):
        from dgsparse_tpu.utils.testing import load_mtx

        rowptr, col, vals, (m, n) = load_mtx(MTX)
        log(f"loaded {MTX}: M={m} nnz={len(col)}")
        return rowptr, col, vals, m, n
    # Synthetic stand-in with the same shape/nnz statistics.
    from dgsparse_tpu.utils.testing import random_csr

    m = n = 62586
    rowptr, col, vals = random_csr(m, n, avg_degree=147892 / m, seed=0,
                                   skew=1.0)
    log(f"reference mtx missing; synthetic M={m} nnz={len(col)}")
    return rowptr, col, np.abs(vals), m, n


def main():
    import jax
    import jax.numpy as jnp

    from dgsparse_tpu import Algorithm, SparseTensor, spmm
    from dgsparse_tpu.utils.testing import spmm_oracle

    rowptr, col, vals, m, n = load_graph()
    nnz = len(col)
    t0 = time.perf_counter()
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(m, n))
    log(f"construction {time.perf_counter() - t0:.2f}s "
        f"(pad_ratio={sp.storage.plan().pad_ratio():.2f})")

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, FEAT)).astype(np.float32))

    backend = jax.default_backend()
    alg = Algorithm.AUTO
    fn = jax.jit(lambda x: spmm(sp, x, "sum", alg))

    # Correctness gate (sampled rows vs numpy oracle), like the reference's
    # pre-timing check (example/ge-spmm/spmm.cu:133-137).
    out = np.asarray(jax.device_get(fn(b)))
    ref = spmm_oracle(rowptr[:2049], col[:int(rowptr[2048])],
                      vals[:int(rowptr[2048])], np.asarray(b), "sum")
    np.testing.assert_allclose(out[:2048], ref[:2048], rtol=1e-3, atol=1e-3)
    log(f"correctness OK on {backend}")

    # 10 warmup + 100 timed iters (example/ge-spmm/spmm.cu:199-216).
    for _ in range(10):
        r = fn(b)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    iters = 100
    for _ in range(iters):
        r = fn(b)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters

    gflops = 2.0 * nnz * FEAT / dt / 1e9
    log(f"spmm_sum p2p feat={FEAT}: {dt * 1e6:.1f} us, {gflops:.2f} GFLOP/s")
    print(json.dumps({
        "metric": f"spmm_sum GFLOP/s (p2p-Gnutella31, feat={FEAT}, fp32, "
                  f"{backend})",
        "value": round(gflops, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops / BASELINE_GFLOPS, 4),
    }))


if __name__ == "__main__":
    main()
