"""Standalone SpMM example on a MatrixMarket graph.

Mirror of the reference C example (example/ge-spmm/spmm.cu): load a .mtx,
validate every algorithm against the host reference, then time each and
report GFLOPS (2*nnz*N/t).

Run: python examples/spmm_example.py [path/to/graph.mtx] [feat]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_MTX = "/root/reference/example/data/p2p-Gnutella31.mtx"


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_MTX
    feat = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import jax
    import jax.numpy as jnp

    from dgsparse_tpu import Algorithm, SparseTensor, spmm
    from dgsparse_tpu.utils.bench import spmm_gflops, time_fn
    from dgsparse_tpu.utils.testing import load_mtx, random_csr, spmm_oracle

    if os.path.exists(path):
        rowptr, col, vals, (m, n) = load_mtx(path)
    else:
        print(f"{path} not found; using a synthetic graph", file=sys.stderr)
        m = n = 10000
        rowptr, col, vals = random_csr(m, n, avg_degree=8.0, seed=0)
    nnz = len(col)
    print(f"A: {m}x{n}, nnz={nnz}; B: {n}x{feat}; "
          f"backend={jax.default_backend()}")
    if jax.default_backend() != "tpu":
        # compiled Pallas is TPU-only; interpret mode keeps the example
        # runnable (slowly) on any backend
        from dgsparse_tpu.kernels import pallas_spmm

        pallas_spmm.set_interpret(True)

    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(m, n))
    b = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((n, feat)).astype(np.float32))
    ref = spmm_oracle(rowptr, col, vals, np.asarray(b), "sum")

    on_tpu = jax.default_backend() == "tpu"
    warmup, iters = (10, 100) if on_tpu else (1, 3)
    algos = [Algorithm.XLA_SEGMENT, Algorithm.PALLAS_EDGE_TILE,
             Algorithm.PALLAS_ROW_TILE, Algorithm.PALLAS_BELL,
             Algorithm.AUTO]
    for alg in algos:
        fn = jax.jit(lambda x: spmm(sp, x, "sum", alg))
        out = np.asarray(jax.device_get(fn(b)))
        ok = np.allclose(out, ref, rtol=1e-3, atol=1e-3)
        t = time_fn(fn, b, warmup=warmup, iters=iters)
        print(f"  alg={alg.name:18s} check={'PASS' if ok else 'FAIL'} "
              f"time={t * 1e6:9.1f} us  {spmm_gflops(nnz, feat, t):8.2f} "
              f"GFLOP/s")


if __name__ == "__main__":
    main()
