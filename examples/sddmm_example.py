"""Standalone SDDMM example (mirror of example/sddmm/sddmm.cu): load a .mtx,
validate vs host reference, time, report GFLOPS (2*nnz*K/t).

Run: python examples/sddmm_example.py [path/to/graph.mtx] [feat]
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

    from dgsparse_tpu import SparseTensor, sddmm
    from dgsparse_tpu.utils.bench import time_fn
    from dgsparse_tpu.utils.testing import load_mtx, random_csr, sddmm_oracle

    if os.path.exists(path):
        rowptr, col, _, (m, n) = load_mtx(path)
    else:
        m = n = 10000
        rowptr, col, _ = random_csr(m, n, avg_degree=8.0, seed=0)
    nnz = len(col)
    print(f"A pattern: {m}x{n}, nnz={nnz}; K={feat}; "
          f"backend={jax.default_backend()}")

    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               sparse_sizes=(m, n))
    rng = np.random.default_rng(0)
    d1 = jnp.asarray(rng.standard_normal((m, feat)).astype(np.float32))
    d2 = jnp.asarray(rng.standard_normal((n, feat)).astype(np.float32))

    fn = jax.jit(lambda a, b: sddmm(sp, a, b))
    out = np.asarray(jax.device_get(fn(d1, d2)))
    k = int(rowptr[1024])
    ref = sddmm_oracle(rowptr[:1025], col[:k], np.asarray(d1),
                       np.asarray(d2))
    ok = np.allclose(out[:k], ref[:k], rtol=1e-3, atol=1e-3)
    t = time_fn(fn, d1, d2, warmup=10, iters=100)
    print(f"  check={'PASS' if ok else 'FAIL'} time={t * 1e6:9.1f} us  "
          f"{2 * nnz * feat / t / 1e9:8.2f} GFLOP/s")


if __name__ == "__main__":
    main()
