"""Generalized semiring SpMM demo — the u_<compute>_e_<reduce> op grid.

Mirror of the reference's gspmm-fp example (example/gspmm-fp/ + util.py):
load a graph, run every combination, time one op.

Run: python examples/gspmm_example.py [path/to/graph.mtx]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_MTX = "/root/reference/example/data/p2p-Gnutella31.mtx"


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_MTX

    import jax
    import jax.numpy as jnp

    from dgsparse_tpu import SparseTensor
    from dgsparse_tpu.ops import gspmm as G
    from dgsparse_tpu.utils.bench import time_fn
    from dgsparse_tpu.utils.testing import load_mtx, random_csr

    if os.path.exists(path):
        rowptr, col, vals, (m, n) = load_mtx(path)
    else:
        m = n = 10000
        rowptr, col, vals = random_csr(m, n, avg_degree=8.0, seed=0)
    vals = np.abs(vals) + 0.1  # keep DIV well-conditioned
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(m, n))
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((n, 64)).astype(np.float32))
    print(f"graph {m}x{n} nnz={len(col)}, backend={jax.default_backend()}")

    for cu in ("add", "sub", "mul", "div"):
        for rd in ("sum", "max", "min", "mean"):
            op = getattr(G, f"u_{cu}_e_{rd}")
            out = op(sp, x)
            print(f"  u_{cu}_e_{rd}: out[0,:3] = "
                  f"{np.asarray(out)[0, :3].round(4).tolist()}")
    for rd in ("sum", "max", "min", "mean"):
        op = getattr(G, f"copy_u_{rd}")
        out = op(sp, x)
        print(f"  copy_u_{rd}: out[0,:3] = "
              f"{np.asarray(out)[0, :3].round(4).tolist()}")

    fn = jax.jit(lambda x_: G.u_sub_e_sum(sp, x_))
    t = time_fn(fn, x, warmup=5, iters=50)
    print(f"u_sub_e_sum jitted: {t * 1e6:.1f} us "
          f"(reference publishes 400 us on RTX 3090, example/README.md:86-91)")


if __name__ == "__main__":
    main()
