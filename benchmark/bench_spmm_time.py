"""Forward+backward SpMM wall-time sweep.

Mirror of the reference harness (benchmark/bench_spmm_time.py: {datasets} x
feat {32,64,128} x reduce {sum,max,min,mean}, forward and forward+backward
timings), on synthetic graphs sized like the reference's datasets plus the
bundled .mtx graphs when present.

Run: python benchmark/bench_spmm_time.py [--quick]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATASETS = {
    # name: (nodes, avg_degree)  — shaped like cora/citeseer/pubmed/ppi
    "cora-like": (2708, 4.0),
    "citeseer-like": (3327, 2.8),
    "pubmed-like": (19717, 4.5),
    "ppi-like": (44906, 15.0),
}
MTX = "/root/reference/example/data/p2p-Gnutella31.mtx"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--feats", default="32,64,128")
    ap.add_argument("--reduces", default="sum,max,min,mean")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dgsparse_tpu import SparseTensor, spmm
    from dgsparse_tpu.utils.bench import spmm_gflops, time_on_device
    from dgsparse_tpu.utils.testing import load_mtx, random_csr

    graphs = {}
    for name, (n, deg) in DATASETS.items():
        rowptr, col, vals = random_csr(n, n, avg_degree=deg, seed=hash(name) % 97)
        graphs[name] = (rowptr, col, vals, n)
    if os.path.exists(MTX) and not args.quick:
        rowptr, col, vals, (m, _) = load_mtx(MTX)
        graphs["p2p-Gnutella31"] = (rowptr, col, vals, m)

    feats = [int(f) for f in args.feats.split(",")]
    reduces = args.reduces.split(",")
    if args.quick:
        graphs = dict(list(graphs.items())[:1])
        feats, reduces = feats[:1], reduces[:2]

    print(f"backend={jax.default_backend()}")
    print(f"{'dataset':16s} {'feat':>5s} {'reduce':>6s} "
          f"{'fwd_us':>9s} {'fwd_GF/s':>9s} {'fwd+bwd_us':>11s}")
    for name, (rowptr, col, vals, n) in graphs.items():
        sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                                   jnp.asarray(vals), sparse_sizes=(n, n))
        nnz = len(col)
        for feat in feats:
            x = jnp.asarray(np.random.default_rng(0)
                            .standard_normal((n, feat)).astype(np.float32))
            for reduce in reduces:
                iters = 20 if args.quick else 50
                t_f = time_on_device(
                    lambda s, x_: spmm(sp, x_ * s, reduce), x, iters=iters)

                def loss(x_, reduce=reduce):
                    return spmm(sp, x_, reduce).sum()

                grad = jax.grad(loss)
                t_fb = time_on_device(lambda s, x_: grad(x_ * s), x,
                                      iters=iters)
                print(f"{name:16s} {feat:5d} {reduce:>6s} "
                      f"{t_f * 1e6:9.1f} {spmm_gflops(nnz, feat, t_f):9.2f} "
                      f"{t_fb * 1e6:11.1f}")


if __name__ == "__main__":
    main()
