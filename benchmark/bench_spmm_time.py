"""SpMM benchmark sweep: schedules x graphs x feature widths x reductions.

Mirror of the reference harness (benchmark/bench_spmm_time.py: {datasets} x
feat {32,64,128} x reduce {sum,max,min,mean}, forward and forward+backward
timings) plus the reference's published per-algorithm table
(example/README.md:47-60), on the bundled p2p-Gnutella31.mtx, ref-shaped
synthetic graphs, and an ogbn-arxiv-scale graph.

Timing is two-point on-device with array-carry (utils/bench.py
time_pytree_2pt): the tunnel's fixed dispatch latency cancels, and the
cotangent is a carried input so the (linear) backward cannot be hoisted
out of the timing loop.

Run: python benchmark/bench_spmm_time.py [--quick] [--out results.json]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgsparse_tpu.utils.cache import enable as _enable_cache

_enable_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

DATASETS = {
    # name: (nodes, avg_degree, skew)  — cora/citeseer/pubmed/ppi-shaped
    "cora-like": (2708, 4.0, 1.0),
    "citeseer-like": (3327, 2.8, 1.0),
    "pubmed-like": (19717, 4.5, 1.0),
    "ppi-like": (44906, 15.0, 1.0),
    "arxiv-scale": (169343, 6.9, 1.3),
}
MTX = "/root/reference/example/data/p2p-Gnutella31.mtx"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def available_algorithms(sp):
    from dgsparse_tpu import Algorithm

    st = sp.storage
    on_tpu = jax.default_backend() == "tpu"
    algs = [Algorithm.XLA_SEGMENT]
    if st.plan() is not None and on_tpu:
        # EDGE_TILE/BELL compile Pallas kernels (interpret-only on CPU)
        algs.append(Algorithm.PALLAS_EDGE_TILE)
    if st.ell_plan() is not None:
        algs.append(Algorithm.PALLAS_ROW_TILE)
    if st.bell_plan() is not None and on_tpu:
        algs.append(Algorithm.PALLAS_BELL)
    return algs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--feats", default="32,64,128")
    ap.add_argument("--reduces", default="sum,max,min,mean")
    ap.add_argument("--graphs", default=None,
                    help="comma list; default = all")
    ap.add_argument("--out", default=None, help="write JSON rows here")
    ap.add_argument("--iters", default=None,
                    help="fwd two-point iter counts, e.g. 20,100")
    ap.add_argument("--bwd-iters", default=None,
                    help="fwd+bwd two-point iter counts, e.g. 5,20")
    ap.add_argument("--algs", default=None,
                    help="comma list of Algorithm names; default = all "
                         "available per graph")
    args = ap.parse_args()

    from dgsparse_tpu import SparseTensor, spmm
    from dgsparse_tpu.utils.bench import spmm_gflops, time_pytree_2pt
    from dgsparse_tpu.utils.testing import load_mtx, random_csr

    if jax.default_backend() != "tpu":
        # CPU smoke runs: Pallas kernels only exist in interpret mode there
        from dgsparse_tpu.kernels import pallas_spmm as _kp

        _kp.set_interpret(True)

    graphs = {}
    for name, (n, deg, skew) in DATASETS.items():
        if args.graphs and name not in args.graphs.split(","):
            continue
        # zlib.crc32, not hash(): str hashes are salted per process, so
        # hash(name) gave a different graph every run (incomparable rows)
        import zlib

        rowptr, col, vals = random_csr(n, n, avg_degree=deg,
                                       seed=zlib.crc32(name.encode()) % 97,
                                       skew=skew)
        graphs[name] = (rowptr, col, vals, n)
    if os.path.exists(MTX) and (not args.graphs
                                or "p2p" in args.graphs):
        rowptr, col, vals, (m, _) = load_mtx(MTX)
        graphs["p2p-Gnutella31"] = (rowptr, col, vals, m)

    feats = [int(f) for f in args.feats.split(",")]
    reduces = args.reduces.split(",")
    if args.quick:
        graphs = dict(list(graphs.items())[:1])
        feats, reduces = feats[:1], reduces[:2]
    iters = (10, 50) if args.quick else (20, 100)
    if args.iters:
        iters = tuple(int(v) for v in args.iters.split(","))
    bwd_iters = tuple(int(v) for v in args.bwd_iters.split(",")) \
        if args.bwd_iters else iters

    rows = []
    backend = jax.default_backend()
    log(f"backend={backend}")
    print(f"{'dataset':16s} {'alg':>10s} {'feat':>5s} {'reduce':>6s} "
          f"{'fwd_us':>9s} {'fwd_GF/s':>9s} {'fwd+bwd_us':>11s}")
    for name, (rowptr, col, vals, n) in graphs.items():
        sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                                   jnp.asarray(vals), sparse_sizes=(n, n))
        nnz = len(col)
        rng = np.random.default_rng(0)
        for feat in feats:
            x = jnp.asarray(rng.standard_normal((n, feat))
                            .astype(np.float32))
            ct = jnp.asarray(rng.standard_normal((n, feat))
                             .astype(np.float32))
            algs = available_algorithms(sp)
            if args.algs:
                want = args.algs.split(",")
                algs = [a for a in algs if a.name in want]
            for alg in algs:
                for reduce in reduces:
                    t_f = time_pytree_2pt(
                        lambda x_: spmm(sp, x_, reduce, alg), (x,),
                        iters=iters, repeats=1)

                    def fwdbwd(x_, ct_, reduce=reduce, alg=alg):
                        # value_and_grad + a nonlinear loss: a plain
                        # grad-of-vdot lets XLA drop the FORWARD of a
                        # linear op entirely (measured: XLA "fwd+bwd"
                        # 26 ms vs fwd 45 ms) — out*out keeps it alive
                        def loss(a):
                            out = spmm(sp, a, reduce, alg)
                            return jnp.vdot(out * out, ct_)

                        return jax.value_and_grad(loss)(x_)

                    t_fb = time_pytree_2pt(fwdbwd, (x, ct),
                                           iters=bwd_iters, repeats=1)
                    gf = spmm_gflops(nnz, feat, t_f)
                    print(f"{name:16s} {alg.name:>10s} {feat:5d} "
                          f"{reduce:>6s} {t_f * 1e6:9.1f} {gf:9.2f} "
                          f"{t_fb * 1e6:11.1f}", flush=True)
                    rows.append({
                        "dataset": name, "alg": alg.name, "nnz": nnz,
                        "feat": feat, "reduce": reduce, "backend": backend,
                        "fwd_us": round(t_f * 1e6, 1),
                        "fwd_gflops": round(gf, 2),
                        "fwdbwd_us": round(t_fb * 1e6, 1),
                    })
                    if args.out:   # incremental: a wedge must not lose rows
                        with open(args.out, "w") as f:
                            json.dump(rows, f, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
