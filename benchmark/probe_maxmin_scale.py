"""SpMM MAX at Reddit scale (115M edges): what AUTO does and what it costs.

The dense-cell tier cannot serve MAX/MIN — materialized cells carry edge
MULTIPLICITY as summed weights (fill >100% on the clustered generator),
which is sum-semiring state; max needs every edge individually. So at
hybrid-selected scale MAX routes to the edge-chunked XLA formulation
(ops/spmm.py:_resolve_algorithm — the hybrid branch is SUM/MEAN only),
while MEAN rides the chunked hybrid tiers. This probe records both on the
same storage so the gap is a measured, explained number rather than a
missing row. Reference analog of the measured op:
include/cuda/spmm_cuda.cuh:400-433 (max with argmax residuals).

Run: python benchmark/probe_maxmin_scale.py [feat]
Writes benchmark/results_maxmin_scale_r4.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgsparse_tpu.utils.cache import enable

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    feat = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_scale import clustered_graph

    from dgsparse_tpu import SparseTensor, spmm
    from dgsparse_tpu.utils.bench import time_pytree_2pt

    m = 232_965
    rowptr, col = clustered_graph(m, m, 492.0, seed=0)
    nnz = len(col)
    log(f"graph: {m} nodes, {nnz} edges")
    jax.device_get(jnp.zeros((8,), jnp.float32) + 1.0)
    t0 = time.perf_counter()
    sp = SparseTensor.from_csr(rowptr, col, None, sparse_sizes=(m, m))
    log(f"from_csr {time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((m, feat)).astype(np.float32))
    rows = []
    raw = {}  # unrounded floats per reduce, for the summary ratios
    for reduce in ("mean", "max"):
        fwd = time_pytree_2pt(lambda x: spmm(sp, x, reduce), (b,),
                              iters=(2, 6), repeats=2)

        def loss(x):
            return spmm(sp, x, reduce).sum()

        fb = time_pytree_2pt(jax.grad(loss), (b,), iters=(2, 6), repeats=2)
        gf = 2.0 * nnz * feat / fwd / 1e9
        log(f"{reduce}: fwd {fwd*1e3:.1f} ms ({gf:.1f} GF/s), "
            f"fwd+bwd {fb*1e3:.1f} ms")
        raw[reduce] = (fwd, fb)
        rows.append({"reduce": reduce, "feat": feat, "nnz": int(nnz),
                     "fwd_ms": round(fwd * 1e3, 1),
                     "fwd_gflops": round(gf, 1),
                     "fwd_bwd_ms": round(fb * 1e3, 1)})
    # ratios live in a separate top-level key (NOT a rows entry missing
    # the measurement schema) and divide the unrounded floats
    summary = {"max_vs_mean_fwd": round(raw["max"][0] / raw["mean"][0], 3),
               "max_vs_mean_fwd_bwd": round(raw["max"][1] / raw["mean"][1],
                                            3)}
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_maxmin_scale_r4.json")
    with open(out, "w") as fh:
        json.dump({"backend": jax.default_backend(), "rows": rows,
                   "summary": summary}, fh, indent=1)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
