"""Real-graph SpMM rows (VERDICT r3 #2/#4): the two genuine SNAP graphs
bundled by the reference — p2p-Gnutella31 (its published headline) and
ca-CondMat (example/data/ca-CondMat.mtx, never measured before) — through
the public API with AUTO selection, plus the plan/pad statistics the
structure-dependent claims rest on.

Run: python benchmark/bench_real.py [feat ...]
Writes benchmark/results_real.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgsparse_tpu.utils.cache import enable

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

DATA = "/root/reference/example/data"
GRAPHS = ["ca-CondMat.mtx", "p2p-Gnutella31.mtx"]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def plan_stats(sp):
    from dgsparse_tpu.core.planner import (BucketedEllPlan, EllPlan,
                                           HybridPlan)

    plan = sp.storage.ell_plan()
    st = {"plan": type(plan).__name__ if plan is not None else None}
    if isinstance(plan, HybridPlan):
        cells_edges = int(plan.cells.nnz) if plan.cells is not None else 0
        bell_edges = int(plan.bell.nnz) if plan.bell is not None else 0
        st["tier_split"] = {"cells": cells_edges, "bell": bell_edges,
                            "ell": int(plan.ell.nnz)}
        plan = plan.ell
    if isinstance(plan, BucketedEllPlan):
        slots = sum(rb * k for rb, k in zip(plan.rbs, plan.ks))
        st["buckets"] = [[int(rb), int(k)]
                         for rb, k in zip(plan.rbs, plan.ks)]
        st["pad_ratio"] = round(slots / max(plan.nnz, 1), 4)
    elif isinstance(plan, EllPlan):
        st["pad_ratio"] = round(plan.cols.size / max(plan.nnz, 1), 4)
    return st


def main():
    feats = [int(a) for a in sys.argv[1:]] or [32, 64, 128]
    from dgsparse_tpu import Algorithm, SparseTensor, spmm
    from dgsparse_tpu.utils.bench import time_pytree_2pt
    from dgsparse_tpu.utils.testing import load_mtx, spmm_oracle

    rows = []
    for gname in GRAPHS:
        path = os.path.join(DATA, gname)
        if not os.path.exists(path):
            log(f"skip {gname}: not found")
            continue
        rowptr, col, vals, (m, n) = load_mtx(path)
        nnz = len(col)
        deg = np.diff(rowptr)
        sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                                   jnp.asarray(vals), sparse_sizes=(m, n))
        stats = plan_stats(sp)
        log(f"{gname}: M={m} nnz={nnz} deg(max/mean)="
            f"{deg.max()}/{deg.mean():.2f} {stats}")
        for f in feats:
            rng = np.random.default_rng(0)
            b = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
            fn = jax.jit(lambda x: spmm(sp, x, "sum", Algorithm.AUTO))
            out = np.asarray(jax.device_get(fn(b)))
            ref = spmm_oracle(rowptr, col, vals, np.asarray(b), "sum")
            np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)
            dt = time_pytree_2pt(lambda x: spmm(sp, x, "sum",
                                                Algorithm.AUTO), (b,),
                                 iters=(20, 100), repeats=3)
            gf = 2.0 * nnz * f / dt / 1e9
            log(f"  F={f:4d}: {dt*1e6:8.1f} us  {gf:7.2f} GF/s")
            rows.append({"graph": gname, "feat": f, "nnz": int(nnz),
                         "m": int(m), "us": round(dt * 1e6, 1),
                         "gflops": round(gf, 2),
                         "deg_max": int(deg.max()),
                         "deg_mean": round(float(deg.mean()), 2),
                         "plan": stats})
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results_real.json")
    with open(out_path, "w") as fh:
        json.dump({"backend": jax.default_backend(), "rows": rows}, fh,
                  indent=1)
    log(f"wrote {out_path}")


if __name__ == "__main__":
    main()
