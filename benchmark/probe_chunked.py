"""Column-chunked gather A/B (round 4): ColChunkedEllPlan vs the flat
bucketed-ELL gather, interleaved in one session.

Motivation: probe_gather_tablesize.py measured the v5e random row-gather
at 2.7 ns/row for tables <=16 MB vs 10.6 ns/row beyond, with 4 MB chunked
slices restoring 2.09 ns/row. The reddit-scale hybrid residue gathers
from a 60 MB table (F=64 fp32) and is >99 % of hybrid time — this probe
measures the real op both ways:

  1. reddit-clustered 233K x 115M edges: spmm_hybrid fwd (f32 + bf16),
     spmm_hybrid_t (the backward's d_dense), chunked vs flat residue.
  2. arxiv-scale 169K x 1.17M: spmm_bucketed_ell vs spmm_col_chunked_ell
     (41 MB table — smaller win expected, gate-check).

Run: python benchmark/probe_chunked.py [--arxiv-only|--reddit-only]
"""

import argparse
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


def _gfs(nnz, feat, dt):
    return 2.0 * nnz * feat / dt / 1e9


def bench_reddit(results):
    from benchmark.bench_scale import clustered_graph
    from dgsparse_tpu import SparseTensor
    from dgsparse_tpu.core.planner import ColChunkedEllPlan, HybridPlan
    from dgsparse_tpu.kernels.pallas_spmm import (spmm_hybrid,
                                                  spmm_hybrid_t)
    from dgsparse_tpu.utils.bench import time_pytree_2pt

    m = 232965
    feat = 64
    t0 = time.perf_counter()
    rowptr, col = clustered_graph(m, m, 492, seed=0)
    nnz = len(col)
    log(f"graph built {time.perf_counter()-t0:.1f}s nnz={nnz}")
    t0 = time.perf_counter()
    sp = SparseTensor.from_csr(rowptr, col, None, sparse_sizes=(m, m),
                               build_plans="ell")
    st = sp.storage
    plan = st.ell_plan()
    log(f"from_csr {time.perf_counter()-t0:.1f}s plan={type(plan).__name__}")
    assert isinstance(plan, HybridPlan)
    cp = st.ell_chunked(feat, 4)
    assert cp is not None and isinstance(cp.ell, ColChunkedEllPlan), \
        "chunked plan not built"
    log(f"chunked residue: nchunks={cp.ell.nchunks} "
        f"pad={cp.ell.pad_ratio():.3f} (flat pad={plan.ell.pad_ratio():.3f})"
        + (f"; ell_t nchunks="
           f"{cp.ell_t.nchunks if isinstance(cp.ell_t, ColChunkedEllPlan) else 'flat'}"))
    from dgsparse_tpu.core.planner import materialize_cells_np

    w = None
    if plan.cells is not None:
        w = {"cells": jnp.asarray(materialize_cells_np(plan.cells, None))}
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((m, feat)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((m, feat)).astype(np.float32))

    def fwd(x, pl, ww, cd):
        return spmm_hybrid(pl, None, x, compute_dtype=cd, w_slot=ww)

    def bwd(x, pl, ww, cd):
        return spmm_hybrid_t(pl, None, x, compute_dtype=cd, w_slot=ww)

    # interleaved rounds: flat / chunked alternate within the session
    for rnd in range(3):
        for tag, pl in (("flat", plan), ("chunk", cp)):
            for cd, cdt in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
                dt = time_pytree_2pt(
                    lambda x, pl, ww, cd=cd: fwd(x, pl, ww, cd),
                    (b, pl, w), iters=(2, 6), repeats=1)
                key = f"reddit hybrid fwd {cdt} {tag}"
                log(f"  [{key:34s}] r{rnd} {dt*1e3:8.1f} ms "
                    f"({_gfs(nnz, feat, dt):6.1f} GF/s)")
                results.setdefault(key, []).append(dt)
            dt = time_pytree_2pt(
                lambda x, pl, ww: bwd(x, pl, ww, jnp.float32),
                (g, pl, w), iters=(2, 6), repeats=1)
            key = f"reddit hybrid_t f32 {tag}"
            log(f"  [{key:34s}] r{rnd} {dt*1e3:8.1f} ms "
                f"({_gfs(nnz, feat, dt):6.1f} GF/s)")
            results.setdefault(key, []).append(dt)


def bench_arxiv(results):
    from benchmark.bench_scale import power_law_graph
    from dgsparse_tpu import SparseTensor
    from dgsparse_tpu.core.planner import ColChunkedEllPlan
    from dgsparse_tpu.kernels.pallas_spmm import (spmm_bucketed_ell,
                                                  spmm_col_chunked_ell)
    from dgsparse_tpu.utils.bench import time_pytree_2pt

    m = 169343
    rowptr, col = power_law_graph(m, m, 1166243, seed=0)
    nnz = len(col)
    sp = SparseTensor.from_csr(rowptr, col, None, sparse_sizes=(m, m))
    st = sp.storage
    plan = st.ell_plan()
    rng = np.random.default_rng(1)
    for feat in (64, 128):
        cp = st.ell_chunked(feat, 4)
        if cp is None or not isinstance(cp, ColChunkedEllPlan):
            log(f"  arxiv F={feat}: no chunked plan "
                f"(type={type(cp).__name__})")
            continue
        log(f"  arxiv F={feat}: nchunks={cp.nchunks} "
            f"pad={cp.pad_ratio():.3f} vs flat {plan.pad_ratio():.3f}")
        b = jnp.asarray(rng.standard_normal((m, feat)).astype(np.float32))
        for rnd in range(3):
            dt_f = time_pytree_2pt(
                lambda x, pl: spmm_bucketed_ell(pl, None, x), (b, plan),
                iters=(3, 9), repeats=1)
            dt_c = time_pytree_2pt(
                lambda x, pl: spmm_col_chunked_ell(pl, None, x), (b, cp),
                iters=(3, 9), repeats=1)
            log(f"  [arxiv F={feat} flat ] r{rnd} {dt_f*1e3:7.2f} ms "
                f"({_gfs(nnz, feat, dt_f):5.1f} GF/s)")
            log(f"  [arxiv F={feat} chunk] r{rnd} {dt_c*1e3:7.2f} ms "
                f"({_gfs(nnz, feat, dt_c):5.1f} GF/s)")
            results.setdefault(f"arxiv F={feat} flat", []).append(dt_f)
            results.setdefault(f"arxiv F={feat} chunk", []).append(dt_c)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arxiv-only", action="store_true")
    ap.add_argument("--reddit-only", action="store_true")
    args = ap.parse_args()
    results = {}
    if not args.reddit_only:
        bench_arxiv(results)
    if not args.arxiv_only:
        bench_reddit(results)
    out = {k: {"ms": [round(x * 1e3, 2) for x in v],
               "min_ms": round(min(v) * 1e3, 2)}
           for k, v in results.items()}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
