"""Probe: dense-cell tier vs one-hot BELL hybrid on a clustered graph.

Usage: python benchmark/probe_cells.py [edges_M] [feat]
Builds a Reddit-like clustered graph (scaled down by default for fast
iteration), then times the hybrid forward with and without the dense-cell
tier, fp32 and bf16 compute.
"""

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


def clustered_graph(m, n, avg_deg, seed=0, intra=0.8, comm=194):
    rng = np.random.default_rng(seed)
    deg = np.maximum(rng.poisson(avg_deg, m), 1).astype(np.int64)
    nnz = int(deg.sum())
    row = np.repeat(np.arange(m, dtype=np.int64), deg)
    c0 = (row // comm) * comm
    width = np.minimum(comm, n - c0)
    is_intra = rng.random(nnz) < intra
    col = np.where(
        is_intra,
        c0 + rng.integers(0, 1 << 30, nnz) % width,
        rng.integers(0, n, nnz),
    ).astype(np.int32)
    order = np.argsort(row * (n + 1) + col, kind="stable")
    col = col[order]
    rowptr = np.zeros(m + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    return rowptr.astype(np.int32), col


def main():
    edges_m = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    feat = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    m = n = 232965 if edges_m > 60 else 60000
    avg_deg = edges_m * 1e6 / m
    t0 = time.perf_counter()
    rowptr, col = clustered_graph(m, n, avg_deg)
    nnz = len(col)
    log(f"graph: M={m} nnz={nnz} ({time.perf_counter()-t0:.1f}s)")

    from dgsparse_tpu.core.planner import build_hybrid_plan
    from dgsparse_tpu.core.planner import materialize_cells_np
    from dgsparse_tpu.kernels.pallas_spmm import (spmm_dense_cells,
                                                  spmm_hybrid)
    from dgsparse_tpu.ops.types import ReduceOp
    from dgsparse_tpu.utils.bench import time_pytree_2pt

    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((n, feat)).astype(np.float32))
    roof_bytes = (nnz + 2 * m) * feat * 4

    variants = [
        ("3tier", dict(dense_min_edges=768)),
        ("2tier(old)", dict(dense_min_edges=1 << 60)),
    ]
    for name, kw in variants:
        t0 = time.perf_counter()
        plan = build_hybrid_plan(rowptr, col, n, **kw)
        tb = time.perf_counter() - t0
        if plan is None:
            log(f"[{name}] no hybrid plan")
            continue
        nc = plan.cells.num_cells if plan.cells is not None else 0
        ncz = plan.cells.nnz if plan.cells is not None else 0
        nbell = plan.bell.nnz if plan.bell is not None else 0
        log(f"[{name}] build {tb:.1f}s cells={nc} ({ncz/1e6:.1f}M edges, "
            f"fill {plan.cells.fill_ratio():.2f})" if nc else
            f"[{name}] build {tb:.1f}s cells=0", f"bell={nbell/1e6:.1f}M "
            f"ell={plan.ell.nnz and (nnz-ncz-nbell)/1e6:.1f}M")
        w = None
        if plan.cells is not None:
            t0 = time.perf_counter()
            cells = jnp.asarray(materialize_cells_np(plan.cells, None))
            w = {"cells": cells}
            log(f"  materialize_np {time.perf_counter()-t0:.1f}s "
                f"({cells.nbytes/1e6:.0f} MB)")
        # plans/weights passed as jit ARGUMENTS (closure-captured arrays
        # embed as HLO constants and blow the tunnel's remote-compile
        # request limit at 100M+ edges: HTTP 413)
        for cd in (jnp.float32, jnp.bfloat16):
            dt = time_pytree_2pt(
                lambda x, p, ww: spmm_hybrid(p, None, x, ReduceOp.SUM,
                                             compute_dtype=cd, w_slot=ww),
                (b, plan, w), iters=(10, 30), repeats=3)
            gf = 2 * nnz * feat / dt / 1e9
            roof = roof_bytes / dt / 819e9
            log(f"  [{name} {cd.__name__}] {dt*1e3:.1f} ms  {gf:.1f} GF/s "
                f"({100*roof:.1f}% roofline)")
        if plan.cells is not None:
            # cells tier alone
            for cd in (jnp.float32, jnp.bfloat16):
                dt = time_pytree_2pt(
                    lambda x, p, c: spmm_dense_cells(p, c, x,
                                                     compute_dtype=cd),
                    (b, plan.cells, cells), iters=(10, 30), repeats=3)
                log(f"  [cells-only {cd.__name__}] {dt*1e3:.2f} ms "
                    f"({dt/max(nc,1)*1e6:.2f} us/cell)")


if __name__ == "__main__":
    main()
