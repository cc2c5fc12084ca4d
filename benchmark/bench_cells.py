"""Isolated dense-cell tier benchmark (VERDICT r3 #6): the no-gather
block-sparse GEMM tier of the hybrid SpMM, measured ALONE so its own
distance to the MXU/HBM roofline is visible (the end-to-end hybrid
number buries it under the residue's random gather).

Role analog of the reference's center-tap dense cuBLAS GEMM
(src/cuda/spconv_cuda.cu:44-83) — prove the TPU version saturates.

Sweeps F in {64, 128, 256} x compute dtype {fp32, bf16}. Rooflines per
cell pass: FLOPs = 2*ncells*R*C*F; HBM bytes = cells (ncells*R*C*4) +
in/out rows touched.

Run: python benchmark/bench_cells.py [--quick]
Writes benchmark/results_cells.json.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgsparse_tpu.utils.cache import enable

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

V5E_FP32 = 98.5e12   # MXU fp32 (fp32 inputs run at half bf16 rate)
V5E_BF16 = 197e12
HBM_GBPS = 819.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def clustered_csr(m, n, avg_degree, seed=0, cluster=128, p_in=0.8):
    """Block-clustered random graph: p_in of edges fall inside the
    diagonal [cluster x cluster] block of their row — the same generator
    shape bench_scale.py uses for reddit-clustered."""
    rng = np.random.default_rng(seed)
    deg = np.maximum(rng.poisson(avg_degree, m), 1)
    rowptr = np.zeros(m + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    nnz = int(rowptr[-1])
    row = np.repeat(np.arange(m), deg)
    inside = rng.random(nnz) < p_in
    base = (row // cluster) * cluster
    col = np.where(
        inside,
        base + rng.integers(0, cluster, nnz),
        rng.integers(0, n, nnz)).astype(np.int64)
    col = np.minimum(col, n - 1)
    order = np.lexsort((col, row))
    col = col[order]
    rowptr = rowptr.astype(np.int32)
    vals = rng.standard_normal(nnz).astype(np.float32)
    return rowptr, col.astype(np.int32), vals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    from dgsparse_tpu import SparseTensor
    from dgsparse_tpu.core.planner import HybridPlan
    from dgsparse_tpu.kernels.pallas_spmm import spmm_dense_cells
    from dgsparse_tpu.utils.bench import time_pytree_2pt

    m = n = 65_536 if args.quick else 233_000
    avg = 64 if args.quick else 492
    rowptr, col, vals = clustered_csr(m, n, avg)
    nnz = len(col)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(m, n))
    hp = sp.storage.ell_plan()
    if not isinstance(hp, HybridPlan) or hp.cells is None:
        log(f"no dense-cell tier built (plan={type(hp).__name__}) — "
            "generator produced insufficient clustering")
        sys.exit(1)
    plan = hp.cells
    ncells = plan.num_cells
    r, c = plan.row_block, plan.col_window
    cell_edges = int(plan.nnz)
    fill = cell_edges / (ncells * r * c)
    log(f"graph: M={m} nnz={nnz}; cells tier: {ncells} cells "
        f"[{r}x{c}], {cell_edges} edges ({100*cell_edges/nnz:.1f}% of "
        f"graph), fill {100*fill:.1f}%")
    cells = sp.storage.vslot()["ell"]["cells"]

    rows = []
    rng = np.random.default_rng(1)
    feats = [64, 128] if args.quick else [64, 128, 256]
    for f in feats:
        b = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
        for dt_name, cdt, peak in (("fp32", jnp.float32, V5E_FP32),
                                   ("bf16", jnp.bfloat16, V5E_BF16)):
            fn = (lambda cells_, x, cdt=cdt:
                  spmm_dense_cells(plan, cells_, x, compute_dtype=cdt))
            dt = time_pytree_2pt(fn, (cells, b), iters=(10, 50), repeats=3)
            flops = 2.0 * ncells * r * c * f
            # bytes: cell blocks + one read of the touched B windows per
            # cell + one out write per cell row-block (upper bound)
            nbytes = ncells * r * c * 4 + ncells * c * f * 4 \
                + ncells * r * f * 4
            gf = flops / dt / 1e9
            mxu = flops / dt / peak
            hbm = (nbytes / HBM_GBPS / 1e9) / dt
            log(f"  F={f:4d} {dt_name}: {dt*1e3:8.3f} ms  {gf:8.1f} GF/s"
                f"  {100*mxu:5.1f}% MXU  {100*hbm:5.1f}% HBM")
            rows.append({"feat": f, "dtype": dt_name,
                         "ms": round(dt * 1e3, 3),
                         "gflops": round(gf, 1),
                         "mxu_pct": round(100 * mxu, 1),
                         "hbm_pct": round(100 * hbm, 1),
                         "ncells": int(ncells), "fill_pct":
                         round(100 * fill, 1)})
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_cells.json")
    with open(out, "w") as fh:
        json.dump({"backend": jax.default_backend(),
                   "graph": {"m": m, "nnz": int(nnz)},
                   "rows": rows}, fh, indent=1)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
