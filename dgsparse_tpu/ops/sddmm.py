"""SDDMM: sampled dense-dense matmul producing per-edge values.

Reference parity: the standalone SDDMM library (src/sddmm/sddmm.cu:8-41,
include/cuda/{coo,csr}sddmm_ebalance.cuh) and the torch-facing dispatchers
(src/cuda/spmm_cuda.cu:305-382). out[e] = dot(d1[row_e], d2[col_e]), with the
MEAN flavor dividing by the row degree (used by the SpMM-mean backward).

Differentiable w.r.t. both dense operands with a custom VJP:
  d_d1 = row-segment scatter of g[e]·d2[col_e]  (an SpMM-shaped op)
  d_d2 = col-segment scatter of g[e]·d1[row_e]  (SpMM over the CSC view)
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dgsparse_tpu.core.formats import SparseTensor
from dgsparse_tpu.kernels import xla as kx
from dgsparse_tpu.ops.types import ReduceOp, as_reduce

_FLOAT0 = jax.dtypes.float0


def _int_zero(x):
    return np.zeros(x.shape, dtype=_FLOAT0)


def _use_esc(plan, nnz) -> bool:
    """Gate for the backward's SpMMs only — ESC wins for transpose SpMM
    reductions (eval: 2.3 vs 3.0 ms p2p, 11.4 vs 20 ms arxiv-scale), while
    the forward's per-edge dots are pure gathers where XLA wins."""
    return (plan is not None and jax.default_backend() == "tpu"
            and nnz >= 4096 and plan.pad_ratio() <= 4.0)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _sddmm(reduce: ReduceOp, num_rows: int, num_cols: int, use_pallas: bool,
           idx, d1, d2):
    # AUTO = the 2-row-gather XLA formulation for irregular structure: it
    # beats the Pallas one-hot-expansion kernel at EVERY measured scale
    # (p2p 1.8 vs 3.2 ms, arxiv-scale 14 vs 32 ms @F=32) — SDDMM has
    # per-edge outputs and no reduction, so the gather is the whole cost
    # and that kernel's per-tile MXU expansion is pure overhead. EXCEPT on
    # clustered graphs with a 3-tier hybrid plan: the dense-cell tier
    # computes whole [R,C] blocks as single MXU matmuls (sddmm_hybrid),
    # replacing 2 row gathers per edge with one 1-D assembly gather.
    rowptr, col, coo_row, _, _, _, plan_fwd, _, _, ell_fwd = idx
    degrees = (rowptr[1:] - rowptr[:-1]) if reduce == ReduceOp.MEAN else None
    if use_pallas and plan_fwd is not None:
        from dgsparse_tpu.kernels.pallas_sddmm import sddmm_esc

        return sddmm_esc(plan_fwd, d1, d2, reduce, degrees)
    from dgsparse_tpu.core.planner import HybridPlan

    if isinstance(ell_fwd, HybridPlan) and ell_fwd.edge_src is not None \
            and ell_fwd.cells is not None \
            and jax.default_backend() == "tpu":
        from dgsparse_tpu.kernels.pallas_sddmm import sddmm_hybrid

        return sddmm_hybrid(ell_fwd, d1, d2, reduce, degrees, coo_row)
    return kx.sddmm_chunked(coo_row, col, d1, d2, reduce, degrees,
                            rowptr=rowptr)


def _sddmm_fwd(reduce, num_rows, num_cols, use_pallas, idx, d1, d2):
    return _sddmm(reduce, num_rows, num_cols, use_pallas, idx, d1,
                  d2), (idx, d1, d2)


def _sddmm_bwd(reduce, num_rows, num_cols, use_pallas, residuals, g):
    idx, d1, d2 = residuals
    rowptr, col, coo_row, colptr, row_csc, perm, plan_fwd, plan_bwd, \
        csc_col, _ell_fwd = idx
    nnz = col.shape[0]
    if reduce == ReduceOp.MEAN:
        deg = jnp.maximum(rowptr[1:] - rowptr[:-1], 1).astype(g.dtype)
        g = g / jnp.take(deg, coo_row)
    # Both gradients are SpMMs with the cotangent as edge values:
    # d_d1 = A(g) @ d2 and d_d2 = A(g)^T @ d1 — routed through the ESC
    # Pallas kernel when available.
    if _use_esc(plan_fwd, nnz):
        from dgsparse_tpu.kernels.pallas_spmm import spmm_esc

        d_d1 = spmm_esc(plan_fwd, g, d2).astype(d1.dtype)
        d_d2 = spmm_esc(plan_bwd, jnp.take(g, perm), d1).astype(d2.dtype)
    else:
        d_d1 = kx.sddmm_bwd_chunked(coo_row, col, g, d2,
                                    num_rows).astype(d1.dtype)
        g_csc = jnp.take(g, perm)
        d_d2 = kx.sddmm_bwd_chunked(csc_col, row_csc, g_csc, d1,
                                    num_cols).astype(d2.dtype)
    return jax.tree.map(_int_zero, idx), d_d1, d_d2


_sddmm.defvjp(_sddmm_fwd, _sddmm_bwd)


def sddmm(sparse: SparseTensor, d1: jax.Array, d2: jax.Array,
          reduce="sum", algorithm="auto") -> jax.Array:
    """Per-edge dots over the sparsity pattern of `sparse`.

    d1: [M, F] (rows), d2: [N, F] (cols). Returns [nnz] in CSR edge order.
    algorithm: "auto" (measured winner: the XLA 2-row-gather form),
    "xla" (explicit), or "pallas" (the one-hot expansion kernel,
    kernels/pallas_sddmm.py — needs an edge-tile plan).
    """
    reduce = as_reduce(reduce)
    if algorithm not in ("auto", "xla", "pallas"):
        raise ValueError(f"unknown sddmm algorithm {algorithm!r}")
    from dgsparse_tpu.utils.debug import maybe_validate

    maybe_validate(sparse)
    from dgsparse_tpu.utils import metrics

    metrics.record("sddmm", alg=algorithm, reduce=str(reduce),
                   nnz=sparse.nnz, feat=d1.shape[-1])
    st = sparse.storage
    idx = (st.rowptr(), st.col(), st.coo_row(), st.colptr(), st.row(),
           st.csr2csc(), st.plan(), st.plan(transpose=True), st.csc_col(),
           st.ell_plan())
    m, n = sparse.sparse_sizes()
    return _sddmm(reduce, m, n, algorithm == "pallas", idx, d1, d2)


def sddmm_coo(row: jax.Array, col: jax.Array, d1: jax.Array,
              d2: jax.Array) -> jax.Array:
    """COO-order SDDMM (reference: sddmm_cuda_coo, src/sddmm/sddmm.cu:8-24).

    Differentiable via JAX autodiff of the gather/einsum formulation.
    """
    return jnp.einsum(
        "ef,ef->e", jnp.take(d1, row, axis=0), jnp.take(d2, col, axis=0)
    )
