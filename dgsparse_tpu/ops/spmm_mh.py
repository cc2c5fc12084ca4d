"""Multi-head batched SpMM: per-head edge values over shared structure.

`spmm_multihead(sparse, values, dense)` with values [nnz, H] and dense
[N, H, F] computes, per head h, out[:, h, :] = SpMM(A_h, dense[:, h, :])
where A_h reuses the CSR structure with values[:, h] — one op instead of
an H-iteration Python loop (the reference has no multi-head kernel; its
users would loop spmm_sum per head, src/cuda/spmm_cuda.cu:36-165).

TPU design: heads fold into the feature axis so a single ESC segment
matmul (kernels/pallas_spmm.spmm_esc_mh) serves every head; the XLA
fallback is one sorted segment-sum over [nnz, H*F] contributions.
SUM/MEAN only (attention-style aggregation); MAX/MIN raise.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dgsparse_tpu.core.formats import SparseTensor
from dgsparse_tpu.ops.types import Algorithm, ReduceOp, as_algorithm, \
    as_reduce

_FLOAT0 = jax.dtypes.float0


def _int_zero(x):
    return np.zeros(x.shape, dtype=_FLOAT0)


def _use_esc(algorithm: Algorithm, plan, nnz: int, hf: int) -> bool:
    if plan is None or hf > 2048:
        return False
    if algorithm in (Algorithm.PALLAS_EDGE_TILE, Algorithm.PALLAS_ROW_TILE,
                     Algorithm.PALLAS_BELL):
        return True
    return (algorithm == Algorithm.AUTO
            and jax.default_backend() == "tpu"
            and nnz >= 4096
            and plan.pad_ratio() <= 4.0)


def _xla_mh(coo_row, col, values, dense, num_rows, reduce, degrees):
    n, h, f = dense.shape
    contrib = jnp.take(dense, col, axis=0)                 # [nnz, H, F]
    if values is not None:
        contrib = contrib * values[:, :, None].astype(contrib.dtype)
    if reduce == ReduceOp.MEAN:
        deg = jnp.take(jnp.maximum(degrees, 1), coo_row)
        contrib = contrib / deg.astype(contrib.dtype)[:, None, None]
    out = jax.ops.segment_sum(
        contrib.reshape(-1, h * f), coo_row, num_segments=num_rows,
        indices_are_sorted=True)
    return out.reshape(num_rows, h, f)


def _forward(reduce, algorithm, has_value, idx, values, dense):
    rowptr, col, coo_row, _, _, plan_fwd, _, _ = idx
    num_rows = rowptr.shape[0] - 1
    degrees = (rowptr[1:] - rowptr[:-1]) if reduce == ReduceOp.MEAN else None
    vals = values if has_value else None
    h, f = dense.shape[-2], dense.shape[-1]
    if _use_esc(algorithm, plan_fwd, col.shape[0], h * f):
        from dgsparse_tpu.kernels.pallas_spmm import spmm_esc_mh

        return spmm_esc_mh(plan_fwd, vals, dense, reduce, degrees)
    return _xla_mh(coo_row, col, vals, dense, num_rows, reduce, degrees)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _spmm_mh(reduce: ReduceOp, algorithm: Algorithm, has_value: bool, idx,
             values, dense):
    return _forward(reduce, algorithm, has_value, idx, values, dense)


def _spmm_mh_fwd(reduce, algorithm, has_value, idx, values, dense):
    out = _forward(reduce, algorithm, has_value, idx, values, dense)
    return out, (idx, values, dense)


def _spmm_mh_bwd(reduce, algorithm, has_value, residuals, g):
    idx, values, dense = residuals
    rowptr, col, coo_row, colptr, perm, plan_fwd, plan_bwd, \
        csc_col = idx
    num_rows = rowptr.shape[0] - 1
    nnz = col.shape[0]
    h, f = dense.shape[-2], dense.shape[-1]

    if reduce == ReduceOp.MEAN:
        deg = jnp.maximum(rowptr[1:] - rowptr[:-1], 1).astype(g.dtype)
        g = g / deg[:, None, None]

    g_rows = jnp.take(g, coo_row, axis=0)                  # [nnz, H, F]
    if has_value:
        feat_e = jnp.take(dense, col, axis=0)              # [nnz, H, F]
        d_values = jnp.sum(g_rows * feat_e, axis=-1).astype(values.dtype)
    else:
        d_values = jnp.zeros_like(values)

    # d_dense = per-head A^T g: the same multi-head SpMM over the cached
    # CSC (transpose) structure, values permuted into CSC edge order.
    v_t = jnp.take(values, perm, axis=0) if has_value else None
    if _use_esc(algorithm, plan_bwd, nnz, h * f):
        from dgsparse_tpu.kernels.pallas_spmm import spmm_esc_mh

        d_dense = spmm_esc_mh(plan_bwd, v_t, g).astype(dense.dtype)
    else:
        contrib = g_rows
        if has_value:
            contrib = contrib * values[:, :, None].astype(contrib.dtype)
        contrib = jnp.take(contrib, perm, axis=0)
        d_dense = jax.ops.segment_sum(
            contrib.reshape(-1, h * f), csc_col,
            num_segments=dense.shape[0],
            indices_are_sorted=True).reshape(dense.shape).astype(dense.dtype)

    return jax.tree.map(_int_zero, idx), d_values, d_dense


_spmm_mh.defvjp(_spmm_mh_fwd, _spmm_mh_bwd)


def spmm_multihead(sparse: SparseTensor, values, dense: jax.Array,
                   reduce="sum",
                   algorithm: Algorithm = Algorithm.AUTO) -> jax.Array:
    """Batched multi-head SpMM.

    Args:
      sparse: structure-only SparseTensor (its own values are ignored).
      values: [nnz, H] per-head edge values (e.g. attention weights), or
        None for copy-u aggregation shared across heads.
      dense: [N, H, F] per-head node features.
      reduce: "sum" or "mean".

    Returns [M, H, F].
    """
    reduce = as_reduce(reduce)
    algorithm = as_algorithm(algorithm)
    if reduce not in (ReduceOp.SUM, ReduceOp.MEAN):
        raise NotImplementedError(
            "spmm_multihead supports sum/mean; loop spmm per head for "
            "max/min (argmax residuals are per-head)")
    st = sparse.storage
    nnz = int(st.col().shape[0])
    if dense.ndim != 3:
        raise ValueError(f"dense must be [N, H, F], got {dense.shape}")
    has_value = values is not None
    if has_value and (values.ndim != 2 or values.shape[0] != nnz
                      or values.shape[1] != dense.shape[1]):
        raise ValueError(
            f"values must be [nnz={nnz}, H={dense.shape[1]}], "
            f"got {values.shape}")
    idx = (st.rowptr(), st.col(), st.coo_row(), st.colptr(), st.csr2csc(),
           st.plan(), st.plan(transpose=True), st.csc_col())
    if not has_value:
        values = jnp.ones((nnz, dense.shape[1]), dense.dtype)
    return _spmm_mh(reduce, algorithm, has_value, idx, values, dense)
