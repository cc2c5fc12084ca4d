"""Multi-head batched SpMM: per-head edge values over shared structure.

`spmm_multihead(sparse, values, dense)` with values [nnz, H] and dense
[N, H, F] computes, per head h, out[:, h, :] = SpMM(A_h, dense[:, h, :])
where A_h reuses the CSR structure with values[:, h] — one op instead of
an H-iteration Python loop (the reference has no multi-head kernel; its
users would loop spmm_sum per head, src/cuda/spmm_cuda.cu:36-165).

TPU design: heads fold into the feature axis so a single ESC segment
matmul (kernels/pallas_spmm.spmm_esc_mh) serves every head; the XLA
fallback is one sorted segment-sum over [nnz, H*F] contributions.
MAX/MIN run the XLA segment path with PER-HEAD winning-edge residuals
([M, H, F] argmax ids — the multi-head generalization of the reference's
`E` tensor, src/spmm.cpp:108-109) and an edge-chunked winner-mask
backward mirroring ops/spmm.py's single-head formulation.
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


def _mh_chunk_edges(h: int, f: int) -> int:
    """Edges per chunk for the [nnz, H, F] fp32 buffers (forward maxmin
    and its winner-mask backward share it so they can never disagree)."""
    from dgsparse_tpu.kernels.xla import spmm_chunk_edges

    return spmm_chunk_edges(h * f)


def _xla_mh_maxmin(coo_row, col, values, dense, num_rows, reduce):
    """Per-head MAX/MIN with winning-edge residuals. Semantics mirror the
    single-head path (kernels/xla.spmm_forward): first strictly-improving
    edge wins, empty rows yield 0. Edge-chunked so the [nnz, H, F]
    contribution buffer stays bounded."""
    nnz = col.shape[0]
    n, h, f = dense.shape
    is_max = reduce == ReduceOp.MAX
    per = _mh_chunk_edges(h, f)
    ident = -jnp.inf if is_max else jnp.inf
    out = jnp.full((num_rows, h, f), ident, dense.dtype)
    arg = jnp.full((num_rows, h, f), jnp.int32(nnz), jnp.int32)
    for e0 in range(0, nnz, per):
        e1 = min(e0 + per, nnz)
        c = jax.lax.slice(col, (e0,), (e1,))
        r = jax.lax.slice(coo_row, (e0,), (e1,))
        contrib = jnp.take(dense, c, axis=0)
        if values is not None:
            v = jax.lax.slice(values, (e0, 0), (e1, h))
            contrib = contrib * v[:, :, None].astype(contrib.dtype)
        flat = contrib.reshape(-1, h * f)
        seg = jax.ops.segment_max if is_max else jax.ops.segment_min
        part = seg(flat, r, num_segments=num_rows, indices_are_sorted=True)
        is_win = flat == part[r]
        eids = jnp.arange(e0, e1, dtype=jnp.int32)[:, None]
        argc = jax.ops.segment_min(
            jnp.where(is_win, eids, jnp.int32(nnz)), r,
            num_segments=num_rows, indices_are_sorted=True
        ).reshape(num_rows, h, f)
        part = part.reshape(num_rows, h, f)
        better = part > out if is_max else part < out
        eq = part == out
        arg = jnp.where(better, argc,
                        jnp.where(eq, jnp.minimum(arg, argc), arg))
        out = jnp.maximum(out, part) if is_max else jnp.minimum(out, part)
    out = jnp.where(jnp.isfinite(out), out, jnp.zeros_like(out))
    return out, arg


def _forward(reduce, algorithm, has_value, idx, values, dense):
    rowptr, col, coo_row, _, _, plan_fwd, _, _ = idx
    num_rows = rowptr.shape[0] - 1
    degrees = (rowptr[1:] - rowptr[:-1]) if reduce == ReduceOp.MEAN else None
    vals = values if has_value else None
    h, f = dense.shape[-2], dense.shape[-1]
    if reduce in (ReduceOp.MAX, ReduceOp.MIN):
        return _xla_mh_maxmin(coo_row, col, vals, dense, num_rows, reduce)
    if _use_esc(algorithm, plan_fwd, col.shape[0], h * f):
        from dgsparse_tpu.kernels.pallas_spmm import spmm_esc_mh

        return spmm_esc_mh(plan_fwd, vals, dense, reduce, degrees), None
    return _xla_mh(coo_row, col, vals, dense, num_rows, reduce,
                   degrees), None


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _spmm_mh(reduce: ReduceOp, algorithm: Algorithm, has_value: bool, idx,
             values, dense):
    out, _ = _forward(reduce, algorithm, has_value, idx, values, dense)
    return out


def _spmm_mh_fwd(reduce, algorithm, has_value, idx, values, dense):
    out, arg_edge = _forward(reduce, algorithm, has_value, idx, values,
                             dense)
    return out, (idx, values, dense, arg_edge)


def _spmm_mh_maxmin_bwd(has_value, idx, values, dense, arg_edge, g):
    """Winner-mask backward for per-head MAX/MIN: gradient flows only
    through the winning edge per (row, head, feature) element — the
    multi-head analog of ops/spmm.py's edge-space masked backward."""
    rowptr, col, coo_row, colptr, perm, plan_fwd, plan_bwd, csc_col = idx
    num_rows = rowptr.shape[0] - 1
    nnz = col.shape[0]
    h, f = dense.shape[-2], dense.shape[-1]
    g32 = g.astype(jnp.float32)
    per = _mh_chunk_edges(h, f)
    dd32 = jnp.zeros((dense.shape[0], h, f), jnp.float32)
    dv_parts = []
    for e0 in range(0, nnz, per):
        e1 = min(e0 + per, nnz)
        r = jax.lax.slice(coo_row, (e0,), (e1,))
        c = jax.lax.slice(col, (e0,), (e1,))
        arg_rows = jnp.take(arg_edge, r, axis=0)          # [E, H, F]
        eids = jnp.arange(e0, e1, dtype=arg_rows.dtype)[:, None, None]
        win = arg_rows == eids
        g_rows = jnp.where(win, jnp.take(g32, r, axis=0), 0)
        if has_value:
            dv_parts.append(jnp.sum(
                g_rows * jnp.take(dense, c, axis=0).astype(jnp.float32),
                axis=-1).astype(values.dtype))            # [E, H]
            v = jax.lax.slice(values, (e0, 0), (e1, h))
            g_rows = g_rows * v[:, :, None].astype(jnp.float32)
        dd32 = dd32 + jax.ops.segment_sum(
            g_rows.reshape(-1, h * f), c, num_segments=dense.shape[0]
        ).reshape(dense.shape[0], h, f)
    d_values = (jnp.concatenate(dv_parts) if has_value
                else jnp.zeros_like(values))
    return (jax.tree.map(_int_zero, idx), d_values,
            dd32.astype(dense.dtype))


def _spmm_mh_bwd(reduce, algorithm, has_value, residuals, g):
    idx, values, dense, arg_edge = residuals
    if reduce in (ReduceOp.MAX, ReduceOp.MIN):
        return _spmm_mh_maxmin_bwd(has_value, idx, values, dense, arg_edge,
                                   g)
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
      reduce: "sum", "mean", "max" or "min" (max/min carry per-head
        winning-edge residuals through the backward).

    Returns [M, H, F].
    """
    reduce = as_reduce(reduce)
    algorithm = as_algorithm(algorithm)
    from dgsparse_tpu.ops.slot import SlotValues, spmm_slots

    if isinstance(values, (list, tuple)) and values \
            and all(isinstance(v, SlotValues) for v in values):
        # slot-order per-head values: one slot-space SpMM per head (H is
        # small in attention models; each head rides the planned tier
        # kernels with no edge-order assembly — PERF_GUIDE rule 8).
        # MAX/MIN route spmm_slots' K-slot argmax path (ELL storages) or
        # its one-assembly hybrid fallback (VERDICT r4 #9).
        if dense.ndim != 3 or dense.shape[1] != len(values):
            raise ValueError(
                f"dense must be [N, H={len(values)}, F], got {dense.shape}")
        outs = [spmm_slots(sparse, sv, dense[:, h, :], reduce)
                for h, sv in enumerate(values)]
        return jnp.stack(outs, axis=1)
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
