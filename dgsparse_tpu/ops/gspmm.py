"""Generalized semiring SpMM: reduce_{e=(m,c)} compute(edge[e], feat[c]).

Reference parity: the gspmm-fp extension (src/gspmm-fp/gspmm.cc:27-44,
gspmm.cu) and the DGL-style `u_<compute>_e_<reduce>` / `copy_u_<reduce>` op
grid it exposes (example/gspmm-fp/util.py:17-110). COMPUTE semantics follow
include/gspmm.h:67-91: compute(a=edge, b=feat) with SUB = b-a and DIV = b/a.

The reference's k<32 double-launch bug (src/gspmm-fp/gspmm.cu:179-208, both
the simple and cache kernels run and double-write the output) is *not*
replicated.

Full custom VJP for every (compute × reduce) pair:
  SUM/MEAN:  d_edge[e] = sum_f g'[m,f] * d(compute)/d(edge),
             d_feat[c] = col-scatter of g' * d(compute)/d(feat)
  MAX/MIN:   gradient flows only through the winning edge per output element.
"""

from functools import partial


import jax
import jax.numpy as jnp
import numpy as np

from dgsparse_tpu.core.formats import SparseTensor
from dgsparse_tpu.kernels import xla as kx
from dgsparse_tpu.ops.types import (Algorithm, ComputeOp, ReduceOp,
                                    as_compute, as_reduce)

_FLOAT0 = jax.dtypes.float0


def _int_zero(x):
    return np.zeros(x.shape, dtype=_FLOAT0)


def _dcompute(compute: ComputeOp, edge, feat):
    """Partials of compute(edge, feat) w.r.t. (edge, feat). `edge` broadcasts
    against feat's feature dim."""
    if compute == ComputeOp.ADD:
        return jnp.ones_like(feat), jnp.ones_like(feat)
    if compute == ComputeOp.SUB:  # feat - edge
        return -jnp.ones_like(feat), jnp.ones_like(feat)
    if compute == ComputeOp.MUL:
        return feat, jnp.broadcast_to(edge, feat.shape)
    if compute == ComputeOp.DIV:  # feat / edge
        return -feat / (edge * edge), jnp.broadcast_to(1.0 / edge, feat.shape)
    raise ValueError(compute)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _gspmm(reduce: ReduceOp, compute: ComputeOp, has_value: bool, idx,
           values, dense):
    out, _ = _forward(reduce, compute, has_value, idx, values, dense)
    return out


def _use_esc(plan, nnz, reduce) -> bool:
    return (plan is not None
            and reduce in (ReduceOp.SUM, ReduceOp.MEAN)
            and jax.default_backend() == "tpu"
            and nnz >= 4096
            and plan.pad_ratio() <= 4.0)


_FORCE_ELL = [False]  # test hook: take the ELL paths off-TPU


def _use_ell(ell, reduce, f) -> bool:
    from dgsparse_tpu.core.planner import BucketedEllPlan, EllPlan

    ok = ((jax.default_backend() == "tpu" or _FORCE_ELL[0])
          and (isinstance(ell, EllPlan)
               or (isinstance(ell, BucketedEllPlan)
                   and ell.pad_ratio() <= 2.0)))
    if ok and reduce in (ReduceOp.MAX, ReduceOp.MIN):
        # the maxmin backward's [slots, F] winner buffers cannot chunk —
        # forward and backward must agree (arg space: K-slot vs edge ids)
        from dgsparse_tpu.ops.spmm import _ell_maxmin_fits

        ok = _ell_maxmin_fits(ell, f)
    return ok


def _forward(reduce, compute, has_value, idx, values, dense):
    rowptr, col, coo_row, _, _, _, plan_fwd, _, ell_fwd, _ = idx
    num_rows = rowptr.shape[0] - 1
    degrees = (rowptr[1:] - rowptr[:-1]) if reduce == ReduceOp.MEAN else None
    vals = values if has_value else None
    if _use_ell(ell_fwd, reduce, dense.shape[-1]):
        from dgsparse_tpu.kernels import pallas_spmm as kp

        if reduce in (ReduceOp.MAX, ReduceOp.MIN):
            return kp.spmm_ell_maxmin(ell_fwd, vals, dense, reduce, compute)
        return kp.gspmm_ell(ell_fwd, vals, dense, reduce, compute,
                            degrees), None
    if _use_esc(plan_fwd, col.shape[0], reduce):
        from dgsparse_tpu.kernels import pallas_spmm as kp

        return kp.gspmm_esc(plan_fwd, vals, dense, reduce, compute,
                            degrees), None
    return kx.gspmm_forward(coo_row, col, vals, dense, num_rows, reduce,
                            compute, degrees)


def _gspmm_fwd(reduce, compute, has_value, idx, values, dense):
    out, arg_edge = _forward(reduce, compute, has_value, idx, values, dense)
    return out, (idx, values, dense, arg_edge)


def _gspmm_bwd(reduce, compute, has_value, residuals, g):
    idx, values, dense, arg_edge = residuals
    (rowptr, col, coo_row, colptr, row_csc, perm, plan_fwd, plan_bwd,
     _ell_fwd, csc_col) = idx
    nnz = col.shape[0]

    if reduce in (ReduceOp.SUM, ReduceOp.MEAN):
        if reduce == ReduceOp.MEAN:
            deg = jnp.maximum(rowptr[1:] - rowptr[:-1], 1).astype(g.dtype)
            g = g / deg[:, None]
        feat_e = jnp.take(dense, col, axis=0)              # [nnz, F]
        e = (values[:, None].astype(g.dtype) if has_value
             else jnp.ones((nnz, 1), g.dtype))
        de, df = _dcompute(compute, e, feat_e)
        g_e = jnp.take(g, coo_row, axis=0)                 # [nnz, F]
        if has_value:
            d_values = jnp.sum(g_e * de, axis=-1).astype(values.dtype)
        else:
            d_values = jnp.zeros_like(values)
        # d_dense: A^T-shaped scatter. df is 1 (ADD/SUB), edge (MUL) or
        # 1/edge (DIV) — all per-edge scalars, so the transpose ESC kernel
        # handles every compute op as a weighted transpose SpMM.
        if _use_esc(plan_bwd, nnz, ReduceOp.SUM):
            from dgsparse_tpu.kernels import pallas_spmm as kp

            if compute in (ComputeOp.ADD, ComputeOp.SUB):
                w = None
            elif compute == ComputeOp.MUL:
                w = values if has_value else None
            else:  # DIV
                w = (1.0 / values) if has_value else None
            w_t = jnp.take(w, perm) if w is not None else None
            d_dense = kp.spmm_esc(plan_bwd, w_t, g).astype(dense.dtype)
        else:
            contrib = jnp.take(g_e * df, perm, axis=0)
            d_dense = jax.ops.segment_sum(
                contrib, csc_col, num_segments=dense.shape[0],
                indices_are_sorted=True,
            ).astype(dense.dtype)
    elif _use_ell(_ell_fwd, reduce, g.shape[-1]):
        # ELL forward → `arg_edge` is the winning K-slot per element in
        # bucket-concat row order; winner masks via a K-iota compare (see
        # ops/spmm.py), with the semiring partials applied per slot.
        from dgsparse_tpu.kernels.pallas_spmm import _ell_buckets

        g32 = g.astype(jnp.float32)
        buckets, _ = _ell_buckets(_ell_fwd)
        dv_parts, contrib_parts = [], []
        s0 = 0
        for cols_b, mask_b, eperm_b, rows_b, k in buckets:
            rb = cols_b.shape[0]
            argk = arg_edge[s0:s0 + rb]
            s0 += rb
            g_b = g32 if rows_b is None else jnp.take(g32, rows_b, axis=0)
            kio = jnp.arange(k, dtype=argk.dtype)[None, :, None]
            win = jnp.logical_and(argk[:, None, :] == kio,
                                  (mask_b > 0)[:, :, None])
            g_win = jnp.where(win, g_b[:, None, :], 0)       # [rb, K, F]
            feats = jnp.take(dense, cols_b.reshape(-1),
                             axis=0).astype(jnp.float32).reshape(rb, k, -1)
            e = (jnp.take(values, jnp.maximum(eperm_b, 0)).astype(
                jnp.float32)[:, :, None] if has_value
                else jnp.ones((rb, k, 1), jnp.float32))
            de, df = _dcompute(compute, e, feats)
            if has_value:
                dv_parts.append(jnp.sum(g_win * de, axis=-1).reshape(-1))
            contrib_parts.append((g_win * df).reshape(rb * k, -1))
        if has_value:
            dv_flat = (dv_parts[0] if len(dv_parts) == 1
                       else jnp.concatenate(dv_parts))
            d_values = jnp.take(dv_flat, _ell_fwd.inv).astype(values.dtype)
        else:
            d_values = jnp.zeros_like(values)
        contrib_flat = (contrib_parts[0] if len(contrib_parts) == 1
                        else jnp.concatenate(contrib_parts, axis=0))
        contrib_csc = jnp.take(contrib_flat,
                               jnp.take(_ell_fwd.inv, perm), axis=0)
        d_dense = jax.ops.segment_sum(
            contrib_csc, csc_col, num_segments=dense.shape[0],
            indices_are_sorted=True).astype(dense.dtype)
    else:
        # Winner gradients in EDGE space (element scatters are serialized
        # on TPU — see ops/spmm.py): per-edge winner masks from a sorted
        # row gather of arg_edge, combine partials, then a row-granular
        # transpose segment reduction.
        g32 = g.astype(jnp.float32)
        arg_rows = jnp.take(arg_edge, coo_row, axis=0)       # [nnz, F]
        eids = jnp.arange(nnz, dtype=arg_rows.dtype)[:, None]
        win = arg_rows == eids
        g_rows = jnp.where(win, jnp.take(g32, coo_row, axis=0), 0)
        feat_e = jnp.take(dense, col, axis=0).astype(jnp.float32)
        e = (values[:, None].astype(jnp.float32) if has_value
             else jnp.ones((nnz, 1), jnp.float32))
        de, df = _dcompute(compute, e, feat_e)
        if has_value:
            d_values = jnp.sum(g_rows * de, axis=-1).astype(values.dtype)
        else:
            d_values = jnp.zeros_like(values)
        contrib_csc = jnp.take(g_rows * df, perm, axis=0)
        d_dense = jax.ops.segment_sum(
            contrib_csc, csc_col, num_segments=dense.shape[0],
            indices_are_sorted=True).astype(dense.dtype)

    return jax.tree.map(_int_zero, idx), d_values, d_dense


_gspmm.defvjp(_gspmm_fwd, _gspmm_bwd)


def _hybrid_sum_mean(sparse: SparseTensor, dense: jax.Array,
                     reduce: ReduceOp, compute: ComputeOp) -> jax.Array:
    """Tier-fast gspmm for SUM/MEAN on a HybridPlan storage: MUL/DIV run
    as values-weighted SpMM over the 3-tier kernels (dense cells on the
    MXU, residue gathered once); ADD/SUB decompose exactly —
    Σ(u[c] ± e) = Σ u[c] ± Σ e — into an unweighted SpMM plus an O(nnz)
    1-D row reduction of the edge values (no [nnz, F] work at all).
    Gradients compose from the SpMM custom_vjp + elementwise autodiff."""
    from dgsparse_tpu.ops import spmm as smod

    st = sparse.storage
    # chunked-gather swap (docs/BENCHMARKS.md §2e) — resolve BEFORE the
    # vslot captures below so a granularity rebuild refreshes the caches
    ell_eff = smod.effective_ell_plan(st, dense, reduce, Algorithm.AUTO)

    def run(vals, has_value, vslot):
        idx = (st.rowptr(), st.col(), st.coo_row(), st.colptr(), st.row(),
               st.csr2csc(), st.plan(), st.plan(transpose=True),
               st.bell_plan(), st.bell_plan(transpose=True), ell_eff,
               st.csc_col(), vslot, st.mm_comp(), st.mm_bwd())
        return smod._spmm(reduce, Algorithm.AUTO, has_value, idx, vals,
                          dense)

    values = sparse.values_or_ones()
    cached = (not sparse.has_value) or values is st.values()
    if compute == ComputeOp.MUL or not sparse.has_value:
        return run(values, sparse.has_value,
                   st.vslot() if cached else None)
    if compute == ComputeOp.DIV:
        return run(1.0 / values, True, None)
    # ADD / SUB: unweighted SpMM of u ± row-reduced e (broadcast over F)
    base = run(jnp.ones_like(values), False,
               st.vslot() if not sparse.has_value else st.ones_vslot())
    rowptr = st.rowptr()
    e_row = jax.ops.segment_sum(values, st.coo_row(),
                                num_segments=rowptr.shape[0] - 1,
                                indices_are_sorted=True)
    if reduce == ReduceOp.MEAN:
        deg = jnp.maximum(rowptr[1:] - rowptr[:-1], 1)
        e_row = e_row / deg.astype(e_row.dtype)
    e_row = e_row.astype(base.dtype)[:, None]
    return base + e_row if compute == ComputeOp.ADD else base - e_row


def gspmm(sparse: SparseTensor, dense: jax.Array, reduce="sum",
          compute="mul", values=None) -> jax.Array:
    """Semiring SpMM over a SparseTensor. compute is ignored (copy_u) when
    the tensor has no values.

    `values` may be a `SlotValues` (plan-slot-resident edge values,
    ops/slot.py) to override the tensor's own values without the
    edge-order assembly. The full semiring grid is supported in slot
    order (VERDICT r4 #9): MUL runs the weighted tier kernels directly;
    DIV reweights with the masked reciprocal; ADD/SUB decompose into an
    unweighted SpMM ± a slot-space row reduction (the same decomposition
    the edge-order path uses below); MAX/MIN ride the K-slot argmax
    kernel on ELL storages and pay the one edge-order assembly gather on
    hybrid storages (max is not tierwise-decomposable)."""
    reduce, compute = as_reduce(reduce), as_compute(compute)
    from dgsparse_tpu.ops.slot import (SlotValues, _ell_st_idx, _layout,
                                       _spmm_slots_mm, _sv_ones,
                                       _sv_reciprocal, slots_to_edges,
                                       spmm_slots, sv_rowsum)

    if isinstance(values, SlotValues):
        sv = values
        if reduce in (ReduceOp.SUM, ReduceOp.MEAN):
            if compute == ComputeOp.MUL:
                return spmm_slots(sparse, sv, dense, reduce)
            if compute == ComputeOp.DIV:
                return spmm_slots(sparse, _sv_reciprocal(sparse, sv),
                                  dense, reduce)
            # ADD / SUB: unweighted SpMM of u ± row-reduced e
            base = spmm_slots(sparse, _sv_ones(sparse, sv), dense, reduce)
            e_row = sv_rowsum(sparse, sv)
            if reduce == ReduceOp.MEAN:
                rowptr = sparse.storage.rowptr()
                deg = jnp.maximum(rowptr[1:] - rowptr[:-1], 1)
                e_row = e_row / deg.astype(e_row.dtype)
            e_row = e_row.astype(base.dtype)[:, None]
            return (base + e_row if compute == ComputeOp.ADD
                    else base - e_row)
        # MAX / MIN
        from dgsparse_tpu.ops.spmm import _ell_maxmin_fits

        kind, plan = _layout(sparse)
        if kind == "ell" and _ell_maxmin_fits(plan, dense.shape[-1]):
            return _spmm_slots_mm(reduce, compute,
                                  sparse.sparse_sizes()[1],
                                  _ell_st_idx(sparse.storage, plan),
                                  sv.ell, dense)
        # hybrid (max not tierwise-decomposable) or over the winner-buffer
        # budget (the slot backward cannot row-chunk): one edge-order
        # assembly, then the edge-order semiring
        return gspmm(sparse.set_values(slots_to_edges(sparse, sv)),
                     dense, reduce, compute)
    from dgsparse_tpu.utils.debug import maybe_validate

    maybe_validate(sparse)
    from dgsparse_tpu.utils import metrics

    metrics.record("gspmm", reduce=reduce.value, compute=compute.value,
                   nnz=sparse.nnz, feat=dense.shape[-1])
    st = sparse.storage
    from dgsparse_tpu.core.planner import HybridPlan

    if isinstance(st.ell_plan(), HybridPlan) \
            and reduce in (ReduceOp.SUM, ReduceOp.MEAN):
        return _hybrid_sum_mean(sparse, dense, reduce, compute)
    idx = (st.rowptr(), st.col(), st.coo_row(), st.colptr(), st.row(),
           st.csr2csc(), st.plan(), st.plan(transpose=True), st.ell_plan(),
           st.csc_col())
    values = sparse.values_or_ones()
    return _gspmm(reduce, compute, sparse.has_value, idx, values, dense)


def GSpMM_u_e(rowptr, colind, values, dense, reduce_op, compute_op):
    """Reference-parity entry (src/gspmm-fp/gspmm.cc:27-35): raw CSR arrays,
    edge values combined with node features then reduced."""
    sp = SparseTensor.from_csr(
        rowptr, colind, values,
        sparse_sizes=(int(rowptr.shape[0]) - 1, int(dense.shape[0])),
    )
    return gspmm(sp, dense, reduce_op, compute_op)


def GSpMM_u(rowptr, colind, dense, reduce_op):
    """Reference-parity entry (src/gspmm-fp/gspmm.cc:36-43): copy_u + reduce."""
    sp = SparseTensor.from_csr(
        rowptr, colind, None,
        sparse_sizes=(int(rowptr.shape[0]) - 1, int(dense.shape[0])),
    )
    return gspmm(sp, dense, reduce_op, ComputeOp.MUL)


def _make_u_e(compute: ComputeOp, reduce: ReduceOp):
    def op(sparse: SparseTensor, dense: jax.Array) -> jax.Array:
        return gspmm(sparse, dense, reduce, compute)

    op.__name__ = f"u_{compute.value}_e_{reduce.value}"
    op.__doc__ = (
        f"DGL-style op: reduce '{reduce.value}' of "
        f"compute('{compute.value}', edge, feat) over in-edges "
        f"(reference: example/gspmm-fp/util.py:17-110)."
    )
    return op


def _make_copy_u(reduce: ReduceOp):
    def op(sparse: SparseTensor, dense: jax.Array) -> jax.Array:
        return gspmm(sparse.set_values(None), dense, reduce, ComputeOp.MUL)

    op.__name__ = f"copy_u_{reduce.value}"
    op.__doc__ = f"DGL-style op: reduce '{reduce.value}' of neighbor features."
    return op


# The full u_*_e_* grid (reference: example/gspmm-fp/util.py:17-110).
_ops = {}
for _c in ComputeOp:
    for _r in ReduceOp:
        _f = _make_u_e(_c, _r)
        _ops[_f.__name__] = _f
for _r in ReduceOp:
    _f = _make_copy_u(_r)
    _ops[_f.__name__] = _f
globals().update(_ops)
__all__ = ["gspmm", "GSpMM_u_e", "GSpMM_u"] + sorted(_ops)
