"""Slot-space edge-value pipelines: SDDMM -> softmax -> SpMM without ever
materializing CSR-edge-order values.

Emitting per-edge values in CSR edge order costs a ~20 ns/edge 1-D
assembly gather (115M edges ~ 2.3 s — more than the whole hybrid SpMM,
PERF_GUIDE rule 8); consuming them costs the inverse. The fused GAT
pipeline (ops/attention.py) avoids this for its special rank-1 logits;
this module makes the same slot-residency PUBLIC for arbitrary per-edge
values, so any chained pipeline (scores -> normalize -> aggregate, the
reference's gspmm-fp op grid, example/gspmm-fp/util.py:17-110) pays edge
order only at a true API boundary.

`SlotValues` holds per-edge values resident in a Storage's plan-slot
layout, one array per tier of the plan family:

- `cells` [ncells, R, C]: the dense-cell tier. One value per (row, col)
  POSITION — duplicate edges at the same position share it; consumers
  weight by the cell multiplicity grid. Non-edge positions are
  meaningful only where the multiplicity is 0 (consumers mask).
- `bell`  [bell_slots]: BELL tier, tile-ordered slots (padding slots
  carry 0 and eperm -1).
- `ell`   [ell_slots]: bucketed-ELL tier, flat bucket-concat slots.

Pure-ELL storages (no hybrid plan) use only the `ell` tier. The
CSR-edge-order assembly permutation is public via `slots_to_edges` /
`edges_to_slots` (HybridPlan.edge_src / plan.inv — the artifact VERDICT
r3 #4 asks for).

Ops (all differentiable; custom VJPs route gradients through the same
tier kernels):
- sddmm_slots(sp, d1, d2)          -> SlotValues of per-edge dots
- edge_softmax_slots(sp, sv)       -> row-softmaxed SlotValues
- spmm_slots(sp, sv, x)            -> [M, F] aggregation
- slots_to_edges / edges_to_slots  -> boundary converters
"""

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dgsparse_tpu.core.formats import SparseTensor
from dgsparse_tpu.core.planner import BucketedEllPlan, EllPlan, HybridPlan
from dgsparse_tpu.ops.types import ReduceOp, as_reduce

_FLOAT0 = jax.dtypes.float0
_TINY = 1e-30


def _int_zero(x):
    return np.zeros(x.shape, dtype=_FLOAT0)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SlotValues:
    """Per-edge values in plan-slot space (see module docstring)."""

    cells: Optional[jax.Array]   # [ncells, R, C] or None
    bell: Optional[jax.Array]    # [bell_slots] or None
    ell: jax.Array               # [ell_slots] flat

    def tree_flatten(self):
        return (self.cells, self.bell, self.ell), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def astype(self, dtype):
        c = None if self.cells is None else self.cells.astype(dtype)
        b = None if self.bell is None else self.bell.astype(dtype)
        return SlotValues(c, b, self.ell.astype(dtype))


# ---------------------------------------------------------------------------
# layout helpers
# ---------------------------------------------------------------------------

def _layout(sparse: SparseTensor):
    """(kind, plan) where kind is 'hybrid' or 'ell'."""
    ell = sparse.storage.ell_plan()
    if isinstance(ell, HybridPlan):
        return "hybrid", ell
    if isinstance(ell, (BucketedEllPlan, EllPlan)):
        return "ell", ell
    raise NotImplementedError(
        "slot-space ops need an ELL/hybrid plan on the storage (build the "
        "SparseTensor with plans enabled); for plan-less storages use the "
        "edge-order ops (sddmm/edge_softmax/spmm)")


def _ell_buckets(plan):
    """[(cols [rb,k], mask [rb,k], eperm [rb,k], rows [rb] or None, k)]."""
    if isinstance(plan, BucketedEllPlan):
        return list(plan.bucket_views())
    return [(plan.cols, plan.vals_mask, plan.eperm, None, plan.k)]


def _ell_rows(plan, bucket_rows, rb):
    if bucket_rows is not None:
        return bucket_rows
    return jnp.arange(rb, dtype=jnp.int32)


def _cell_mult(st, hp) -> jax.Array:
    """[ncells, R, C] edge-multiplicity grid of the dense-cell tier (0 at
    non-edge positions) — the mask/weight every cells-tier consumer
    needs. Served from the ones-value slot cache when present."""
    ov = st.ones_vslot() if st.values() is not None else st.vslot()
    if ov is not None and isinstance(ov.get("ell"), dict):
        c = ov["ell"].get("cells")
        if c is not None:
            return c
    from dgsparse_tpu.kernels.pallas_spmm import materialize_cells

    return materialize_cells(hp.cells, None)


def _bell_rows_cols(bell, num_rows, num_cols):
    rows = jnp.repeat(bell.tile_rb, bell.edge_tile) * bell.row_block \
        + bell.lrow
    cols = jnp.repeat(bell.tile_cw, bell.edge_tile) * bell.col_window \
        + bell.lcol
    return (jnp.minimum(rows, num_rows - 1),
            jnp.minimum(cols, num_cols - 1))


def _ell_t_gather_map(st, hp):
    """Static [ell_t_slots] map from transpose-ELL slot to position in the
    concatenated [bell ++ ell] forward stream (cells edges never appear in
    ell_t), plus the validity mask. Composed once per structure at
    construction (Storage.slot_gmap, a pytree child — the host-attr
    composition below does NOT survive jit's flatten/unflatten and crashed
    jitted chains at reddit scale before round 4)."""
    cached = st.slot_gmap() if hasattr(st, "slot_gmap") else None
    if cached is not None:
        return cached
    ep_t = hp.ell_t._eperm_host
    src = st._host_perm("_hybrid_edge_src", hp.edge_src)
    cell_slots = hp.cells.cell_slots if hp.cells is not None else 0
    pos = src[np.maximum(ep_t, 0)] - cell_slots
    valid = ep_t >= 0
    # transpose slots always reference non-cells edges, so pos >= 0 where
    # valid; clamp the padding slots
    return jnp.asarray(np.where(valid, pos, 0).astype(np.int32)), \
        jnp.asarray(valid)


def _noncells_stream(sv: SlotValues) -> jax.Array:
    return sv.ell if sv.bell is None else jnp.concatenate(
        [sv.bell, sv.ell])


def _sv_to_ell_t(st, hp, sv: SlotValues) -> jax.Array:
    """Transpose-ELL slot values from a forward SlotValues (bell+ell
    edges only — the cells tier transposes via its own grid)."""
    gmap, valid = _ell_t_gather_map(st, hp)
    g = jnp.take(_noncells_stream(sv), gmap)
    return jnp.where(valid, g, 0)


# ---------------------------------------------------------------------------
# sddmm_slots
# ---------------------------------------------------------------------------

def _sddmm_slots_fwd_impl(kind, num_cols, st_idx, d1, d2):
    plan = st_idx[0]
    from dgsparse_tpu.kernels.pallas_sddmm import sddmm_cells

    if kind == "hybrid":
        hp = plan
        cells = (sddmm_cells(hp.cells, d1, d2).reshape(
            hp.cells.num_cells, hp.cells.row_block, hp.cells.col_window)
            if hp.cells is not None else None)
        bellv = None
        if hp.bell is not None:
            rows, cols = _bell_rows_cols(hp.bell, hp.num_rows, hp.num_cols)
            bellv = jnp.einsum(
                "ef,ef->e", jnp.take(d1, rows, axis=0),
                jnp.take(d2, cols, axis=0),
                preferred_element_type=jnp.float32)
            bellv = jnp.where(hp.bell.eperm >= 0, bellv, 0)
        ell_plan = hp.ell
    else:
        cells = bellv = None
        ell_plan = plan
    parts = []
    for cols_b, mask, _, rows_b, k in _ell_buckets(ell_plan):
        rb = cols_b.shape[0]
        if rb == 0 or k == 0:
            continue
        d2g = jnp.take(d2, cols_b.reshape(-1), axis=0).reshape(rb, k, -1)
        d1g = jnp.take(d1, _ell_rows(ell_plan, rows_b, rb), axis=0)
        v = jnp.einsum("mf,mkf->mk", d1g, d2g,
                       preferred_element_type=jnp.float32)
        parts.append((v * mask).reshape(-1))
    ellv = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    return SlotValues(cells, bellv, ellv)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _sddmm_slots(kind, num_cols, st_idx, d1, d2):
    return _sddmm_slots_fwd_impl(kind, num_cols, st_idx, d1, d2)


def _sddmm_slots_f(kind, num_cols, st_idx, d1, d2):
    out = _sddmm_slots_fwd_impl(kind, num_cols, st_idx, d1, d2)
    return out, (st_idx, d1, d2)


def _sddmm_slots_b(kind, num_cols, residuals, g: SlotValues):
    st_idx, d1, d2 = residuals
    plan = st_idx[0]
    from dgsparse_tpu.kernels import pallas_spmm as kp

    if kind == "hybrid":
        hp = plan
        w = {"cells": g.cells, "bell": g.bell, "ell": g.ell}
        d_d1 = kp.spmm_hybrid(hp, None, d2, ReduceOp.SUM,
                              w_slot=w).astype(d1.dtype)
        g_t = st_idx[1]  # closure-free: ell_t map passed as idx
        gt = jnp.where(st_idx[2], jnp.take(_noncells_stream(g), g_t), 0)
        wt = {"cells": g.cells, "ell_t": gt}
        d_d2 = kp.spmm_hybrid_t(hp, None, d1,
                                w_slot=wt).astype(d2.dtype)
    else:
        if isinstance(plan, BucketedEllPlan):
            d_d1 = kp.spmm_bucketed_ell(plan, None, d2,
                                        w_slot=g.ell).astype(d1.dtype)
        else:
            d_d1 = kp.spmm_ell(plan, None, d2,
                               w_slot=g.ell).astype(d1.dtype)
        d_d2 = _ell_transpose_spmm(st_idx, num_cols, g.ell,
                                   d1).astype(d2.dtype)
    return jax.tree.map(_int_zero, st_idx), d_d1, d_d2


_sddmm_slots.defvjp(_sddmm_slots_f, _sddmm_slots_b)


def _ell_transpose_spmm(st_idx, num_cols, ell_vals, dense):
    """Transpose SpMM with slot-resident values for pure-ELL storages:
    out[c] = sum_{slots s with col[s]=c} v[s] * dense[row_s]. Routed
    through the ESC transpose plan via the precomputed bwd-slot ->
    fwd-ELL-slot permutation (Storage._mm_comp) when available, else the
    CSC segment fallback."""
    (plan, _, _, plan_bwd, mm_comp, perm, row_csc, csc_col) = st_idx
    from dgsparse_tpu.kernels.pallas_spmm import spmm_esc

    g32 = dense.astype(jnp.float32)
    if mm_comp is not None and plan_bwd is not None:
        vals_bwd = jnp.take(ell_vals, mm_comp) \
            * (plan_bwd.eperm >= 0).astype(jnp.float32)
        return spmm_esc(plan_bwd, None, g32, w_slot=vals_bwd)
    # CSC fallback: edge order via plan.inv, then sorted segment
    v_edge = jnp.take(ell_vals, plan.inv)
    v_csc = jnp.take(v_edge, perm)
    contrib = jnp.take(g32, row_csc, axis=0) * v_csc[:, None]
    return jax.ops.segment_sum(contrib, csc_col, num_segments=num_cols,
                               indices_are_sorted=True)


def sddmm_slots(sparse: SparseTensor, d1: jax.Array,
                d2: jax.Array) -> SlotValues:
    """Per-edge dots dot(d1[row_e], d2[col_e]) emitted directly in plan-
    slot space (no CSR-edge-order assembly — PERF_GUIDE rule 8). The
    dense-cell tier computes whole [R, C] blocks as single MXU matmuls
    (one value per position, shared by duplicate edges)."""
    kind, plan = _layout(sparse)
    st = sparse.storage
    if kind == "hybrid":
        if plan.ell_t is not None:
            gmap, valid = _ell_t_gather_map(st, plan)
        else:
            gmap = valid = None
        st_idx = (plan, gmap, valid)
    else:
        st_idx = _ell_st_idx(st, plan)
    return _sddmm_slots(kind, sparse.sparse_sizes()[1], st_idx, d1, d2)


# ---------------------------------------------------------------------------
# edge_softmax_slots (plain jnp — differentiable through autodiff)
# ---------------------------------------------------------------------------

def edge_softmax_slots(sparse: SparseTensor, sv: SlotValues) -> SlotValues:
    """Row-softmax of slot-resident per-edge logits. Exact (true per-row
    max shift, computed across all tiers); empty rows are a no-op. The
    returned SlotValues carries per-edge softmax weights (cells tier per
    POSITION — consumers weight by multiplicity, which spmm_slots does)."""
    kind, plan = _layout(sparse)
    st = sparse.storage
    m = sparse.sparse_sizes()[0]
    neg = jnp.float32(-3.0e38)

    # ---- per-row max across tiers
    row_max = jnp.full((m,), neg, jnp.float32)
    mult = None
    if kind == "hybrid" and plan.cells is not None:
        cp = plan.cells
        mult = _cell_mult(st, plan)
        vc = jnp.where(mult > 0, sv.cells.astype(jnp.float32), neg)
        cell_rowmax = vc.max(axis=2)                      # [ncells, R]
        blk = jax.ops.segment_max(cell_rowmax, cp.cell_rb,
                                  num_segments=-(-m // cp.row_block))
        row_max = jnp.maximum(row_max, blk.reshape(-1)[:m])
    if kind == "hybrid" and plan.bell is not None:
        rows_b, _ = _bell_rows_cols(plan.bell, plan.num_rows,
                                    plan.num_cols)
        vb = jnp.where(plan.bell.eperm >= 0,
                       sv.bell.astype(jnp.float32), neg)
        row_max = jnp.maximum(
            row_max, jax.ops.segment_max(vb, rows_b, num_segments=m))
    ell_plan = plan.ell if kind == "hybrid" else plan
    o = 0
    for cols_b, mask, _, rows_b, k in _ell_buckets(ell_plan):
        rb = cols_b.shape[0]
        if rb == 0 or k == 0:
            continue
        v = jax.lax.slice(sv.ell, (o,), (o + rb * k,)).reshape(rb, k)
        v = jnp.where(mask > 0, v.astype(jnp.float32), neg)
        rmax = v.max(axis=1)                              # [rb]
        rows = _ell_rows(ell_plan, rows_b, rb)
        row_max = jnp.maximum(
            row_max, jax.ops.segment_max(rmax, rows, num_segments=m))
        o += rb * k
    row_max = jax.lax.stop_gradient(
        jnp.where(row_max > neg / 2, row_max, 0))

    # ---- exp(v - shift) per tier + per-row denominator
    denom = jnp.zeros((m,), jnp.float32)
    e_cells = e_bell = None
    if kind == "hybrid" and plan.cells is not None:
        cp = plan.cells
        m_pad = -(-m // cp.row_block) * cp.row_block
        sh = jnp.pad(row_max, (0, m_pad - m)).reshape(-1, cp.row_block)
        sh = jnp.take(sh, cp.cell_rb, axis=0)             # [ncells, R]
        e_cells = jnp.exp(sv.cells.astype(jnp.float32) - sh[:, :, None])
        e_cells = jnp.where(mult > 0, e_cells, 0)
        dsum = (e_cells * mult).sum(axis=2)               # [ncells, R]
        blk = jax.ops.segment_sum(dsum, cp.cell_rb,
                                  num_segments=m_pad // cp.row_block)
        denom = denom + blk.reshape(-1)[:m]
    if kind == "hybrid" and plan.bell is not None:
        rows_b, _ = _bell_rows_cols(plan.bell, plan.num_rows,
                                    plan.num_cols)
        e_bell = jnp.exp(sv.bell.astype(jnp.float32)
                         - jnp.take(row_max, rows_b))
        e_bell = jnp.where(plan.bell.eperm >= 0, e_bell, 0)
        denom = denom + jax.ops.segment_sum(e_bell, rows_b,
                                            num_segments=m)
    e_ell_parts = []
    o = 0
    for cols_b, mask, _, rows_b, k in _ell_buckets(ell_plan):
        rb = cols_b.shape[0]
        if rb == 0 or k == 0:
            continue
        rows = _ell_rows(ell_plan, rows_b, rb)
        v = jax.lax.slice(sv.ell, (o,), (o + rb * k,)).reshape(rb, k)
        e = jnp.exp(v.astype(jnp.float32)
                    - jnp.take(row_max, rows)[:, None])
        e = jnp.where(mask > 0, e, 0)
        e_ell_parts.append(e.reshape(-1))
        denom = denom + jax.ops.segment_sum(e.sum(axis=1), rows,
                                            num_segments=m)
        o += rb * k
    e_ell = (e_ell_parts[0] if len(e_ell_parts) == 1
             else jnp.concatenate(e_ell_parts))
    inv_d = 1.0 / jnp.maximum(denom, _TINY)

    # ---- normalize per tier
    out_cells = out_bell = None
    if e_cells is not None:
        cp = plan.cells
        m_pad = -(-m // cp.row_block) * cp.row_block
        dr = jnp.pad(inv_d, (0, m_pad - m)).reshape(-1, cp.row_block)
        dr = jnp.take(dr, cp.cell_rb, axis=0)
        out_cells = e_cells * dr[:, :, None]
    if e_bell is not None:
        rows_b, _ = _bell_rows_cols(plan.bell, plan.num_rows,
                                    plan.num_cols)
        out_bell = e_bell * jnp.take(inv_d, rows_b)
    parts = []
    o = 0
    for cols_b, mask, _, rows_b, k in _ell_buckets(ell_plan):
        rb = cols_b.shape[0]
        if rb == 0 or k == 0:
            continue
        rows = _ell_rows(ell_plan, rows_b, rb)
        e = jax.lax.slice(e_ell, (o,), (o + rb * k,)).reshape(rb, k)
        parts.append((e * jnp.take(inv_d, rows)[:, None]).reshape(-1))
        o += rb * k
    out_ell = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    return SlotValues(out_cells, out_bell, out_ell)


# ---------------------------------------------------------------------------
# spmm_slots
# ---------------------------------------------------------------------------

def _spmm_slots_fwd_impl(kind, st_idx, sv: SlotValues, x, mult):
    plan = st_idx[0]
    from dgsparse_tpu.kernels import pallas_spmm as kp

    if kind == "hybrid":
        w = {"cells": None if sv.cells is None else sv.cells * mult,
             "bell": sv.bell, "ell": sv.ell}
        return kp.spmm_hybrid(plan, None, x, ReduceOp.SUM, w_slot=w)
    if isinstance(plan, BucketedEllPlan):
        return kp.spmm_bucketed_ell(plan, None, x, w_slot=sv.ell)
    return kp.spmm_ell(plan, None, x, w_slot=sv.ell)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _spmm_slots(kind, num_cols, st_idx, sv, x, mult):
    return _spmm_slots_fwd_impl(kind, st_idx, sv, x, mult)


def _spmm_slots_f(kind, num_cols, st_idx, sv, x, mult):
    out = _spmm_slots_fwd_impl(kind, st_idx, sv, x, mult)
    return out, (st_idx, sv, x, mult)


def _spmm_slots_b(kind, num_cols, residuals, g):
    st_idx, sv, x, mult = residuals
    plan = st_idx[0]
    from dgsparse_tpu.kernels import pallas_spmm as kp
    from dgsparse_tpu.kernels.pallas_sddmm import sddmm_cells

    g32 = g.astype(jnp.float32)
    # d_sv = per-slot dot(g[row], x[col]) — the slot-space SDDMM of (g, x)
    if kind == "hybrid":
        hp = plan
        d_cells = None
        if hp.cells is not None:
            d_cells = sddmm_cells(hp.cells, g32, x.astype(
                jnp.float32)).reshape(mult.shape) * mult
        d_bell = None
        if hp.bell is not None:
            rows, cols = _bell_rows_cols(hp.bell, hp.num_rows, hp.num_cols)
            d_bell = jnp.einsum(
                "ef,ef->e", jnp.take(g32, rows, axis=0),
                jnp.take(x, cols, axis=0).astype(jnp.float32),
                preferred_element_type=jnp.float32)
            d_bell = jnp.where(hp.bell.eperm >= 0, d_bell, 0)
        ell_plan = hp.ell
    else:
        d_cells = d_bell = None
        ell_plan = plan
    parts = []
    for cols_b, mask, _, rows_b, k in _ell_buckets(ell_plan):
        rb = cols_b.shape[0]
        if rb == 0 or k == 0:
            continue
        xg = jnp.take(x, cols_b.reshape(-1),
                      axis=0).astype(jnp.float32).reshape(rb, k, -1)
        gg = jnp.take(g32, _ell_rows(ell_plan, rows_b, rb), axis=0)
        v = jnp.einsum("mf,mkf->mk", gg, xg,
                       preferred_element_type=jnp.float32)
        parts.append((v * mask).reshape(-1))
    d_ell = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    d_sv = SlotValues(d_cells, d_bell, d_ell)

    # d_x = A(v)^T . g
    if kind == "hybrid":
        gt_map, gt_valid = st_idx[1], st_idx[2]
        if gt_map is not None:
            gt = jnp.where(gt_valid,
                           jnp.take(_noncells_stream(sv), gt_map), 0)
        else:
            gt = None
        wt = {"cells": None if sv.cells is None else sv.cells * mult,
              "ell_t": gt}
        d_x = kp.spmm_hybrid_t(plan, None, g32, w_slot=wt).astype(x.dtype)
    else:
        d_x = _ell_transpose_spmm(st_idx, num_cols, sv.ell,
                                  g32).astype(x.dtype)
    return (jax.tree.map(_int_zero, st_idx), d_sv, d_x,
            jnp.zeros_like(mult))


_spmm_slots.defvjp(_spmm_slots_f, _spmm_slots_b)


# ---------------------------------------------------------------------------
# spmm_slots MAX/MIN (ELL kind): K-slot argmax residuals, slot-space VJP
# (VERDICT r4 #9 — replaces the round-4 scope guard). The forward is the
# existing ELL maxmin kernel (kernels/pallas_spmm.spmm_ell_maxmin) fed
# slot-resident values; the backward mirrors the round-4 edge-order
# slot-space formulation (ops/spmm.py) except d_values stays IN slot
# space — no plan.inv edge-order assembly at either end. `compute`
# generalizes to the gspmm-fp semiring (include/gspmm.h:67-79 semantics:
# contrib = feat OP edge).
# ---------------------------------------------------------------------------

def _ell_flat_meta(plan):
    """Static (rbs, ks) bucket geometry for EllPlan/BucketedEllPlan."""
    if isinstance(plan, BucketedEllPlan):
        return plan.rbs, plan.ks
    return (plan.num_rows,), (plan.k,)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _spmm_slots_mm(reduce, compute, num_cols, st_idx, v_ell, x):
    out, _ = _spmm_slots_mm_f(reduce, compute, num_cols, st_idx, v_ell, x)
    return out


def _spmm_slots_mm_f(reduce, compute, num_cols, st_idx, v_ell, x):
    from dgsparse_tpu.kernels.pallas_spmm import spmm_ell_maxmin

    plan = st_idx[0]
    out, arg = spmm_ell_maxmin(plan, None, x, reduce, compute=compute,
                               w_slot=v_ell)
    return out, (st_idx, v_ell, x, arg)


def _spmm_slots_mm_b(reduce, compute, num_cols, residuals, g):
    from dgsparse_tpu.kernels.pallas_spmm import segment_matmul
    from dgsparse_tpu.ops.types import ComputeOp

    st_idx, v_ell, x, arg = residuals
    (plan, _, _, plan_bwd, mm_comp, perm, row_csc, csc_col) = st_idx
    g32 = g.astype(jnp.float32)
    rbs, ks = _ell_flat_meta(plan)
    g_cat = (jnp.take(g32, plan.rows, axis=0)
             if isinstance(plan, BucketedEllPlan) else g32)
    flat_n = sum(rb * k for rb, k in zip(rbs, ks))
    adt = arg.dtype
    if len(ks) == 1:
        reps = jnp.full((rbs[0],), ks[0], jnp.int32)
        slot_k = jnp.tile(jnp.arange(ks[0], dtype=adt), rbs[0])
    else:
        reps = jnp.concatenate([jnp.full((rb,), k, jnp.int32)
                                for rb, k in zip(rbs, ks)])
        slot_k = jnp.concatenate([jnp.tile(jnp.arange(k, dtype=adt), rb)
                                  for rb, k in zip(rbs, ks)])
    arg_flat = jnp.repeat(arg, reps, axis=0, total_repeat_length=flat_n)
    g_flat = jnp.repeat(g_cat, reps, axis=0, total_repeat_length=flat_n)
    valid = plan.eperm.reshape(-1) >= 0
    win = jnp.logical_and(arg_flat == slot_k[:, None], valid[:, None])
    g_win = jnp.where(win, g_flat, 0)                      # [slots, F]
    v32 = v_ell.astype(jnp.float32)
    safe_v = jnp.where(valid, v32, 1.0)
    feats = None
    if compute in (ComputeOp.MUL, ComputeOp.DIV):
        feats = jnp.take(x, plan.cols.reshape(-1),
                         axis=0).astype(jnp.float32)
    # d_v[slot] = sum_f win*g * d(contrib)/d(edge); contrib = feat OP edge
    if compute == ComputeOp.MUL:
        d_v = jnp.sum(g_win * feats, axis=-1)
    elif compute == ComputeOp.ADD:
        d_v = jnp.sum(g_win, axis=-1)
    elif compute == ComputeOp.SUB:                         # c = x - v
        d_v = -jnp.sum(g_win, axis=-1)
    else:                                                  # DIV: c = x / v
        d_v = -jnp.sum(g_win * feats, axis=-1) / (safe_v * safe_v)
    d_v = jnp.where(valid, d_v, 0).astype(v_ell.dtype)
    # d_x: per-slot contribution = win * g * d(contrib)/d(feat), summed
    # into columns via the transpose ESC plan (scatter-free, same route
    # as the edge-order backward) or the CSC segment fallback
    if compute == ComputeOp.MUL:
        contrib_flat = g_win * v32[:, None]
    elif compute == ComputeOp.DIV:
        contrib_flat = g_win * (1.0 / safe_v)[:, None]
    else:                                                  # ADD / SUB: 1
        contrib_flat = g_win
    if mm_comp is not None and plan_bwd is not None:
        csl = jnp.take(contrib_flat, mm_comp, axis=0) \
            * (plan_bwd.eperm >= 0)[:, None].astype(jnp.float32)
        d_x = segment_matmul(
            csl, plan_bwd.lrow, plan_bwd.tile_rb, plan_bwd.num_tiles,
            plan_bwd.edge_tile, plan_bwd.row_block,
            plan_bwd.num_row_blocks * plan_bwd.row_block)[:num_cols]
    else:
        contrib_csc = jnp.take(contrib_flat, jnp.take(plan.inv, perm),
                               axis=0)
        d_x = jax.ops.segment_sum(contrib_csc, csc_col,
                                  num_segments=num_cols,
                                  indices_are_sorted=True)
    return (jax.tree.map(_int_zero, st_idx), d_v, d_x.astype(x.dtype))


_spmm_slots_mm.defvjp(_spmm_slots_mm_f, _spmm_slots_mm_b)


def _ell_st_idx(st, plan):
    """The st_idx tuple shared by the ELL-kind slot ops."""
    return (plan, st.col(), st.coo_row(), st.plan(transpose=True),
            st.mm_comp(), st.csr2csc(), st.row(), st.csc_col())


def _sv_ones(sparse: SparseTensor, sv: SlotValues) -> SlotValues:
    """All-ones SlotValues over the valid slots of `sparse`'s plan (the
    unweighted / copy-u weighting; cell-tier consumers weight by the
    multiplicity grid, so ones at every position are exact)."""
    kind, plan = _layout(sparse)
    if kind == "hybrid":
        cells = None if sv.cells is None else jnp.ones_like(sv.cells)
        bell = (None if sv.bell is None else
                (plan.bell.eperm >= 0).astype(sv.bell.dtype))
        ell_plan = plan.ell
    else:
        cells = bell = None
        ell_plan = plan
    ell = (ell_plan.eperm.reshape(-1) >= 0).astype(sv.ell.dtype)
    return SlotValues(cells, bell, ell)


def _sv_reciprocal(sparse: SparseTensor, sv: SlotValues) -> SlotValues:
    """1/v per valid slot, 0 at padding (padding slots must stay 0 so the
    weighted K-sums cancel them; a bare 1/0 would poison them with inf)."""
    kind, plan = _layout(sparse)
    st = sparse.storage

    def recip(v, valid):
        return jnp.where(valid, 1.0 / jnp.where(valid, v, 1.0),
                         0).astype(v.dtype)

    if kind == "hybrid":
        cells = None
        if sv.cells is not None:
            mult = _cell_mult(st, plan)
            cells = recip(sv.cells, mult > 0)
        bell = (None if sv.bell is None else
                recip(sv.bell, plan.bell.eperm >= 0))
        ell_plan = plan.ell
    else:
        cells = bell = None
        ell_plan = plan
    ell = recip(sv.ell, ell_plan.eperm.reshape(-1) >= 0)
    return SlotValues(cells, bell, ell)


def sv_rowsum(sparse: SparseTensor, sv: SlotValues) -> jax.Array:
    """Per-row sum of slot-resident edge values [M] (differentiable) —
    the e-side reduction the ADD/SUB semiring decomposition needs."""
    ones = jnp.ones((sparse.sparse_sizes()[1], 1), jnp.float32)
    return spmm_slots(sparse, sv, ones, "sum")[:, 0]


def spmm_slots(sparse: SparseTensor, sv: SlotValues, x: jax.Array,
               reduce="sum") -> jax.Array:
    """SpMM with slot-resident edge values: out[r] = reduce_e v_e x[col_e]
    over the structure of `sparse` (values taken from `sv`, not from the
    SparseTensor). SUM/MEAN/MAX/MIN. The dense-cell tier weights by the
    edge multiplicity grid, so duplicate edges accumulate exactly like the
    edge-order op. MAX/MIN on pure-ELL storages run the K-slot argmax
    kernel with a fully slot-space backward; on hybrid storages max/min
    are not tierwise-decomposable, so they pay the one edge-order
    assembly gather (slots_to_edges) and ride the edge-order masked
    backward — exact, with the documented ~20 ns/edge boundary cost."""
    reduce = as_reduce(reduce)
    kind, plan = _layout(sparse)
    st = sparse.storage
    if reduce in (ReduceOp.MAX, ReduceOp.MIN):
        from dgsparse_tpu.ops.spmm import _ell_maxmin_fits
        from dgsparse_tpu.ops.spmm import spmm as _spmm_edge

        if kind == "hybrid" or not _ell_maxmin_fits(plan, x.shape[-1]):
            # hybrid (max is not tierwise-decomposable) OR a plan whose
            # [slots, F] winner buffers exceed the backward's budget
            # (they cannot row-chunk — same gate as the edge-order op,
            # ops/spmm._ell_maxmin_fits): pay the one edge-order
            # assembly gather and ride the edge-chunk-safe masked
            # backward.
            return _spmm_edge(sparse.set_values(slots_to_edges(sparse, sv)),
                              x, reduce)
        from dgsparse_tpu.ops.types import ComputeOp

        return _spmm_slots_mm(reduce, ComputeOp.MUL,
                              sparse.sparse_sizes()[1],
                              _ell_st_idx(st, plan), sv.ell, x)
    if kind == "hybrid":
        mult = _cell_mult(st, plan) if plan.cells is not None else \
            jnp.zeros((0, 1, 1), jnp.float32)
        if plan.ell_t is not None:
            gmap, valid = _ell_t_gather_map(st, plan)
        else:
            gmap = valid = None
        st_idx = (plan, gmap, valid)
    else:
        mult = jnp.zeros((0, 1, 1), jnp.float32)
        st_idx = _ell_st_idx(st, plan)
    out = _spmm_slots(kind, sparse.sparse_sizes()[1], st_idx, sv, x, mult)
    if reduce == ReduceOp.MEAN:
        rowptr = st.rowptr()
        deg = jnp.maximum(rowptr[1:] - rowptr[:-1], 1)
        out = out / deg.astype(out.dtype)[:, None]
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# boundary converters (the public assembly-permutation artifact)
# ---------------------------------------------------------------------------

def slots_to_edges(sparse: SparseTensor, sv: SlotValues) -> jax.Array:
    """Assemble CSR-edge-order values [nnz] from slot space — ONE 1-D
    gather through the public assembly permutation (HybridPlan.edge_src /
    EllPlan.inv). This is the ~20 ns/edge cost slot pipelines defer to
    the API boundary."""
    kind, plan = _layout(sparse)
    if kind == "hybrid":
        parts = []
        if sv.cells is not None:
            parts.append(sv.cells.reshape(-1))
        if sv.bell is not None:
            parts.append(sv.bell)
        parts.append(sv.ell)
        stream = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        return jnp.take(stream, plan.edge_src)
    return jnp.take(sv.ell, plan.inv)


def edges_to_slots(sparse: SparseTensor, values: jax.Array) -> SlotValues:
    """Scatter CSR-edge-order values [nnz] into slot space (the inverse
    boundary). Duplicate edges at one dense-cell position would collide
    (last writer wins) — construct such values in slot space instead."""
    kind, plan = _layout(sparse)
    if kind == "hybrid":
        cell_slots = plan.cells.cell_slots if plan.cells is not None else 0
        bell_slots = plan.bell.padded_edges if plan.bell is not None else 0
        ell_slots = plan.ell.eperm.shape[0]
        stream = jnp.zeros((cell_slots + bell_slots + ell_slots,),
                           values.dtype)
        stream = stream.at[plan.edge_src].set(values)
        cells = (stream[:cell_slots].reshape(
            plan.cells.num_cells, plan.cells.row_block,
            plan.cells.col_window) if plan.cells is not None else None)
        bell = (stream[cell_slots:cell_slots + bell_slots]
                if plan.bell is not None else None)
        return SlotValues(cells, bell, stream[cell_slots + bell_slots:])
    ep = plan.eperm.reshape(-1)
    ell = jnp.where(ep >= 0, jnp.take(values, jnp.maximum(ep, 0)), 0)
    return SlotValues(None, None, ell)
