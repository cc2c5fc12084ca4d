"""Pallas TPU SpMM for MAX/MIN reductions with argmax-edge residuals.

The reference tracks the winning column per output element inside its
row-balance kernel (include/cuda/spmm_cuda.cuh:38-41) and replays it in
masked backward kernels. The TPU formulation here:

- plan tiles are built with sort_cols=False, so edges inside a tile are in
  CSR (row-major) order: each tile is a sequence of row segments,
- an in-register SEGMENTED SCAN (log2(E) pltpu.roll steps, carrying value
  and local slot id) reduces each segment to its last slot,
- a selection one-hot matmul (rows x segment-end slots) extracts per-row
  winners; values go through the exact hi/lo split matmul, local slot ids
  (< E <= 256) are exact in a single bf16 pass,
- the output row block accumulates across its tiles with an elementwise
  max (VMEM revisiting), carrying the global plan-slot id of the winner,
- the op layer converts winning plan slots to original edge ids via eperm
  and hands the same (out, arg_edge) contract to the existing custom_vjp
  (masked winner-edge scatter backward).

MEAN of the reference's init values: empty rows -> 0 (epilogue), matching
include/gspmm.h:131-148 semantics.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgsparse_tpu.core.planner import EdgeTilePlan
from dgsparse_tpu.kernels import pallas_spmm as _esc
from dgsparse_tpu.ops.types import ReduceOp

_BIG = 3.0e38  # python scalar: jnp constants would be captured by kernels


def _maxmin_kernel(row_block: int, edge_tile: int, is_min: bool,
                   tile_rb_ref, lrow_ref, contrib_ref,
                   out_ref, idx_ref):
    t = pl.program_id(0)
    lr = lrow_ref[0, 0, :]                                   # [E]
    c = contrib_ref[:].astype(jnp.float32)                   # [E, F]
    if is_min:
        c = -c

    e_ids = jax.lax.broadcasted_iota(jnp.int32, (edge_tile, 1), 0)
    lidx = jnp.broadcast_to(e_ids.astype(jnp.float32),
                            c.shape)                         # local slot ids
    seg = jnp.broadcast_to(lr[:, None], c.shape)             # segment ids

    def shift_down(x, k, fill):
        """x[i] <- x[i-k] with `fill` for i < k (static slice + concat —
        sublane pltpu.roll measured ~40x slower on v5e)."""
        top = jnp.full((k,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([top, x[:-k]], axis=0)

    # Inclusive segmented max-scan along the edge axis.
    k = 1
    while k < edge_tile:
        c_s = shift_down(c, k, -_BIG)
        i_s = shift_down(lidx, k, jnp.float32(edge_tile))
        seg_s = shift_down(seg, k, jnp.int32(-1))
        ok = seg_s == seg
        # ties keep the EARLIEST edge (reference updates the arg index only
        # on strict improvement, include/cuda/spmm_cuda.cuh:38-41)
        better = jnp.logical_and(
            ok, jnp.logical_or(c_s > c,
                               jnp.logical_and(c_s == c, i_s < lidx)))
        c = jnp.where(better, c_s, c)
        lidx = jnp.where(better, i_s, lidx)
        k *= 2

    # Segment ends: last slot of each row segment within the tile.
    nxt = jnp.concatenate(
        [seg[1:], jnp.full((1,) + seg.shape[1:], -1, seg.dtype)], axis=0)
    pos = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0)
    is_end = jnp.logical_or(pos == edge_tile - 1, nxt != seg)

    rows = jax.lax.broadcasted_iota(jnp.int32, (row_block, edge_tile), 0)
    sel = jnp.logical_and(rows == lr[None, :],
                          is_end[:, 0][None, :])             # [R, E]
    sel_bf = sel.astype(jnp.bfloat16)
    # value selection: exact via hi/lo split (sum over exactly one slot)
    val_part = _esc._split_onehot_dot(sel_bf, c)             # [R, F]
    # local slot ids < E <= 256 are exact in one bf16 pass
    idx_part = jnp.dot(sel_bf, lidx.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    has = jnp.dot(sel_bf, jnp.ones((edge_tile, 1), jnp.bfloat16),
                  preferred_element_type=jnp.float32)        # [R, 1]
    val_part = jnp.where(has > 0, val_part, -_BIG)
    gidx_part = idx_part + jnp.float32(t * edge_tile)        # global plan slot

    prev = tile_rb_ref[jnp.maximum(t - 1, 0)]
    is_first = jnp.logical_or(t == 0, prev != tile_rb_ref[t])

    @pl.when(is_first)
    def _():
        out_ref[:] = val_part
        idx_ref[:] = gidx_part

    @pl.when(jnp.logical_not(is_first))
    def _():
        cur = out_ref[:]
        upd = val_part > cur
        out_ref[:] = jnp.where(upd, val_part, cur)
        idx_ref[:] = jnp.where(upd, gidx_part, idx_ref[:])


def spmm_maxmin_esc(
    plan: EdgeTilePlan,          # built with sort_cols=False (CSR order)
    values: Optional[jax.Array],
    dense: jax.Array,
    reduce: ReduceOp,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (out [M, F], arg_edge [M, F] int32 with sentinel nnz)."""
    if reduce not in (ReduceOp.MAX, ReduceOp.MIN):
        raise ValueError(reduce)
    is_min = reduce == ReduceOp.MIN
    f = dense.shape[-1]
    f_pad = _esc._round_up(max(f, 128), 128)
    if f_pad != f:
        dense = jnp.pad(dense, ((0, 0), (0, f_pad - f)))

    valid = plan.eperm >= 0
    safe_perm = jnp.maximum(plan.eperm, 0)
    if values is not None:
        v = jnp.take(values, safe_perm).astype(dense.dtype)
        contrib = jnp.take(dense, plan.cols, axis=0) * v[:, None]
    else:
        contrib = jnp.take(dense, plan.cols, axis=0)
    # padding slots must never win
    pad_val = -_BIG if not is_min else _BIG
    contrib = jnp.where(valid[:, None], contrib, pad_val)

    kernel = functools.partial(_maxmin_kernel, plan.row_block,
                               plan.edge_tile, is_min)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan.num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, plan.edge_tile), lambda t, rb: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.edge_tile, f_pad), lambda t, rb: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((plan.row_block, f_pad), lambda t, rb: (rb[t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.row_block, f_pad), lambda t, rb: (rb[t], 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    out, gidx = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((plan.num_rows, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((plan.num_rows, f_pad), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=_esc._INTERPRET,
    )(plan.tile_rb, plan.lrow.reshape(plan.num_tiles, 1, plan.edge_tile),
      contrib)

    if is_min:
        out = -out
    # Winners are returned in PLAN-SLOT space — converting slots to edge ids
    # here would be an [M, F]-sized gather (~40 ms for p2p at F=128); the
    # backward (already [M, F]-gather-bound) does the conversion instead.
    # Padding slots can never win a row that has real edges (they carry
    # +/-BIG), so |out| >= 1e38 identifies empty rows exactly; empty rows
    # produce 0 (reference semantics) and the sentinel slot padded_edges.
    real = jnp.abs(out) < 1e38
    out = jnp.where(real, out, 0).astype(dense.dtype)
    arg_slot = jnp.where(real,
                         jnp.clip(gidx.astype(jnp.int32), 0,
                                  plan.padded_edges - 1),
                         plan.padded_edges).astype(jnp.int32)
    return out[:, :f], arg_slot[:, :f]
