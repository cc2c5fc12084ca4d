"""Pallas TPU SDDMM kernel.

Per-edge dots out[e] = dot(d1[row_e], d2[col_e]) over the edge-tile plan
(reference: sddmmCSR*Scale, include/cuda/sddmm_cuda.cuh:222-401). The d2
side is an XLA gather (unavoidable random access); the d1 side needs NO
gather at all: each tile's rows live inside one 128-row block, so the
kernel streams the d1 row block (BlockSpec indexed by the prefetched
tile->row-block map) and expands it per-edge with an iota-compare one-hot
on the MXU — the mirror image of the ESC scatter trick. This halves the
random-gather traffic vs the two-sided XLA formulation.


MEASURED OUTCOME (kept for the record): this kernel LOSES to the plain
2-row-gather XLA formulation (kernels/xla.sddmm) at every scale tried —
p2p 3.2 vs 1.8 ms, arxiv-scale 32 vs 14 ms @F=32. SDDMM emits per-edge
outputs with no reduction, so the two gathers are the entire cost and the
per-tile one-hot row expansion here is pure overhead. The ops layer
(ops/sddmm.py, ops/spmm.py d_values) therefore uses kx.sddmm; this kernel
remains only as a correctness-tested artifact of the experiment."""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgsparse_tpu.core.planner import EdgeTilePlan
from dgsparse_tpu.kernels import pallas_spmm as _esc
from dgsparse_tpu.ops.types import ReduceOp


def _sddmm_kernel(row_block: int, edge_tile: int,
                  tile_rb_ref, lrow_ref, d2g_ref, d1_ref, out_ref):
    lr = lrow_ref[0, 0, :]                                  # [E]
    rows = jax.lax.broadcasted_iota(jnp.int32, (edge_tile, row_block), 1)
    sT = (rows == lr[:, None]).astype(jnp.bfloat16)         # [E, R] exact
    d1e = _esc._split_onehot_dot(sT, d1_ref[:])             # [E, F]
    vals = jnp.sum(d1e * d2g_ref[:].astype(jnp.float32), axis=1)
    out_ref[0, 0, :] = vals


def sddmm_esc(
    plan: EdgeTilePlan,
    d1: jax.Array,            # [M, F] row operand
    d2: jax.Array,            # [N, F] col operand
    reduce: ReduceOp = ReduceOp.SUM,
    degrees: Optional[jax.Array] = None,
) -> jax.Array:
    """Returns per-edge values [nnz] in original CSR edge order."""
    f = d1.shape[-1]
    f_pad = _esc._round_up(max(f, 128), 128)
    if f_pad != f:
        d1 = jnp.pad(d1, ((0, 0), (0, f_pad - f)))
        d2 = jnp.pad(d2, ((0, 0), (0, f_pad - f)))
    m_pad = plan.num_row_blocks * plan.row_block
    if m_pad != d1.shape[0]:
        d1 = jnp.pad(d1, ((0, m_pad - d1.shape[0]), (0, 0)))

    d2g = jnp.take(d2, plan.cols, axis=0)                   # [T*E, F]

    kernel = functools.partial(_sddmm_kernel, plan.row_block, plan.edge_tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan.num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, plan.edge_tile), lambda t, rb: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.edge_tile, f_pad), lambda t, rb: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.row_block, f_pad), lambda t, rb: (rb[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, plan.edge_tile),
                               lambda t, rb: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    vals_plan = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((plan.num_tiles, 1, plan.edge_tile),
                                       jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * plan.num_tiles * plan.edge_tile * plan.row_block
            * f_pad,
            bytes_accessed=2 * plan.padded_edges * f_pad * 4,
            transcendentals=0,
        ),
        interpret=_esc._INTERPRET,
    )(plan.tile_rb, plan.lrow.reshape(plan.num_tiles, 1, plan.edge_tile),
      d2g, d1)

    out = jnp.take(vals_plan.reshape(-1), plan.inv_eperm)
    if reduce == ReduceOp.MEAN:
        if degrees is None:
            raise ValueError("degrees required for MEAN")
        rb = jnp.repeat(plan.tile_rb, plan.edge_tile)
        rows = rb * plan.row_block + plan.lrow
        row_of_edge = jnp.take(rows, plan.inv_eperm)
        out = out / jnp.take(jnp.maximum(degrees, 1),
                             jnp.minimum(row_of_edge, plan.num_rows - 1)
                             ).astype(out.dtype)
    return out


def _sddmm_cells_kernel(compute_dtype, rb_ref, cw_ref, d1_ref, d2_ref,
                        out_ref):
    """out[t] = d1[rb[t]] @ d2[cw[t]]ᵀ — one MXU pass per dense cell.
    All of a cell's per-edge dot products come from a single [R,F]x[F,C]
    matmul (the SDDMM mirror of the dense-cell SpMM tier)."""
    dims = (((1,), (1,)), ((), ()))
    if compute_dtype == jnp.float32:
        block = jax.lax.dot_general(
            d1_ref[:], d2_ref[:], dims,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    else:
        block = jax.lax.dot_general(
            d1_ref[:].astype(jnp.bfloat16), d2_ref[:].astype(jnp.bfloat16),
            dims, preferred_element_type=jnp.float32)
    out_ref[0] = block


def sddmm_cells(plan, d1: jax.Array, d2: jax.Array,
                compute_dtype=jnp.float32) -> jax.Array:
    """Per-slot SDDMM over a DenseCellPlan: returns the FLAT
    [ncells*R*C] block values (edge values are one gather away via
    plan.slot / HybridPlan.edge_src)."""
    r, c = plan.row_block, plan.col_window
    f = d1.shape[-1]
    f_pad = _esc._round_up(max(f, 128), 128)
    if f_pad != f:
        d1 = jnp.pad(d1, ((0, 0), (0, f_pad - f)))
        d2 = jnp.pad(d2, ((0, 0), (0, f_pad - f)))
    m_pad = _esc._round_up(plan.num_rows, r)
    n_pad = _esc._round_up(plan.num_cols, c)
    if m_pad != d1.shape[0]:
        d1 = jnp.pad(d1, ((0, m_pad - d1.shape[0]), (0, 0)))
    if n_pad != d2.shape[0]:
        d2 = jnp.pad(d2, ((0, n_pad - d2.shape[0]), (0, 0)))
    kernel = functools.partial(_sddmm_cells_kernel, compute_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(plan.num_cells,),
        in_specs=[
            pl.BlockSpec((r, f_pad), lambda t, rb, cw: (rb[t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, f_pad), lambda t, rb, cw: (cw[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, c), lambda t, rb, cw: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((plan.num_cells, r, c), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * plan.num_cells * r * c * f_pad,
            bytes_accessed=plan.num_cells * (r + c) * f_pad * 4
            + plan.num_cells * r * c * 4,
            transcendentals=0,
        ),
        interpret=_esc._INTERPRET,
    )(plan.cell_rb, plan.cell_cw, d1, d2)
    return out.reshape(-1)


def sddmm_hybrid(hp, d1: jax.Array, d2: jax.Array,
                 reduce: ReduceOp = ReduceOp.SUM,
                 degrees=None, coo_row=None,
                 compute_dtype=jnp.float32) -> jax.Array:
    """SDDMM routed through a 3-tier HybridPlan: dense cells as block
    matmuls (one MXU pass per cell instead of per-edge row gathers), BELL
    and ELL tiers as slot-parallel gather+dot, then ONE 1-D gather
    (edge_src) assembles CSR edge order. At clustered-graph scale this
    replaces 2 row gathers per edge (~10 ns/edge) with ~1.5 ns/edge of
    1-D gathers for the dense tier."""
    parts = []
    if hp.cells is not None:
        parts.append(sddmm_cells(hp.cells, d1, d2,
                                 compute_dtype=compute_dtype))
    if hp.bell is not None:
        bp = hp.bell
        rows = jnp.repeat(bp.tile_rb, bp.edge_tile) * bp.row_block + bp.lrow
        cols = jnp.repeat(bp.tile_cw, bp.edge_tile) * bp.col_window \
            + bp.lcol
        rows = jnp.minimum(rows, hp.num_rows - 1)
        d1g = jnp.take(d1, rows, axis=0)
        d2g = jnp.take(d2, cols, axis=0)
        parts.append(jnp.einsum("ef,ef->e", d1g, d2g,
                                preferred_element_type=jnp.float32))
    for cols_b, _, _, rows_b, k in hp.ell.bucket_views():
        rb = cols_b.shape[0]
        if rb == 0:
            continue
        d2g = jnp.take(d2, cols_b.reshape(-1),
                       axis=0).reshape(rb, k, -1)
        d1g = jnp.take(d1, rows_b, axis=0)
        parts.append(jnp.einsum("mf,mkf->mk", d1g, d2g,
                                preferred_element_type=jnp.float32
                                ).reshape(-1))
    stream = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    out = jnp.take(stream, hp.edge_src)
    if reduce == ReduceOp.MEAN:
        if degrees is None or coo_row is None:
            raise ValueError("degrees+coo_row required for MEAN")
        out = out / jnp.take(jnp.maximum(degrees, 1).astype(out.dtype),
                             coo_row)
    return out
