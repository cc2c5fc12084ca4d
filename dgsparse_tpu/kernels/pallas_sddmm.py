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
