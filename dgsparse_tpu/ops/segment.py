"""Public sorted-segment-sum built on the ESC one-hot MXU kernel.

XLA's scatter-based segment_sum is serialized on TPU (measured ~1.8 ms for
148K x 32 on v5e); this drop-in runs it as one-hot MXU matmuls over
plan-time tiles. Standalone utility — the same machinery the SpMM ops use.
Requires concrete (host-known) segment ids; falls back to
jax.ops.segment_sum otherwise.
"""



import jax
import jax.numpy as jnp
import numpy as np

from dgsparse_tpu.core.planner import build_edge_tile_plan


def _plan_from_segments(segment_ids: np.ndarray, num_segments: int):
    """Treat sorted segment ids as a CSR row structure (cols unused)."""
    counts = np.bincount(segment_ids, minlength=num_segments)
    rowptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    col = np.zeros(len(segment_ids), np.int32)
    return build_edge_tile_plan(rowptr, col, 1, sort_cols=False)


def sorted_segment_sum(
    data: jax.Array,             # [n, F]
    segment_ids,                 # [n] int, sorted ascending, CONCRETE
    num_segments: int,
) -> jax.Array:
    """segment_sum for sorted ids via the Pallas one-hot kernel."""
    from dgsparse_tpu.kernels.pallas_spmm import _round_up, segment_matmul

    if isinstance(segment_ids, jax.core.Tracer) or \
            jax.default_backend() != "tpu":
        return jax.ops.segment_sum(data, jnp.asarray(segment_ids),
                                   num_segments=num_segments,
                                   indices_are_sorted=True)

    ids = np.asarray(jax.device_get(segment_ids))
    if len(ids) and (np.diff(ids) < 0).any():
        raise ValueError("segment_ids must be sorted ascending")
    plan = _plan_from_segments(ids, num_segments)

    f = data.shape[-1]
    f_pad = _round_up(max(f, 128), 128)
    if f_pad != f:
        data = jnp.pad(data, ((0, 0), (0, f_pad - f)))
    # place data rows into plan slots (CSR order, sort_cols=False => slots
    # are the original positions, padding interleaved per row block)
    valid = plan.eperm >= 0
    gathered = jnp.where(
        valid[:, None],
        jnp.take(data, jnp.maximum(plan.eperm, 0), axis=0), 0)
    out = segment_matmul(gathered, plan.lrow, plan.tile_rb, plan.num_tiles,
                         plan.edge_tile, plan.row_block, num_segments)
    return out[:, :f] if f_pad != f else out
