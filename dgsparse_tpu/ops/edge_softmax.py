"""Edge softmax: softmax of per-edge logits over each destination row.

The reference *declares* `edge_softmax_cuda` in its public C header
(include/dgsparse.h:17) but ships no implementation anywhere in the tree —
we implement it for real, since it is the natural GAT building block on top
of SDDMM + SpMM.

Numerically stable (max-shifted); empty rows are a no-op. Differentiable via
JAX autodiff — the max shift is wrapped in stop_gradient, which is exact for
softmax.
"""

import jax
import jax.numpy as jnp

from dgsparse_tpu.core.formats import SparseTensor


def edge_softmax(sparse: SparseTensor, logits) -> jax.Array:
    """Softmax of `logits` [nnz] or [nnz, ...] (e.g. per attention head)
    grouped by destination row. Returns the same shape.

    Also accepts `SlotValues` (plan-slot-resident logits, ops/slot.py)
    and returns SlotValues — the pipeline then never pays the
    ~20 ns/edge CSR-edge-order assembly (PERF_GUIDE rule 8)."""
    from dgsparse_tpu.ops.slot import SlotValues, edge_softmax_slots

    if isinstance(logits, SlotValues):
        return edge_softmax_slots(sparse, logits)
    st = sparse.storage
    row = st.coo_row()
    m = sparse.sparse_sizes()[0]
    row_max = jax.ops.segment_max(logits, row, num_segments=m,
                                  indices_are_sorted=True)
    row_max = jnp.where(jnp.isfinite(row_max), row_max, 0)
    shifted = logits - jax.lax.stop_gradient(jnp.take(row_max, row, axis=0))
    ex = jnp.exp(shifted)
    denom = jax.ops.segment_sum(ex, row, num_segments=m,
                                indices_are_sorted=True)
    return ex / jnp.take(jnp.maximum(denom, 1e-38), row, axis=0)
