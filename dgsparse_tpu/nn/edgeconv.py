"""EdgeConv (DGCNN) layer: h_i = max_j MLP(x_i ‖ x_j − x_i).

No reference equivalent (the reference ships GCN/GIN only); included
because max-aggregation GNNs are the natural consumer of the library's
max-reduction machinery. The per-edge MLP forces an edge-space
materialization ([nnz, F']), so the layer is built from gathers + dense
MXU matmuls + a sorted segment-max (empty rows -> 0), all fused by XLA —
per PERF_GUIDE rule 4, per-edge outputs never benefit from one-hot
kernels.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from dgsparse_tpu.core.formats import SparseTensor


class EdgeConv(nn.Module):
    """Single EdgeConv layer over a fixed neighborhood structure."""

    out_features: int

    @nn.compact
    def __call__(self, x: jax.Array, adj: SparseTensor) -> jax.Array:
        st = adj.storage
        row, col = st.coo_row(), st.col()
        xi = jnp.take(x, row, axis=0)                 # [nnz, F]
        xj = jnp.take(x, col, axis=0)
        e = jnp.concatenate([xi, xj - xi], axis=-1)   # [nnz, 2F]
        e = nn.Dense(self.out_features, name="theta")(e)
        e = nn.relu(e)
        m = st.num_rows
        out = jax.ops.segment_max(e, row, num_segments=m,
                                  indices_are_sorted=True)
        # rows with no neighbors: segment_max yields -inf -> 0
        deg = st.rowptr()[1:] - st.rowptr()[:-1]
        return jnp.where((deg > 0)[:, None], out, 0)


class DGCNN(nn.Module):
    """Small DGCNN-style classifier: stacked EdgeConv + readout."""

    hidden_features: int
    out_features: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, x: jax.Array, adj: SparseTensor) -> jax.Array:
        for i in range(self.num_layers):
            x = EdgeConv(self.hidden_features, name=f"edge{i}")(x, adj)
        return nn.Dense(self.out_features, name="head")(x)
