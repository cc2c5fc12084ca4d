"""GAT layer built on the library primitives: per-edge attention scores,
edge_softmax, then value-weighted SpMM.

No reference equivalent exists — the reference *declares* edge_softmax_cuda
but never implements it (include/dgsparse.h:17) and ships no GAT. This is
the natural demo of SDDMM-style per-edge scoring + edge_softmax + SpMM.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from dgsparse_tpu.core.formats import SparseTensor
from dgsparse_tpu.ops.edge_softmax import edge_softmax
from dgsparse_tpu.ops.spmm_mh import spmm_multihead
from dgsparse_tpu.ops.types import Algorithm


class GATConv(nn.Module):
    """Single GAT layer with `num_heads` attention heads (concatenated)."""

    out_features: int
    num_heads: int = 1
    negative_slope: float = 0.2
    algorithm: Algorithm = Algorithm.AUTO

    @nn.compact
    def __call__(self, x: jax.Array, adj: SparseTensor) -> jax.Array:
        h = nn.Dense(self.out_features * self.num_heads, use_bias=False,
                     name="proj")(x)
        h = h.reshape(x.shape[0], self.num_heads, self.out_features)
        a_dst = self.param(
            "a_dst", nn.initializers.glorot_uniform(),
            (self.num_heads, self.out_features))
        a_src = self.param(
            "a_src", nn.initializers.glorot_uniform(),
            (self.num_heads, self.out_features))
        # Per-node attention halves; per-edge score = dst half + src half.
        sd = jnp.einsum("nhf,hf->nh", h, a_dst)
        ss = jnp.einsum("nhf,hf->nh", h, a_src)
        st = adj.storage
        from dgsparse_tpu.core.planner import HybridPlan

        # slot-space fused path: rank-1 logits + softmax + weighted SpMM
        # without any CSR-edge-order intermediate (ops/attention). Gated
        # to big graphs: the per-head loop only beats the all-heads-at-
        # once edge pipeline when the [nnz]-order intermediates dominate.
        if isinstance(st.ell_plan(), HybridPlan) and st.nnz() >= (1 << 21):
            from dgsparse_tpu.ops.attention import gat_attention

            outs = [gat_attention(adj, sd[:, i], ss[:, i], h[:, i],
                                  self.negative_slope)
                    for i in range(self.num_heads)]
            out = jnp.stack(outs, axis=1)
            return out.reshape(x.shape[0],
                               self.num_heads * self.out_features)
        row, col = st.coo_row(), st.col()
        logits = jnp.take(sd, row, axis=0) + jnp.take(ss, col, axis=0)
        logits = nn.leaky_relu(logits, self.negative_slope)  # [nnz, H]

        alpha = edge_softmax(adj, logits)         # [nnz, H] all heads at once
        out = spmm_multihead(adj, alpha, h, "sum", self.algorithm)
        return out.reshape(x.shape[0], self.num_heads * self.out_features)


class GAT(nn.Module):
    """2-layer GAT."""

    hidden_features: int
    out_features: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, adj: SparseTensor,
                 train: bool = False) -> jax.Array:
        x = GATConv(self.hidden_features, self.num_heads, name="gat1")(x, adj)
        x = nn.elu(x)
        return GATConv(self.out_features, 1, name="gat2")(x, adj)
