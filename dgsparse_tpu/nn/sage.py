"""GraphSAGE layer (mean aggregator) — built on spmm_mean.

No reference equivalent (the reference ships only GCN/GIN); included for
model-family breadth on the same primitives.
"""

import flax.linen as nn
import jax

from dgsparse_tpu.core.formats import SparseTensor
from dgsparse_tpu.ops.spmm import spmm_mean
from dgsparse_tpu.ops.types import Algorithm


class SAGEConv(nn.Module):
    out_features: int
    algorithm: Algorithm = Algorithm.AUTO

    @nn.compact
    def __call__(self, x: jax.Array, adj: SparseTensor) -> jax.Array:
        neigh = spmm_mean(adj, x, self.algorithm)
        return (nn.Dense(self.out_features, name="lin_self")(x)
                + nn.Dense(self.out_features, name="lin_neigh")(neigh))


class SAGE(nn.Module):
    hidden_features: int
    out_features: int

    @nn.compact
    def __call__(self, x, adj, train: bool = False):
        x = SAGEConv(self.hidden_features, name="sage1")(x, adj)
        x = nn.relu(x)
        return SAGEConv(self.out_features, name="sage2")(x, adj)
