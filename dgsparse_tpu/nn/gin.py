"""GIN layer + model (reference: dgsparse/nn/ginconv.py:9-112).

out = MLP((1 + eps) * x + aggregate_neigh(adj, x)), with the aggregator
selected from {sum, max, mean} like the reference's `aggregator_type`.
Unlike the reference — which rebuilds the CSR from edge_index on every
forward (ginconv.py:41-61) — the SparseTensor is built once on the host;
sparsity structure is static under jit.
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dgsparse_tpu.core.formats import SparseTensor
from dgsparse_tpu.ops.spmm import spmm
from dgsparse_tpu.ops.types import Algorithm


class MLP(nn.Module):
    features: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f)(x)
            if i + 1 < len(self.features):
                x = nn.relu(x)
        return x


class GINConv(nn.Module):
    """Reference parity: GINConv (ginconv.py:9-61)."""

    features: Sequence[int]
    aggregator_type: str = "sum"        # {sum, max, mean}
    init_eps: float = 0.0
    learn_eps: bool = False
    algorithm: Algorithm = Algorithm.AUTO

    @nn.compact
    def __call__(self, x: jax.Array, adj: SparseTensor) -> jax.Array:
        if self.aggregator_type not in ("sum", "max", "mean"):
            raise ValueError(f"bad aggregator {self.aggregator_type}")
        if self.learn_eps:
            eps = self.param("eps", lambda _: jnp.asarray(self.init_eps,
                                                          jnp.float32))
        else:
            eps = self.init_eps
        neigh = spmm(adj, x, self.aggregator_type, self.algorithm)
        return MLP(self.features, name="apply_func")((1 + eps) * x + neigh)


class GIN(nn.Module):
    """Multi-layer GIN (reference: ginconv.py:64-112)."""

    hidden_features: int
    out_features: int
    num_layers: int = 2
    aggregator_type: str = "sum"
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, adj: SparseTensor,
                 train: bool = False) -> jax.Array:
        for i in range(self.num_layers - 1):
            x = GINConv(
                (self.hidden_features, self.hidden_features),
                self.aggregator_type,
                name=f"gin{i}",
            )(x, adj)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.out_features, name="readout")(x)
