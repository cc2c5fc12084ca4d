"""GCN layer + 2-layer model (reference: dgsparse/nn/gcnconv.py:10-70).

The reference builds D^-1/2 (A+I) D^-1/2 with torch_sparse and runs
`Linear -> spmm_sum`. Here graph normalization is a host-side numpy step
producing a SparseTensor once (sparsity structure is static), and the model
is a flax.linen module whose forward is `Dense -> spmm_sum`, jitted
end-to-end.
"""

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dgsparse_tpu.core.formats import SparseTensor
from dgsparse_tpu.ops.spmm import spmm_sum
from dgsparse_tpu.ops.types import Algorithm


def gcn_norm_from_edge_index(
    edge_index: np.ndarray, num_nodes: int, add_self_loops: bool = True
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side GCN normalization: values of D^-1/2 (A+I) D^-1/2.

    Reference parity: gcn_norm_from_edge_index (dgsparse/nn/gcnconv.py:37-50),
    rebuilt on numpy instead of torch_sparse. Returns CSR (rowptr, col, vals).
    """
    row, col = np.asarray(edge_index[0]), np.asarray(edge_index[1])
    if add_self_loops:
        loops = np.arange(num_nodes, dtype=row.dtype)
        row = np.concatenate([row, loops])
        col = np.concatenate([col, loops])
    order = np.lexsort((col, row))
    row, col = row[order], col[order]
    deg = np.bincount(row, minlength=num_nodes).astype(np.float64)
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1.0))
    vals = (dinv[row] * dinv[col]).astype(np.float32)
    rowptr = np.zeros(num_nodes + 1, np.int32)
    np.add.at(rowptr, row + 1, 1)
    rowptr = np.cumsum(rowptr).astype(np.int32)
    return rowptr, col.astype(np.int32), vals


def get_gcn_dcsr_from_edge_index(edge_index, num_nodes: int) -> SparseTensor:
    """Reference parity: get_gcn_dcsr_from_edge_index
    (dgsparse/nn/gcnconv.py:53-70) — normalized adjacency as a SparseTensor."""
    rowptr, col, vals = gcn_norm_from_edge_index(edge_index, num_nodes)
    return SparseTensor.from_csr(
        jnp.asarray(rowptr), jnp.asarray(col), jnp.asarray(vals),
        sparse_sizes=(num_nodes, num_nodes),
    )


class GCNConv(nn.Module):
    """One GCN layer: x -> A_hat · (x W). Reference: gcnconv.py:10-19."""

    out_features: int
    algorithm: Algorithm = Algorithm.AUTO

    @nn.compact
    def __call__(self, x: jax.Array, adj: SparseTensor) -> jax.Array:
        x = nn.Dense(self.out_features, name="linear")(x)
        return spmm_sum(adj, x, self.algorithm)


class GCN(nn.Module):
    """2-layer GCN (reference: gcnconv.py:22-33): conv -> relu -> dropout ->
    conv."""

    hidden_features: int
    out_features: int
    dropout: float = 0.5
    algorithm: Algorithm = Algorithm.AUTO

    @nn.compact
    def __call__(self, x: jax.Array, adj: SparseTensor,
                 train: bool = False) -> jax.Array:
        x = GCNConv(self.hidden_features, self.algorithm, name="conv1")(x, adj)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return GCNConv(self.out_features, self.algorithm, name="conv2")(x, adj)
