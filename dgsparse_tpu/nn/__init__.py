"""GNN modules (reference: dgsparse/nn/ — note the reference's re-exports
never executed due to its misnamed `__init.py`; this package exports for
real)."""

from dgsparse_tpu.nn.gcn import (
    GCN,
    GCNConv,
    gcn_norm_from_edge_index,
    get_gcn_dcsr_from_edge_index,
)
from dgsparse_tpu.nn.gin import GIN, GINConv, MLP
from dgsparse_tpu.nn.gat import GAT, GATConv
from dgsparse_tpu.nn.sage import SAGE, SAGEConv
from dgsparse_tpu.nn.sparse_conv import (
    SparseConv3d,
    SparseConvBlock,
    SparseInverseConv3d,
    SubMConv3d,
)

__all__ = [
    "GCN",
    "GCNConv",
    "GIN",
    "GINConv",
    "GAT",
    "GATConv",
    "MLP",
    "SAGE",
    "SAGEConv",
    "SubMConv3d",
    "SparseConv3d",
    "SparseConvBlock",
    "SparseInverseConv3d",
    "gcn_norm_from_edge_index",
    "get_gcn_dcsr_from_edge_index",
]
