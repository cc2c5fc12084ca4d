from dgsparse_tpu.dist.spconv import (  # noqa: F401
    ShardedSpConv,
    shard_pointcloud,
    spconv_sharded,
)
from dgsparse_tpu.dist.shard import (
    spmm_feature_sharded,
    ShardedCSR,
    pad_nodes,
    shard_csr,
    sddmm_sharded,
    spmm_sharded,
    spmm_sharded_2d,
)

__all__ = ["ShardedCSR", "shard_csr", "spmm_sharded", "sddmm_sharded",
           "ShardedSpConv", "shard_pointcloud", "spconv_sharded",
           "spmm_sharded_2d", "spmm_feature_sharded", "pad_nodes"]
