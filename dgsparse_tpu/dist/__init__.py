from dgsparse_tpu.dist.shard import (
    spmm_feature_sharded,
    ShardedCSR,
    pad_nodes,
    shard_csr,
    spmm_sharded,
)

__all__ = ["ShardedCSR", "shard_csr", "spmm_sharded",
           "spmm_feature_sharded", "pad_nodes"]
