from dgsparse_tpu.dist.shard import (
    ShardedCSR,
    pad_nodes,
    shard_csr,
    spmm_sharded,
)

__all__ = ["ShardedCSR", "shard_csr", "spmm_sharded", "pad_nodes"]
