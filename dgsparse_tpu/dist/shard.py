"""Multi-chip row-block sharded sparse ops over a TPU mesh.

The reference has NO distributed support of any kind (SURVEY.md §2.8 — no
NCCL/MPI, single GPU, single stream). This module is the TPU-native
component invented for this rebuild (SURVEY.md §5): 1-D row-block sharding
of CSR matrices across chips with XLA collectives over ICI.

Design:
- rows of A (and the output) are partitioned into `num_shards` contiguous
  blocks; each device owns its block's CSR slice, padded to the max per-
  device nnz so every shard has identical static shapes,
- node features are sharded by node (row); the forward all-gathers X over
  ICI, computes the purely-local SpMM on owned rows, and the output needs
  NO reduction (row-partitioned outputs),
- the backward of the all-gather is automatically a psum_scatter (JAX
  differentiates lax.all_gather), which is exactly the transposed-partition
  reduction SURVEY.md §5 calls for.
"""

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from dgsparse_tpu.core.formats import SparseTensor


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ShardedCSR:
    """Row-block sharded CSR. All arrays carry a leading device axis [D,...]
    and identical per-shard shapes (padded); `row_starts` gives each shard's
    first global row."""

    rowptr: jax.Array      # [D, rows_per_shard+1] local rowptr (into padded edges)
    col: jax.Array         # [D, max_nnz] global column ids (0 padding)
    values: jax.Array      # [D, max_nnz] (0 padding)
    local_row: jax.Array   # [D, max_nnz] local row id per edge (0 padding)
    num_shards: int
    rows_per_shard: int
    num_rows: int
    num_cols: int

    def tree_flatten(self):
        return (self.rowptr, self.col, self.values, self.local_row), (
            self.num_shards, self.rows_per_shard, self.num_rows,
            self.num_cols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def shard_csr(sp: SparseTensor, num_shards: int) -> ShardedCSR:
    """Host-side partition of a SparseTensor into row blocks (numpy)."""
    rowptr = np.asarray(jax.device_get(sp.storage.rowptr()))
    col = np.asarray(jax.device_get(sp.storage.col()))
    vals = np.asarray(jax.device_get(sp.values_or_ones()))
    m, n = sp.sparse_sizes()
    rps = -(-m // num_shards)

    nnz_per = []
    for d in range(num_shards):
        lo, hi = min(d * rps, m), min((d + 1) * rps, m)
        nnz_per.append(int(rowptr[hi] - rowptr[lo]))
    max_nnz = max(max(nnz_per), 1)

    rp_l = np.zeros((num_shards, rps + 1), np.int32)
    col_l = np.zeros((num_shards, max_nnz), np.int32)
    val_l = np.zeros((num_shards, max_nnz), vals.dtype)
    lrow_l = np.zeros((num_shards, max_nnz), np.int32)
    for d in range(num_shards):
        lo, hi = min(d * rps, m), min((d + 1) * rps, m)
        e0, e1 = int(rowptr[lo]), int(rowptr[hi])
        k = e1 - e0
        rp_local = rowptr[lo:hi + 1] - e0
        rp_l[d, :hi - lo + 1] = rp_local
        rp_l[d, hi - lo + 1:] = rp_local[-1]
        col_l[d, :k] = col[e0:e1]
        val_l[d, :k] = vals[e0:e1]
        lrow_l[d, :k] = np.repeat(
            np.arange(hi - lo, dtype=np.int32), np.diff(rowptr[lo:hi + 1]))
    return ShardedCSR(
        rowptr=jnp.asarray(rp_l), col=jnp.asarray(col_l),
        values=jnp.asarray(val_l), local_row=jnp.asarray(lrow_l),
        num_shards=num_shards, rows_per_shard=rps, num_rows=m, num_cols=n)


def spmm_sharded(
    sharded: ShardedCSR,
    x: jax.Array,                 # [num_cols_padded, F], sharded by rows
    mesh: Mesh,
    axis: str = "graph",
    reduce: str = "sum",
) -> jax.Array:
    """Row-sharded SpMM: out (row-sharded) = A @ x (node-sharded).

    x's first dim must equal num_shards * ceil(num_cols / num_shards)
    (pad_nodes below). Forward: all_gather(x) over ICI, local gather +
    segment reduction, no output collective. Backward (via autodiff of
    all_gather): psum_scatter of the transposed partials.
    """
    rps = sharded.rows_per_shard
    if reduce not in ("sum", "mean"):
        raise ValueError("sharded spmm supports sum/mean")

    def local(rowptr, col, values, lrow, x_shard):
        # each arg arrives with a leading shard axis of size 1
        xg = jax.lax.all_gather(x_shard, axis, tiled=True)   # [N_pad, F]
        contrib = jnp.take(xg, col[0], axis=0) * values[0][:, None]
        out = jax.ops.segment_sum(contrib, lrow[0], num_segments=rps,
                                  indices_are_sorted=True)
        if reduce == "mean":
            deg = rowptr[0, 1:] - rowptr[0, :-1]
            out = out / jnp.maximum(deg, 1).astype(out.dtype)[:, None]
        return out

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(sharded.rowptr, sharded.col, sharded.values,
              sharded.local_row, x)


def pad_nodes(x: jax.Array, num_shards: int) -> jax.Array:
    """Pad the node axis so it divides evenly across shards."""
    n = x.shape[0]
    n_pad = -(-n // num_shards) * num_shards
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n),) + ((0, 0),) * (x.ndim - 1))
    return x
