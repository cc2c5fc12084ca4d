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
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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
    # Pre-built per-shard ESC plans (tile counts padded to the max shard),
    # with values already permuted into plan order (structure is static):
    p_cols: jax.Array      # [D, T*E]
    p_vals: jax.Array      # [D, T*E] (0 on padding slots)
    p_lrow: jax.Array      # [D, T, 1, E]
    p_tile_rb: jax.Array   # [D, T]
    num_shards: int
    rows_per_shard: int
    num_rows: int
    num_cols: int
    num_tiles: int         # T (max over shards)
    edge_tile: int
    row_block: int
    row_starts: tuple = None  # [D] first global row per shard (None = d*rps)
    # [nnz] gather map: global CSR edge id -> position in the flattened
    # [D*max_nnz] per-shard padded edge block (for edges_to_csr)
    edge_map: jax.Array = None

    def tree_flatten(self):
        return (self.rowptr, self.col, self.values, self.local_row,
                self.p_cols, self.p_vals, self.p_lrow, self.p_tile_rb,
                self.edge_map), (
            self.num_shards, self.rows_per_shard, self.num_rows,
            self.num_cols, self.num_tiles, self.edge_tile, self.row_block,
            self.row_starts)

    def _bounds(self):
        if self.row_starts is None:
            rs = tuple(d * self.rows_per_shard
                       for d in range(self.num_shards))
        else:
            rs = self.row_starts
        return rs + (self.num_rows,)

    def to_block_layout(self, x: jax.Array) -> jax.Array:
        """[num_rows, ...] -> [D*rps, ...]: each shard's row range padded to
        rows_per_shard (identity + tail padding when balance='rows')."""
        b = self._bounds()
        rps = self.rows_per_shard
        parts = []
        for d in range(self.num_shards):
            seg = x[b[d]:b[d + 1]]
            pad = rps - (b[d + 1] - b[d])
            if pad:
                seg = jnp.pad(seg, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
            parts.append(seg)
        return jnp.concatenate(parts, axis=0)

    def from_block_layout(self, y: jax.Array) -> jax.Array:
        """Inverse of to_block_layout: [D*rps, ...] -> [num_rows, ...]."""
        b = self._bounds()
        rps = self.rows_per_shard
        return jnp.concatenate(
            [y[d * rps: d * rps + (b[d + 1] - b[d])]
             for d in range(self.num_shards)], axis=0)

    def edges_to_csr(self, e_block: jax.Array) -> jax.Array:
        """[D, max_nnz] (or flat [D*max_nnz]) per-shard padded edge values
        -> [nnz] in global CSR edge order (one gather, jittable)."""
        return jnp.take(e_block.reshape(-1), self.edge_map, axis=0)

    @classmethod
    def tree_unflatten(cls, aux, children):
        *main, edge_map = children
        return cls(*main, *aux, edge_map=edge_map)


def shard_csr(sp: SparseTensor, num_shards: int,
              edge_tile: int = 256, row_block: int = 128,
              balance: str = "rows") -> ShardedCSR:
    """Host-side partition of a SparseTensor into contiguous row ranges
    (numpy), including per-shard ESC plans for the Pallas local kernel.

    balance="rows": equal row counts per shard (node-balanced — matches a
    uniformly sharded feature array exactly).
    balance="edges": boundaries at nnz quantiles (work-balanced — on
    power-law graphs equal-row blocks can concentrate most edges on one
    chip, so every shard pads to that straggler; edge balancing makes
    max_nnz ≈ nnz/D). The output stays padded to the max range length, so
    node features still shard uniformly.
    """
    from dgsparse_tpu.core.planner import build_edge_tile_plan

    rowptr = np.asarray(jax.device_get(sp.storage.rowptr()))
    col = np.asarray(jax.device_get(sp.storage.col()))
    vals = np.asarray(jax.device_get(sp.values_or_ones()))
    m, n = sp.sparse_sizes()
    total_nnz = int(rowptr[-1])
    if balance == "edges" and total_nnz > 0:
        targets = (np.arange(1, num_shards) * total_nnz) // num_shards
        cuts = np.searchsorted(rowptr, targets, side="left")
        bounds = np.concatenate([[0], cuts, [m]]).astype(np.int64)
        bounds = np.maximum.accumulate(bounds)  # monotone row ranges
        rps = int(np.diff(bounds).max())
    else:
        rps = -(-m // num_shards)
        bounds = np.minimum(np.arange(num_shards + 1) * rps, m)

    def rng_of(d):
        return int(bounds[d]), int(bounds[d + 1])

    if balance == "edges":
        if m != n:
            raise ValueError("balance='edges' requires a square graph "
                             "(node features shard by the same bounds)")
        # Variable row ranges break the identity between global node id and
        # its position in the gathered feature block; remap every column to
        # its BLOCK-LAYOUT position d*rps + (c - bounds[d]) at plan time so
        # the device step stays a plain gather.
        colmap = np.empty(n, np.int64)
        for d in range(num_shards):
            lo, hi = rng_of(d)
            colmap[lo:hi] = d * rps + (np.arange(lo, hi) - lo)
        col = colmap[col].astype(np.int32)
        n_gather = num_shards * rps
    else:
        n_gather = n

    nnz_per = []
    for d in range(num_shards):
        lo, hi = rng_of(d)
        nnz_per.append(int(rowptr[hi] - rowptr[lo]))
    max_nnz = max(max(nnz_per), 1)

    rp_l = np.zeros((num_shards, rps + 1), np.int32)
    col_l = np.zeros((num_shards, max_nnz), np.int32)
    val_l = np.zeros((num_shards, max_nnz), vals.dtype)
    lrow_l = np.zeros((num_shards, max_nnz), np.int32)
    plans = []
    for d in range(num_shards):
        lo, hi = rng_of(d)
        e0, e1 = int(rowptr[lo]), int(rowptr[hi])
        k = e1 - e0
        rp_local = rowptr[lo:hi + 1] - e0
        rp_l[d, :hi - lo + 1] = rp_local
        rp_l[d, hi - lo + 1:] = rp_local[-1]
        col_l[d, :k] = col[e0:e1]
        val_l[d, :k] = vals[e0:e1]
        lrow_l[d, :k] = np.repeat(
            np.arange(hi - lo, dtype=np.int32), np.diff(rowptr[lo:hi + 1]))
        # rowptr padded to rps rows for the plan
        rp_pad = np.concatenate([rp_local,
                                 np.full(rps - (hi - lo), rp_local[-1],
                                         np.int32)]) \
            if hi - lo < rps else rp_local
        plans.append(build_edge_tile_plan(
            rp_pad.astype(np.int32), col[e0:e1], n_gather, edge_tile,
            row_block))

    # Pad every shard's plan to the max tile count; padding tiles attach to
    # the last row block with zero values (pure accumulate of zeros).
    t_max = max(p.num_tiles for p in plans)
    te = t_max * edge_tile
    p_cols = np.zeros((num_shards, te), np.int32)
    p_vals = np.zeros((num_shards, te), vals.dtype)
    p_lrow = np.zeros((num_shards, te), np.int32)
    p_trb = np.zeros((num_shards, t_max), np.int32)
    for d, p in enumerate(plans):
        k = p.num_tiles * edge_tile
        p_cols[d, :k] = np.asarray(p.cols)
        ep = np.asarray(p.eperm)
        lv = np.zeros(k, vals.dtype)
        e0 = int(rowptr[rng_of(d)[0]])
        real = ep >= 0
        lv[real] = vals[e0 + ep[real]]
        p_vals[d, :k] = lv
        p_lrow[d, :k] = np.asarray(p.lrow)
        p_trb[d, :p.num_tiles] = np.asarray(p.tile_rb)
        p_trb[d, p.num_tiles:] = np.asarray(p.tile_rb)[-1]
    edge_map = np.concatenate(
        [d * max_nnz + np.arange(nnz_per[d], dtype=np.int64)
         for d in range(num_shards)]) if total_nnz else np.zeros(0, np.int64)
    if num_shards * max_nnz >= (1 << 31):
        # int32 flat-index ceiling for edges_to_csr (the framework is
        # int32 throughout and x64 is disabled): a skewed balance='rows'
        # split pads every shard to the straggler, so D*max_nnz can
        # exceed 2^31 long before the edge count does. Fail loudly
        # instead of wrapping the gather map.
        raise ValueError(
            f"num_shards * max_nnz = {num_shards * max_nnz} exceeds the "
            f"int32 edge-block index range; use balance='edges' (max_nnz "
            f"~ nnz/D) or fewer shards")
    return ShardedCSR(
        rowptr=jnp.asarray(rp_l), col=jnp.asarray(col_l),
        values=jnp.asarray(val_l), local_row=jnp.asarray(lrow_l),
        edge_map=jnp.asarray(edge_map.astype(np.int32)),
        p_cols=jnp.asarray(p_cols), p_vals=jnp.asarray(p_vals),
        p_lrow=jnp.asarray(p_lrow.reshape(num_shards, t_max, 1, edge_tile)),
        p_tile_rb=jnp.asarray(p_trb),
        num_shards=num_shards, rows_per_shard=rps, num_rows=m, num_cols=n,
        num_tiles=t_max, edge_tile=edge_tile, row_block=row_block,
        row_starts=tuple(int(b) for b in bounds[:-1]))


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
    use_pallas = jax.default_backend() == "tpu" or _FORCE_PALLAS[0]

    def local(rowptr, col, values, lrow, pc, pv, pl, prb, x_shard):
        # each arg arrives with a leading shard axis of size 1
        xg = jax.lax.all_gather(x_shard, axis, tiled=True)   # [N_pad, F]
        if use_pallas:
            # ESC: XLA fused gather+scale, one-hot MXU segment matmul.
            from dgsparse_tpu.kernels.pallas_spmm import segment_matmul

            f = xg.shape[-1]
            f_pad = -(-max(f, 128) // 128) * 128
            xp = jnp.pad(xg, ((0, 0), (0, f_pad - f))) if f_pad != f else xg
            contrib = jnp.take(xp, pc[0], axis=0) * pv[0][:, None]
            out = segment_matmul(
                contrib, pl[0].reshape(-1), prb[0], sharded.num_tiles,
                sharded.edge_tile, sharded.row_block, rps)[:, :f]
        else:
            contrib = jnp.take(xg, col[0], axis=0) * values[0][:, None]
            out = jax.ops.segment_sum(contrib, lrow[0], num_segments=rps,
                                      indices_are_sorted=True)
        if reduce == "mean":
            deg = rowptr[0, 1:] - rowptr[0, :-1]
            out = out / jnp.maximum(deg, 1).astype(out.dtype)[:, None]
        return out.astype(x.dtype)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis),) * 8 + (P(axis),),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(sharded.rowptr, sharded.col, sharded.values,
              sharded.local_row, sharded.p_cols, sharded.p_vals,
              sharded.p_lrow, sharded.p_tile_rb, x)


# test hook: force the Pallas local path off-TPU (interpret mode)
_FORCE_PALLAS = [False]


def sddmm_sharded(
    sharded: ShardedCSR,
    x: jax.Array,                 # [D*rps, F] block-layout rows (lhs)
    y: jax.Array,                 # node-sharded cols (rhs), see below
    mesh: Mesh,
    axis: str = "graph",
    reduce: str = "sum",
) -> jax.Array:
    """Row-sharded SDDMM: e[k] = <x[row(k)], y[col(k)]> over the sharded
    structure (the SpMM backward's d_values, GAT scores, the reference's
    src/sddmm/sddmm.cu role in the distributed setting).

    x is in block layout (`sharded.to_block_layout`). y is sharded by the
    same axis: [num_cols_padded, F] with global column ids for
    balance='rows' (pad_nodes), or the SAME [D*rps, F] block layout as x
    for balance='edges' (columns were block-remapped at shard time).

    Forward: all_gather(y) over ICI + two local row gathers + a lane
    reduce — no output collective (each shard owns its row block's
    edges). Backward via autodiff: d_x is a local scatter, d_y rides the
    all_gather transpose (psum_scatter).

    Returns [D, max_nnz] per-shard padded edge values (padding slots 0);
    `sharded.edges_to_csr` recovers global CSR edge order.
    """
    if reduce not in ("sum", "mean"):
        raise ValueError("sharded sddmm supports sum/mean")
    max_nnz = sharded.col.shape[1]

    def local(rowptr, col, lrow, x_shard, y_shard):
        yg = jax.lax.all_gather(y_shard, axis, tiled=True)
        xr = jnp.take(x_shard, lrow[0], axis=0)       # [max_nnz, F]
        yc = jnp.take(yg, col[0], axis=0)
        e = (xr * yc).sum(-1)
        if reduce == "mean":
            deg = rowptr[0, 1:] - rowptr[0, :-1]
            e = e / jnp.maximum(jnp.take(deg, lrow[0]), 1).astype(e.dtype)
        valid = jnp.arange(max_nnz) < rowptr[0, -1]
        return jnp.where(valid, e, jnp.zeros((), e.dtype))

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis),) * 4 + (P(axis),),
        out_specs=P(axis),
        check_vma=False,
    )
    out = fn(sharded.rowptr, sharded.col, sharded.local_row, x, y)
    return out.reshape(sharded.num_shards, max_nnz)


def spmm_feature_sharded(
    sparse,                      # SparseTensor (structure replicated)
    x: jax.Array,                # [N, F], F sharded over the mesh axis
    mesh: Mesh,
    axis: str = "graph",
    reduce: str = "sum",
) -> jax.Array:
    """Feature-dimension (tensor-parallel) SpMM: every device holds the full
    structure and a slice of feature columns — zero communication in both
    forward and backward (the complementary strategy to row-block sharding;
    right when F is large and the graph fits every chip)."""
    from dgsparse_tpu.ops.spmm import spmm

    fs = NamedSharding(mesh, P(None, axis))
    x = jax.lax.with_sharding_constraint(x, fs)
    out = spmm(sparse, x, reduce)
    return jax.lax.with_sharding_constraint(out, fs)


def pad_nodes(x: jax.Array, num_shards: int) -> jax.Array:
    """Pad the node axis so it divides evenly across shards."""
    n = x.shape[0]
    n_pad = -(-n // num_shards) * num_shards
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n),) + ((0, 0),) * (x.ndim - 1))
    return x


def spmm_sharded_2d(
    sharded: ShardedCSR,
    x: jax.Array,                 # [num_cols_padded, F] sharded (graph, feat)
    mesh: Mesh,
    graph_axis: str = "graph",
    feat_axis: str = "feat",
    reduce: str = "sum",
) -> jax.Array:
    """2-D mesh SpMM: rows of A over `graph_axis`, feature columns over
    `feat_axis` (the scaling-book mesh recipe: each collective rides one
    ICI axis). Every device holds its row-block's plan and a feature slice;
    the forward all-gathers x along `graph_axis` ONLY (feature slices never
    move), computes the local ESC SpMM on [N_pad, F/feat] and needs no
    output collective. Backward = psum_scatter along `graph_axis` (autodiff
    of the all_gather), again per feature slice.

    Combines the two 1-D strategies: communication volume drops by the
    feat-axis size vs pure row sharding; plan memory drops by the graph-
    axis size vs pure feature sharding.
    """
    rps = sharded.rows_per_shard
    if reduce not in ("sum", "mean"):
        raise ValueError("sharded spmm supports sum/mean")
    use_pallas = jax.default_backend() == "tpu" or _FORCE_PALLAS[0]

    def local(rowptr, col, values, lrow, pc, pv, pl, prb, x_shard):
        xg = jax.lax.all_gather(x_shard, graph_axis, tiled=True)
        if use_pallas:
            from dgsparse_tpu.kernels.pallas_spmm import segment_matmul

            f = xg.shape[-1]
            f_pad = -(-max(f, 128) // 128) * 128
            xp = jnp.pad(xg, ((0, 0), (0, f_pad - f))) if f_pad != f else xg
            contrib = jnp.take(xp, pc[0], axis=0) * pv[0][:, None]
            out = segment_matmul(
                contrib, pl[0].reshape(-1), prb[0], sharded.num_tiles,
                sharded.edge_tile, sharded.row_block, rps)[:, :f]
        else:
            contrib = jnp.take(xg, col[0], axis=0) * values[0][:, None]
            out = jax.ops.segment_sum(contrib, lrow[0], num_segments=rps,
                                      indices_are_sorted=True)
        if reduce == "mean":
            deg = rowptr[0, 1:] - rowptr[0, :-1]
            out = out / jnp.maximum(deg, 1).astype(out.dtype)[:, None]
        return out.astype(x.dtype)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(graph_axis),) * 8 + (P(graph_axis, feat_axis),),
        out_specs=P(graph_axis, feat_axis),
        check_vma=False,
    )
    return fn(sharded.rowptr, sharded.col, sharded.values,
              sharded.local_row, sharded.p_cols, sharded.p_vals,
              sharded.p_lrow, sharded.p_tile_rb, x)
