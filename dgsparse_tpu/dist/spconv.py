"""Multi-chip spatially-sharded submanifold sparse convolution.

No reference equivalent (the reference is single-GPU; SURVEY.md §2.8).
Voxels are partitioned into contiguous X-axis slabs, one per device; a
submanifold conv with kernel radius r only needs neighbor voxels within r
slabs of the boundary, so the device step is:

  1. gather each shard's boundary ("halo") rows — indices resolved at PLAN
     time on the host,
  2. exchange halos with spatial neighbors via `jax.lax.ppermute` over the
     mesh axis (backward = reversed permutation, by autodiff),
  3. run the local gather-only conv (ops/spconv.py formulation) against
     [own ++ left-halo ++ right-halo] rows with plan-time o2i maps.

Everything is static-shape: slabs, halos, and rulebooks are padded to the
max over shards on the host, exactly like dist/shard.ShardedCSR.
"""

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ShardedSpConv:
    """Plan for a spatially sharded submanifold conv. All arrays carry a
    leading shard axis [D, ...]; o2i indexes the LOCAL input layout
    [own_max | left halo h_max | right halo h_max]."""

    o2i: jax.Array          # [D, k_vol, own_max] int32, -1 = miss
    out_mask: jax.Array     # [D, own_max] f32 1 for real voxels
    send_left: jax.Array    # [D, h_max] int32 own-row ids to send left
    send_right: jax.Array   # [D, h_max] int32 own-row ids to send right
    num_shards: int
    own_max: int
    h_max: int
    k_vol: int
    mid: int
    num_voxels: int         # total real voxels
    counts: tuple           # [D] real voxels per shard

    def tree_flatten(self):
        return (self.o2i, self.out_mask, self.send_left, self.send_right), (
            self.num_shards, self.own_max, self.h_max, self.k_vol,
            self.mid, self.num_voxels, self.counts)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def to_block_layout(self, x: jax.Array) -> jax.Array:
        """[num_voxels (slab-sorted), ...] -> [D*own_max, ...]."""
        parts, s = [], 0
        for d in range(self.num_shards):
            seg = x[s:s + self.counts[d]]
            s += self.counts[d]
            pad = self.own_max - self.counts[d]
            if pad:
                seg = jnp.pad(seg, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
            parts.append(seg)
        return jnp.concatenate(parts, axis=0)

    def from_block_layout(self, y: jax.Array) -> jax.Array:
        return jnp.concatenate(
            [y[d * self.own_max: d * self.own_max + self.counts[d]]
             for d in range(self.num_shards)], axis=0)


def shard_pointcloud(coords: np.ndarray, num_shards: int, kernel_size=3,
                     spatial_shape=None) -> Tuple[ShardedSpConv, np.ndarray]:
    """Partition a voxel cloud into X-slabs and build per-shard halo-aware
    submanifold rulebooks (host-side numpy; odd kernel, stride 1).

    Returns (plan, order): `order` is the slab-sort permutation — features
    must be reordered as features[order] before `plan.to_block_layout`.
    """
    from dgsparse_tpu.ops.spconv import _encode, _triple

    ks = _triple(kernel_size)
    if any(k % 2 == 0 for k in ks):
        raise ValueError("sharded submanifold conv needs odd kernels")
    r = ks[0] // 2
    k_vol = ks[0] * ks[1] * ks[2]
    mid = (k_vol - 1) // 2
    coords = np.asarray(coords, np.int64)
    n = len(coords)
    if spatial_shape is None:
        spatial_shape = tuple(int(coords[:, i + 1].max()) + 1
                              for i in range(3))
    dims = np.array([spatial_shape[0] + max(ks) + 2,
                     spatial_shape[1] + max(ks) + 2,
                     spatial_shape[2] + max(ks) + 2], np.int64)

    # slab-sort by x then stable order; split by count quantiles
    order = np.argsort(coords[:, 1], kind="stable").astype(np.int64)
    sorted_c = coords[order]
    bounds = [0]
    for d in range(1, num_shards):
        t = max((d * n) // num_shards, bounds[-1])
        # don't split inside one x-plane: halo logic assumes slab ranges
        while t < n and t > bounds[-1] and \
                sorted_c[t, 1] == sorted_c[t - 1, 1]:
            t += 1
        # monotone accumulate (as shard_csr does): the plane walk can push
        # a boundary past the next shard's quantile target
        bounds.append(max(min(t, n), bounds[-1]))
    bounds.append(n)
    counts = [bounds[d + 1] - bounds[d] for d in range(num_shards)]
    own_max = max(max(counts), 1)

    # Halo exchange is strictly nearest-neighbor: every INTERIOR slab must
    # span >= r x-planes, or voxels two shards away would be needed and
    # silently dropped. (Edge slabs are exempt: nothing exists beyond them,
    # so their full extent is already covered by the one-hop halo.)
    if r > 0:
        for d in range(1, num_shards - 1):
            lo, hi = bounds[d], bounds[d + 1]
            span = (int(sorted_c[hi - 1, 1]) - int(sorted_c[lo, 1]) + 1
                    if hi > lo else 0)
            if span < r:
                raise ValueError(
                    f"shard {d} spans {span} x-plane(s) < kernel radius "
                    f"{r}: nearest-neighbor halo exchange would drop "
                    f"contributions. Use fewer shards or a smaller kernel.")

    # halos: voxels within r planes of the slab boundary
    halos_l, halos_r = [], []   # local row ids (within shard) to SEND
    for d in range(num_shards):
        lo, hi = bounds[d], bounds[d + 1]
        seg = sorted_c[lo:hi]
        if hi > lo:
            xmin, xmax = int(seg[0, 1]), int(seg[-1, 1])
            halos_l.append(np.nonzero(seg[:, 1] <= xmin + r - 1)[0]
                           if d > 0 else np.empty(0, np.int64))
            halos_r.append(np.nonzero(seg[:, 1] >= xmax - r + 1)[0]
                           if d < num_shards - 1 else np.empty(0, np.int64))
        else:
            halos_l.append(np.empty(0, np.int64))
            halos_r.append(np.empty(0, np.int64))
    h_max = max(max((len(h) for h in halos_l + halos_r)), 1)

    o2i = np.full((num_shards, k_vol, own_max), -1, np.int32)
    out_mask = np.zeros((num_shards, own_max), np.float32)
    send_l = np.zeros((num_shards, h_max), np.int32)
    send_r = np.zeros((num_shards, h_max), np.int32)
    for d in range(num_shards):
        send_l[d, :len(halos_l[d])] = halos_l[d]
        send_r[d, :len(halos_r[d])] = halos_r[d]

    offs = [(i, j, k) for i in range(ks[0]) for j in range(ks[1])
            for k in range(ks[2])]
    for d in range(num_shards):
        lo, hi = bounds[d], bounds[d + 1]
        seg = sorted_c[lo:hi]
        out_mask[d, :hi - lo] = 1.0
        # local input key space: own rows at [0, own), left-halo (from
        # shard d-1's RIGHT halo) at [own_max, own_max+h), right-halo
        # (from d+1's LEFT halo) after that. ppermute with no sender
        # delivers zeros; plan never references those rows then.
        key2local = {}
        for i, c in enumerate(seg):
            key2local[int(_encode(c[None], dims)[0])] = i
        if d > 0:
            src = sorted_c[bounds[d - 1]:bounds[d]][halos_r[d - 1]]
            for i, c in enumerate(src):
                key2local[int(_encode(c[None], dims)[0])] = own_max + i
        if d < num_shards - 1:
            src = sorted_c[bounds[d + 1]:bounds[d + 2]][halos_l[d + 1]]
            for i, c in enumerate(src):
                key2local[int(_encode(c[None], dims)[0])] = \
                    own_max + h_max + i
        for kp, (oi, oj, ok) in enumerate(offs):
            if kp == mid:
                continue  # separate_mid center tap = local dense matmul
            q = seg.copy()
            q[:, 1] += oi - r
            q[:, 2] += oj - ks[1] // 2
            q[:, 3] += ok - ks[2] // 2
            keys = _encode(q, dims)
            for i in range(hi - lo):
                li = key2local.get(int(keys[i]), -1)
                o2i[d, kp, i] = li
    plan = ShardedSpConv(
        o2i=jnp.asarray(o2i), out_mask=jnp.asarray(out_mask),
        send_left=jnp.asarray(send_l), send_right=jnp.asarray(send_r),
        num_shards=num_shards, own_max=own_max, h_max=h_max, k_vol=k_vol,
        mid=mid, num_voxels=n, counts=tuple(counts))
    return plan, order


def _prec(x):
    """MXU precision for fp32 matmul operands: TPU lowers fp32 dots to a
    SINGLE bf16 pass by default (~1e-3 rel error — failed the adjoint
    test on real TPU); the fp32 contract is reference parity, so fp32
    inputs use HIGHEST. bf16 inputs keep the fast single pass."""
    return jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None


def spconv_sharded(plan: ShardedSpConv, x: jax.Array, kernel: jax.Array,
                   mesh: Mesh, axis: str = "graph") -> jax.Array:
    """Sharded submanifold conv. x: [D*own_max, C_in] slab-block layout,
    sharded over `axis`. kernel: [k_vol, C_in, C_out] replicated.
    Returns [D*own_max, C_out] in the same layout/sharding."""
    D = plan.num_shards
    right = [(d, d + 1) for d in range(D - 1)]   # send to x+ neighbor
    left = [(d + 1, d) for d in range(D - 1)]    # send to x- neighbor

    def local(o2i, mask, s_l, s_r, x_own):
        o2i, mask = o2i[0], mask[0]
        halo_r = jnp.take(x_own, s_r[0], axis=0)      # my right boundary
        halo_l = jnp.take(x_own, s_l[0], axis=0)      # my left boundary
        # my right halo becomes my RIGHT neighbor's left-halo input, etc.
        recv_from_left = jax.lax.ppermute(halo_r, axis, right)
        recv_from_right = jax.lax.ppermute(halo_l, axis, left)
        x_local = jnp.concatenate([x_own, recv_from_left, recv_from_right],
                                  axis=0)
        out = jnp.dot(x_own, kernel[plan.mid],
                      preferred_element_type=jnp.float32,
                precision=_prec(x))
        # Off-center taps as a lax.scan over [k_vol-1] stacked (o2i row,
        # kernel tap): an unrolled Python loop emits k_vol copies of the
        # gather+dot graph, and under shard_map+vjp that made a 27-tap
        # grad compile ~50x slower than the single-device path (and would
        # be 125 copies for a 5^3 kernel). Each step is still a full
        # [own, C_in] x [C_in, C_out] MXU matmul.
        m = plan.mid
        idxs = jnp.concatenate([o2i[:m], o2i[m + 1:]], axis=0)
        kers = jnp.concatenate([kernel[:m], kernel[m + 1:]], axis=0)

        def tap(acc, ik):
            idx, ker = ik
            hit = (idx >= 0)[:, None]
            g = jnp.where(hit, jnp.take(x_local, jnp.maximum(idx, 0),
                                        axis=0), 0)
            return acc + jnp.dot(g, ker,
                                 preferred_element_type=jnp.float32,
                precision=_prec(x)), None

        out, _ = jax.lax.scan(tap, out, (idxs, kers))
        return (out * mask[:, None]).astype(x.dtype)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(plan.o2i, plan.out_mask, plan.send_left, plan.send_right, x)
