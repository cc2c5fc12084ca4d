"""Row-sharded multi-head GAT training step over a device mesh.

No reference equivalent (the reference is single-GPU and never implements
edge_softmax, include/dgsparse.h:17). Sharding design: edges live with
their DESTINATION row's shard (ShardedCSR row blocks), so the attention
softmax — normalized over each destination's in-edges — is fully local;
the only collectives are the all_gathers of the projected features and
source attention halves over the graph axis (backward: psum_scatter via
autodiff, like dist/gcn.py).
"""

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from dgsparse_tpu.dist.shard import ShardedCSR


def gat_aggregate_sharded(
    sharded: ShardedCSR,
    h: jax.Array,        # [N_pad, H, F] node-sharded projected features
    sd: jax.Array,       # [M_pad, H] destination attention halves (sharded)
    ss: jax.Array,       # [N_pad, H] source attention halves (sharded)
    mesh: Mesh,
    axis: str = "graph",
    negative_slope: float = 0.2,
) -> jax.Array:
    """One attention aggregation: per-edge logits -> per-destination-row
    softmax -> alpha-weighted multi-head neighbor sum. Returns [M_pad, H, F]
    row-sharded."""
    rps = sharded.rows_per_shard

    def local(rowptr, col, lrow, h_shard, sd_shard, ss_shard):
        hg = jax.lax.all_gather(h_shard, axis, tiled=True)   # [N, H, F]
        ssg = jax.lax.all_gather(ss_shard, axis, tiled=True)  # [N, H]
        col, lrow, rowptr = col[0], lrow[0], rowptr[0]
        sd_l = sd_shard[0] if sd_shard.ndim == 3 else sd_shard
        nnz_local = rowptr[-1]
        e_mask = jnp.arange(col.shape[0]) < nnz_local        # padding edges
        logits = jnp.take(sd_l, lrow, axis=0) + jnp.take(ssg, col, axis=0)
        logits = jax.nn.leaky_relu(logits, negative_slope)   # [E, H]
        logits = jnp.where(e_mask[:, None], logits, -jnp.inf)
        # destination rows are owned -> softmax is a LOCAL segment op
        mx = jax.ops.segment_max(logits, lrow, num_segments=rps,
                                 indices_are_sorted=True)
        mx = jnp.where(jnp.isfinite(mx), mx, 0)              # empty rows
        ex = jnp.where(e_mask[:, None],
                       jnp.exp(logits - jnp.take(mx, lrow, axis=0)), 0)
        den = jax.ops.segment_sum(ex, lrow, num_segments=rps,
                                  indices_are_sorted=True)
        alpha = ex / jnp.maximum(jnp.take(den, lrow, axis=0), 1e-16)
        contrib = jnp.take(hg, col, axis=0) * alpha[:, :, None]
        h_out, f = h_shard.shape[-2], h_shard.shape[-1]
        out = jax.ops.segment_sum(
            contrib.reshape(col.shape[0], -1), lrow, num_segments=rps,
            indices_are_sorted=True)
        return out.reshape(rps, h_out, f).astype(h.dtype)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(sharded.rowptr, sharded.col, sharded.local_row, h, sd, ss)


def init_params(key, f_in: int, f_hidden: int, f_out: int,
                heads: int) -> Dict:
    ks = jax.random.split(key, 6)

    def glorot(k, shape):
        s = (6.0 / (shape[-2] + shape[-1])) ** 0.5
        return jax.random.uniform(k, shape, jnp.float32, -s, s)

    return {
        "w1": glorot(ks[0], (f_in, heads * f_hidden)),
        "a1d": glorot(ks[1], (heads, f_hidden)),
        "a1s": glorot(ks[2], (heads, f_hidden)),
        "w2": glorot(ks[3], (heads * f_hidden, f_out)),
        "a2d": glorot(ks[4], (1, f_out)),
        "a2s": glorot(ks[5], (1, f_out)),
    }


def forward(params: Dict, adj: ShardedCSR, x: jax.Array,
            mesh: Mesh, heads: int) -> jax.Array:
    """2-layer sharded GAT; x [N_pad, F] node-sharded (square graphs:
    destination rows and source nodes share the partition)."""
    n = x.shape[0]
    h = (x @ params["w1"]).reshape(n, heads, -1)
    sd = jnp.einsum("nhf,hf->nh", h, params["a1d"])
    ss = jnp.einsum("nhf,hf->nh", h, params["a1s"])
    h = gat_aggregate_sharded(adj, h, sd, ss, mesh)
    h = jax.nn.elu(h.reshape(n, -1))
    h = (h @ params["w2"]).reshape(n, 1, -1)
    sd = jnp.einsum("nhf,hf->nh", h, params["a2d"])
    ss = jnp.einsum("nhf,hf->nh", h, params["a2s"])
    out = gat_aggregate_sharded(adj, h, sd, ss, mesh)
    return out.reshape(n, -1)


def loss_fn(params, adj, x, y, mask, mesh, heads):
    logits = forward(params, adj, x, mesh, heads)
    ls = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(ls, jnp.maximum(y, 0)[:, None], axis=1)[:, 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


def make_train_step(mesh: Mesh, adj: ShardedCSR, heads: int,
                    lr: float = 1e-2):
    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P("graph"))

    def step(params, x, y, mask):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, adj, x, y, mask, mesh, heads)
        params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return params, loss

    return jax.jit(step, in_shardings=(repl, row, row, row),
                   out_shardings=(repl, repl))
