"""Row-sharded 2-layer GCN training step over a device mesh.

The multi-chip flagship path: adjacency row-block sharded (ShardedCSR),
node features/labels sharded by node, parameters replicated. Forward
all-gathers activations over ICI inside each sharded SpMM; backward gets
psum_scatter automatically from autodiff; parameter gradients are psummed
by XLA's sharding propagation under jit.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dgsparse_tpu.dist.shard import ShardedCSR, pad_nodes, shard_csr, spmm_sharded


def init_params(key, f_in: int, f_hidden: int, f_out: int) -> Dict:
    k1, k2 = jax.random.split(key)
    s1 = (6.0 / (f_in + f_hidden)) ** 0.5
    s2 = (6.0 / (f_hidden + f_out)) ** 0.5
    return {
        "w1": jax.random.uniform(k1, (f_in, f_hidden), jnp.float32, -s1, s1),
        "b1": jnp.zeros((f_hidden,), jnp.float32),
        "w2": jax.random.uniform(k2, (f_hidden, f_out), jnp.float32, -s2, s2),
        "b2": jnp.zeros((f_out,), jnp.float32),
    }


def forward(params: Dict, adj: ShardedCSR, x: jax.Array,
            mesh: Mesh) -> jax.Array:
    """x: [N_pad, F] node-sharded. Returns row-sharded logits [M_pad, C].

    Layer = Dense then SpMM, like the reference GCNConv
    (dgsparse/nn/gcnconv.py:16-19)."""
    h = x @ params["w1"] + params["b1"]
    h = spmm_sharded(adj, h, mesh)
    h = jax.nn.relu(h)
    h = h @ params["w2"] + params["b2"]
    return spmm_sharded(adj, h, mesh)


def loss_fn(params: Dict, adj: ShardedCSR, x: jax.Array, y: jax.Array,
            mask: jax.Array, mesh: Mesh) -> jax.Array:
    logits = forward(params, adj, x, mesh)
    ls = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(ls, jnp.maximum(y, 0)[:, None], axis=1)[:, 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


def make_train_step(mesh: Mesh, adj: ShardedCSR, lr: float = 1e-2):
    """Returns a jitted (params, x, y, mask) -> (params, loss) step with
    explicit shardings: params replicated, node data sharded over 'graph'."""
    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P("graph"))

    def step(params, x, y, mask):
        loss, grads = jax.value_and_grad(loss_fn)(params, adj, x, y, mask,
                                                  mesh)
        params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return params, loss

    return jax.jit(
        step,
        in_shardings=(repl, row, row, row),
        out_shardings=(repl, repl),
    )


def prepare_inputs(mesh: Mesh, sp, x: np.ndarray, y: np.ndarray,
                   num_shards: int):
    """Shard adjacency + pad/placement of node data. Returns
    (sharded_adj, x_dev, y_dev, mask_dev)."""
    adj = shard_csr(sp, num_shards)
    m = sp.sparse_sizes()[0]
    m_pad = adj.num_shards * adj.rows_per_shard
    xp = np.zeros((m_pad, x.shape[1]), np.float32)
    xp[:m] = x
    yp = np.full((m_pad,), -1, np.int32)
    yp[:m] = y
    mask = (yp >= 0).astype(np.float32)
    row = NamedSharding(mesh, P("graph"))
    return (adj,
            jax.device_put(jnp.asarray(xp), row),
            jax.device_put(jnp.asarray(yp), row),
            jax.device_put(jnp.asarray(mask), row))
