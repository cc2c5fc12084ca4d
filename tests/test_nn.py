"""End-to-end GNN training tests — the reference's minimum slice is a
2-layer GCN training step (test/test_dgl.py train loop + nn/gcnconv.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dgsparse_tpu.nn import GAT, GCN, GIN, get_gcn_dcsr_from_edge_index
from dgsparse_tpu.utils.testing import random_csr


def make_graph(num_nodes=120, feat=16, num_classes=5, seed=0):
    rowptr, col, _ = random_csr(num_nodes, num_nodes, avg_degree=6.0,
                                seed=seed, with_empty_rows=False)
    coo_row = np.repeat(np.arange(num_nodes, dtype=np.int32),
                        np.diff(rowptr))
    edge_index = np.stack([coo_row, col])
    adj = get_gcn_dcsr_from_edge_index(edge_index, num_nodes)
    rng = np.random.default_rng(seed + 1)
    x = jnp.asarray(rng.standard_normal((num_nodes, feat)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, num_classes, num_nodes))
    return adj, x, y, num_classes


def _train(model, adj, x, y, steps=60, lr=2e-2):
    params = model.init(jax.random.key(0), x, adj)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, x, adj)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    return losses


def test_gcn_trains():
    adj, x, y, c = make_graph()
    losses = _train(GCN(hidden_features=32, out_features=c), adj, x, y)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses[::10]


def test_gin_trains():
    adj, x, y, c = make_graph(seed=2)
    losses = _train(GIN(hidden_features=32, out_features=c,
                        aggregator_type="max"), adj, x, y)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses[::10]


def test_gat_trains():
    adj, x, y, c = make_graph(seed=4, num_nodes=80)
    losses = _train(GAT(hidden_features=8, out_features=c, num_heads=2),
                    adj, x, y, steps=25)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses[::10]


def test_gin_aggregators_differ():
    adj, x, y, c = make_graph(seed=6)
    outs = {}
    for agg in ("sum", "max", "mean"):
        m = GIN(hidden_features=16, out_features=c, aggregator_type=agg)
        p = m.init(jax.random.key(1), x, adj)
        outs[agg] = np.asarray(m.apply(p, x, adj))
    assert not np.allclose(outs["sum"], outs["max"])
    assert not np.allclose(outs["sum"], outs["mean"])
