"""GAT training demo: SDDMM-style edge scoring + edge_softmax + SpMM.

The natural demo of the edge_softmax op the reference declared but never
implemented (include/dgsparse.h:17).

Run: python examples/train_gat.py [--nodes 2708] [--heads 4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=2708)
    ap.add_argument("--feat", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=16)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--classes", type=int, default=7)
    ap.add_argument("--epochs", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from dgsparse_tpu.nn import GAT, get_gcn_dcsr_from_edge_index
    from dgsparse_tpu.utils.testing import random_csr

    rowptr, col, _ = random_csr(args.nodes, args.nodes, avg_degree=5.0,
                                seed=0, with_empty_rows=False)
    coo_row = np.repeat(np.arange(args.nodes, dtype=np.int32),
                        np.diff(rowptr))
    adj = get_gcn_dcsr_from_edge_index(np.stack([coo_row, col]), args.nodes)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((args.nodes, args.feat))
                    .astype(np.float32))
    y = jnp.asarray(rng.integers(0, args.classes, args.nodes))

    model = GAT(hidden_features=args.hidden, out_features=args.classes,
                num_heads=args.heads)
    params = model.init(jax.random.key(0), x, adj)
    tx = optax.adam(5e-3)
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

    params, opt_state, loss = step(params, opt_state)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(args.epochs):
        params, opt_state, loss = step(params, opt_state)
    jax.block_until_ready(loss)
    print(f"backend={jax.default_backend()} heads={args.heads}: "
          f"{(time.perf_counter() - t0) / args.epochs * 1e3:.3f} ms/epoch, "
          f"final loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
