"""Multi-chip GAT training over a device mesh (row-block sharded).

The attention softmax is fully local (edges live with their destination
shard); the only collectives are all_gathers of projected features over
the graph axis. Run on CPU with virtual devices:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/train_gat_sharded.py --shards 8
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=512)
    ap.add_argument("--feat", type=int, default=32)
    ap.add_argument("--hidden", type=int, default=16)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--classes", type=int, default=7)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--shards", type=int, default=0,
                    help="0 = all available devices")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from dgsparse_tpu import SparseTensor
    from dgsparse_tpu.dist import shard_csr
    from dgsparse_tpu.dist import gat as dgat
    from dgsparse_tpu.utils.testing import random_csr

    d = args.shards or len(jax.devices())
    if len(jax.devices()) < d:
        raise SystemExit(f"need {d} devices, have {len(jax.devices())} "
                         "(set XLA_FLAGS=--xla_force_host_platform_"
                         "device_count=N)")
    mesh = Mesh(np.array(jax.devices()[:d]), ("graph",))

    m = args.nodes
    rowptr, col, _ = random_csr(m, m, avg_degree=8.0, seed=0,
                                with_empty_rows=False)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col), None,
                               sparse_sizes=(m, m))
    adj = shard_csr(sp, d)

    rng = np.random.default_rng(1)
    m_pad = adj.num_shards * adj.rows_per_shard
    xp = np.zeros((m_pad, args.feat), np.float32)
    xp[:m] = rng.standard_normal((m, args.feat))
    yp = np.full((m_pad,), -1, np.int32)
    yp[:m] = rng.integers(0, args.classes, m)
    mask = (yp >= 0).astype(np.float32)
    row = NamedSharding(mesh, P("graph"))
    xd = jax.device_put(jnp.asarray(xp), row)
    yd = jax.device_put(jnp.asarray(yp), row)
    md = jax.device_put(jnp.asarray(mask), row)

    params = dgat.init_params(jax.random.key(0), args.feat, args.hidden,
                              args.classes, args.heads)
    step = dgat.make_train_step(mesh, adj, args.heads, lr=2e-2)

    params, loss0 = step(params, xd, yd, md)
    jax.block_until_ready(loss0)
    t0 = time.perf_counter()
    for _ in range(args.epochs):
        params, loss = step(params, xd, yd, md)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / args.epochs
    print(f"backend={jax.default_backend()} shards={d} "
          f"heads={args.heads}: {dt * 1e3:.3f} ms/epoch, "
          f"loss {float(loss0):.4f} -> {float(loss):.4f}")


if __name__ == "__main__":
    main()
