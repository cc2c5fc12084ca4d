"""Multi-chip row-sharded GCN training over a device mesh.

The distributed component the reference lacks entirely (SURVEY.md §2.8):
adjacency row-block sharded, node data sharded by node, parameters
replicated; all_gather over ICI forward, psum_scatter backward.

Run on N devices (or N virtual CPU devices):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/train_gcn_sharded.py --devices 8
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0)
    ap.add_argument("--nodes", type=int, default=4096)
    ap.add_argument("--feat", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--classes", type=int, default=7)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh

    from dgsparse_tpu import SparseTensor
    from dgsparse_tpu.dist import gcn as dist_gcn
    from dgsparse_tpu.utils.testing import random_csr

    n_dev = args.devices or len(jax.devices())
    devices = jax.devices()[:n_dev]
    mesh = Mesh(np.array(devices), ("graph",))
    print(f"mesh: {n_dev} x {devices[0].platform}")

    rowptr, col, vals = random_csr(args.nodes, args.nodes, avg_degree=8.0,
                                   seed=0, with_empty_rows=False)
    sp = SparseTensor.from_csr(
        np.asarray(rowptr), np.asarray(col), np.abs(vals),
        sparse_sizes=(args.nodes, args.nodes))
    rng = np.random.default_rng(1)
    x = rng.standard_normal((args.nodes, args.feat)).astype(np.float32)
    y = rng.integers(0, args.classes, args.nodes).astype(np.int32)

    adj, x_d, y_d, mask_d = dist_gcn.prepare_inputs(mesh, sp, x, y, n_dev)
    params = dist_gcn.init_params(jax.random.key(0), args.feat, args.hidden,
                                  args.classes)
    step = dist_gcn.make_train_step(mesh, adj, lr=1e-2)

    params, loss = step(params, x_d, y_d, mask_d)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(args.steps):
        params, loss = step(params, x_d, y_d, mask_d)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / args.steps
    print(f"{dt * 1e3:.3f} ms/step, final loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
