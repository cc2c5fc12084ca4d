"""Sparse 3D UNet on a synthetic voxelized point cloud.

The reference ships MinkUNet/SemanticKITTI spconv fixtures
(example/data/sample-data) but no model; this demo builds a small UNet —
submanifold blocks, strided downsample, inverse-conv upsample with skip
connections — and runs a semantic-segmentation-style training step.

Run: python examples/pointcloud_unet.py [--points 20000]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=20000)
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    from dgsparse_tpu.nn import (SparseConv3d, SparseConvBlock,
                                 SparseInverseConv3d, SubMConv3d)
    from dgsparse_tpu.ops.spconv import SparseConvTensor

    shape = (128, 128, 32)
    rng = np.random.default_rng(0)
    total = shape[0] * shape[1] * shape[2]
    flat = rng.choice(total, size=min(args.points, total), replace=False)
    x_, r = np.divmod(flat, shape[1] * shape[2])
    y_, z_ = np.divmod(r, shape[2])
    coords = np.stack([np.zeros_like(x_), x_, y_, z_], 1).astype(np.int32)
    feats = jnp.asarray(rng.standard_normal((len(coords), 8))
                        .astype(np.float32))
    labels = jnp.asarray(rng.integers(0, args.classes, len(coords)))
    st = SparseConvTensor(feats, coords, shape)

    class UNet(nn.Module):
        classes: int

        @nn.compact
        def __call__(self, st):
            e1 = SparseConvBlock(32, name="enc1")(st)
            d1 = SparseConv3d(64, stride=2, name="down1")(e1)
            d1 = SparseConvBlock(64, name="enc2")(d1)
            u1 = SparseInverseConv3d(32, name="up1")(d1.features, e1)
            f = jnp.concatenate([u1.features, e1.features], -1)
            f = nn.Dense(self.classes, name="head")(f)
            return f

    t0 = time.perf_counter()
    model = UNet(args.classes)
    params = model.init(jax.random.key(0), st)
    print(f"init (rulebooks built once): {time.perf_counter() - t0:.2f}s")

    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def loss_fn(p, f):
        logits = model.apply(p, st.replace(features=f))
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    loss, g = grad_fn(params, feats)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        loss, g = grad_fn(params, feats)
        upd, opt = tx.update(g, opt)
        params = optax.apply_updates(params, upd)
    jax.block_until_ready(loss)
    print(f"backend={jax.default_backend()} points={len(coords)}: "
          f"{(time.perf_counter() - t0) / args.steps * 1e3:.2f} ms/step "
          f"(fwd+bwd+update), loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
