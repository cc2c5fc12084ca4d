"""3D submanifold sparse convolution demo on a synthetic voxel cloud.

Mirror of the reference spconv test path (test/test_spconv.py) without the
pickled rulebook fixtures: build the rulebook live, run forward+backward,
time the fused conv.

Run: python examples/spconv_example.py [num_points] [c_in] [c_out]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    num_points = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    c_in = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    c_out = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    import jax
    import jax.numpy as jnp

    from dgsparse_tpu.ops.spconv import build_rulebook, spconv

    shape = (128, 128, 64)
    rng = np.random.default_rng(0)
    total = shape[0] * shape[1] * shape[2]
    flat = rng.choice(total, size=num_points, replace=False)
    x, r = np.divmod(flat, shape[1] * shape[2])
    y, z = np.divmod(r, shape[2])
    coords = np.stack([np.zeros_like(x), x, y, z], 1).astype(np.int32)

    t0 = time.perf_counter()
    plan, out_coords = build_rulebook(coords, kernel_size=3, stride=1,
                                      padding=1, spatial_shape=shape)
    print(f"rulebook: {time.perf_counter() - t0:.3f}s, "
          f"pairs={sum(plan.knnz)} over {plan.k_vol} offsets, "
          f"out={plan.num_out}")

    feats = jnp.asarray(rng.standard_normal((num_points, c_in))
                        .astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((plan.k_vol, c_in, c_out))
                         .astype(np.float32) * 0.05)

    fwd = jax.jit(lambda f, w: spconv(f, w, plan))
    out = fwd(feats, kernel)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = fwd(feats, kernel)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 20
    pairs = sum(plan.knnz) + num_points  # + center tap
    gflops = 2 * pairs * c_in * c_out / dt / 1e9
    print(f"forward: {dt * 1e3:.3f} ms, {gflops:.1f} GFLOP/s, "
          f"{num_points / dt / 1e6:.2f} Mvoxel/s "
          f"(backend={jax.default_backend()})")

    grad = jax.jit(jax.grad(lambda f, w: spconv(f, w, plan).sum(),
                            argnums=(0, 1)))
    gf, gw = grad(feats, kernel)
    jax.block_until_ready(gf)
    t0 = time.perf_counter()
    for _ in range(10):
        gf, gw = grad(feats, kernel)
    jax.block_until_ready(gf)
    print(f"forward+backward grads: {(time.perf_counter() - t0) / 10 * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
