"""spconv throughput with honest (two-point on-device) timing.

Round-1 recorded 16.8 Mvox/s at 60K voxels via host-loop timing, which
folds the tunnel's fixed per-dispatch latency into every call. This
re-measures forward and forward+backward with the fixed cost cancelled
(reference perf tier: the FGMS fused kernels,
/root/reference/include/cuda/spconv.cuh:1097-1248).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgsparse_tpu.utils.cache import enable

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from dgsparse_tpu.ops.spconv import build_rulebook, spconv
    from dgsparse_tpu.utils.bench import time_pytree_2pt

    num_points = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    results = []
    for c_in, c_out in ((32, 32), (64, 64)):
        shape = (128, 128, 64)
        rng = np.random.default_rng(0)
        total = shape[0] * shape[1] * shape[2]
        flat = rng.choice(total, size=num_points, replace=False)
        x, r = np.divmod(flat, shape[1] * shape[2])
        y, z = np.divmod(r, shape[2])
        coords = np.stack([np.zeros_like(x), x, y, z], 1).astype(np.int32)
        t0 = time.perf_counter()
        plan, _ = build_rulebook(coords, kernel_size=3, stride=1, padding=1,
                                 spatial_shape=shape)
        print(f"rulebook {time.perf_counter()-t0:.2f}s "
              f"pairs={sum(plan.knnz)}", flush=True)

        feats = jnp.asarray(rng.standard_normal((num_points, c_in))
                            .astype(np.float32))
        kernel = jnp.asarray(rng.standard_normal((plan.k_vol, c_in, c_out))
                             .astype(np.float32) * 0.05)

        dt = time_pytree_2pt(lambda f, w: spconv(f, w, plan),
                             (feats, kernel), iters=(20, 100), repeats=3)
        mv = num_points / dt / 1e6
        print(f"c={c_in}->{c_out} fwd: {dt*1e3:.3f} ms = {mv:.1f} Mvox/s",
              flush=True)
        results.append({"c_in": c_in, "c_out": c_out, "fwd_ms":
                        round(dt * 1e3, 3), "mvox_s": round(mv, 1)})

        ct = jnp.asarray(rng.standard_normal(
            (plan.num_out, c_out)).astype(np.float32))

        def fwdbwd(f, w, ct_=ct):
            # nonlinear loss keeps the forward alive under grad (a vdot
            # cotangent lets XLA DCE the forward of the linear conv)
            def loss(f_, w_):
                out = spconv(f_, w_, plan)
                return jnp.vdot(out * out, ct_)

            return jax.value_and_grad(loss, argnums=(0, 1))(f, w)

        dt = time_pytree_2pt(fwdbwd, (feats, kernel), iters=(10, 50),
                             repeats=3)
        print(f"c={c_in}->{c_out} fwd+bwd: {dt*1e3:.3f} ms = "
              f"{num_points/dt/1e6:.1f} Mvox/s", flush=True)
        results[-1]["fwdbwd_ms"] = round(dt * 1e3, 3)

    with open("benchmark/results_spconv.json", "w") as f:
        json.dump(results, f, indent=1)
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
