"""Probe: K-axis weighted-sum lowering variants for the bucketed-ELL
consumer (the +315 us on p2p attributed by probe_p2p.py).

All variants compute out[m,f] = sum_k w[m,k] * dense[cols[m,k], f] per
bucket; only the contraction expression differs.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgsparse_tpu.utils.cache import enable

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    feat = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    from dgsparse_tpu.core.planner import build_bucketed_ell_plan
    from dgsparse_tpu.utils.bench import time_pytree_2pt
    from dgsparse_tpu.utils.testing import load_mtx

    rowptr, col, vals, (m, n) = load_mtx(
        "/root/reference/example/data/p2p-Gnutella31.mtx")
    plan = build_bucketed_ell_plan(rowptr, col, n)
    tot = sum(rb * k for rb, k in zip(plan.rbs, plan.ks))
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((n, feat)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(tot).astype(np.float32))
    log(f"buckets rbs={plan.rbs} ks={plan.ks}")

    def run(kind):
        def f(x, p, w):
            acc = jnp.float32(0)
            o2 = 0
            for cols_b, _, _, _, k in p.bucket_views():
                rb = cols_b.shape[0]
                g = jnp.take(x, cols_b.reshape(-1),
                             axis=0).reshape(rb, k, feat)
                ww = jax.lax.slice(w, (o2,), (o2 + rb * k,)).reshape(rb, k)
                o2 += rb * k
                if kind == "einsum":
                    o = jnp.einsum("mk,mkf->mf", ww, g,
                                   preferred_element_type=jnp.float32)
                elif kind == "mul_sum":
                    o = (ww[:, :, None] * g).sum(axis=1)
                elif kind == "dot_general":
                    o = jax.lax.dot_general(
                        ww, g, (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                elif kind == "flat_mul_seg":
                    # multiply on the FLAT [rb*k, f] layout (fusible with
                    # the gather), then reshape-sum
                    gf = jnp.take(x, cols_b.reshape(-1), axis=0)
                    wf = jax.lax.slice(w, (o2 - rb * k,), (o2,))
                    o = (gf * wf[:, None]).reshape(rb, k, feat).sum(axis=1)
                acc += jnp.sum(o) * 1e-30
            return acc

        return f

    for kind in ("einsum", "mul_sum", "dot_general", "flat_mul_seg"):
        dt = time_pytree_2pt(run(kind), (b, plan, w), iters=(50, 250),
                             repeats=3)
        log(f"  [{kind:14s}] {dt*1e6:8.1f} us")


if __name__ == "__main__":
    main()
