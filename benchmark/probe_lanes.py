"""Lane-packing probe (p2p headline, F=32): is the ELL w-multiply +
K-sum pipeline paying ~4x for 32-lane minor dims, and does packing
g=128/F rows into one 128-lane group recover it?

Variants (all same FLOPs/bytes semantically, sized like p2p's ELL):
  a) [rb, k, 32]  w*gather multiply + K-sum (the current shape)
  b) [rb/4, k, 128] packed multiply + K-sum (the proposed layout)
  c) reshape cost [N, 32] -> [N/4, 128] alone
  d) random row gather [slots, 32] vs [slots/4, 128] table (gather side)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgsparse_tpu.utils.cache import enable

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from dgsparse_tpu.utils.bench import time_pytree_2pt

    rng = np.random.default_rng(0)
    rb, k, f = 62592, 8, 32          # ~p2p scale: 500K slots
    g = 128 // f
    dense_rows = 62586
    jax.device_get(jnp.zeros((8,), jnp.float32) + 1.0)

    w = jnp.asarray(rng.standard_normal((rb, k)).astype(np.float32))
    gat = jnp.asarray(rng.standard_normal((rb, k, f)).astype(np.float32))
    gat_p = jnp.asarray(
        rng.standard_normal((rb // g, k, g * f)).astype(np.float32))
    w_p = jnp.asarray(
        rng.standard_normal((rb // g, k, g)).astype(np.float32))

    def t(label, fn, args, iters=(20, 100)):
        dt = time_pytree_2pt(fn, args, iters=iters, repeats=3)
        log(f"  [{label:44s}] {dt*1e6:9.1f} us")
        return dt

    t("a) [rb,k,32] w*g + K-sum", lambda ww, gg: (
        ww[:, :, None] * gg).sum(axis=1, dtype=jnp.float32), (w, gat))
    t("b) [rb/4,k,128] packed w*g + K-sum", lambda ww, gg: (
        jnp.broadcast_to(ww[:, :, :, None], ww.shape + (f,)).reshape(
            gg.shape) * gg).sum(axis=1, dtype=jnp.float32), (w_p, gat_p))
    flat = jnp.asarray(rng.standard_normal((rb * k, f)).astype(np.float32))
    t("c) reshape [N,32]->[N/4,128] (+1 add)", lambda z: (
        z.reshape(-1, g * f) + 1.0), (flat,))

    table = jnp.asarray(
        rng.standard_normal((dense_rows, f)).astype(np.float32))
    table_p = jnp.asarray(
        rng.standard_normal((dense_rows // g, g * f)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, dense_rows, rb * k).astype(np.int32))
    idx_p = jnp.asarray(
        rng.integers(0, dense_rows // g, rb * k // g).astype(np.int32))
    t("d) gather [500K] rows of 32", lambda i: jnp.take(
        table, i, axis=0).sum(dtype=jnp.float32), (idx,))
    t("e) gather [125K] rows of 128", lambda i: jnp.take(
        table_p, i, axis=0).sum(dtype=jnp.float32), (idx_p,))


if __name__ == "__main__":
    main()
