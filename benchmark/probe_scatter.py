"""Focused TPU probes: scatter-vs-gather recombination + take health +
segment_matmul tile overhead. ~8 compiles, persistent-cached."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgsparse_tpu.utils.cache import enable

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def dev_time(fn, x, iters=50):
    @jax.jit
    def timed(s):
        def body(i, s):
            out = fn(x * s)
            return 1.0 + 0.0 * jnp.sum(out)
        return jax.lax.fori_loop(0, iters, body, s)

    jax.block_until_ready(timed(jnp.float32(1.0)))
    t0 = time.perf_counter()
    jax.block_until_ready(timed(jnp.float32(1.0)))
    return (time.perf_counter() - t0) / iters


def main():
    m, n = 62586, 62586
    rng = np.random.default_rng(0)

    # [B] take health check
    b32 = jnp.asarray(rng.standard_normal((n, 32)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, 151700).astype(np.int32))
    dt = dev_time(lambda x: jnp.take(x, idx, axis=0), b32)
    print(f"[B] take 151.7K rows F=32: {dt*1e6:.1f} us "
          f"({dt/151700*1e9:.2f} ns/row)", flush=True)

    # [C] recombination: 16.4K-row unique scatter vs 62.6K-row gather
    nn = 16387
    rows = np.sort(rng.choice(m, nn, replace=False)).astype(np.int32)
    rows_j = jnp.asarray(rows)
    src = jnp.asarray(rng.standard_normal((nn, 32)).astype(np.float32))
    dt = dev_time(lambda x: jnp.zeros((m, 32), jnp.float32).at[rows_j].set(
        x, unique_indices=True, mode="promise_in_bounds"), src)
    print(f"[C] scatter 16.4K sorted unique rows -> [62.6K,32]: "
          f"{dt*1e6:.1f} us", flush=True)
    inv = np.full(m, nn, np.int32)
    inv[rows] = np.arange(nn, dtype=np.int32)
    inv_j = jnp.asarray(inv)
    dt = dev_time(lambda x: jnp.take(
        jnp.concatenate([x, jnp.zeros((1, 32), jnp.float32)]), inv_j,
        axis=0), src)
    print(f"[C] gather 62.6K rows (sentinel concat):        {dt*1e6:.1f} us",
          flush=True)
    # unsorted scatter (bucket order isn't globally sorted)
    perm = rng.permutation(nn)
    rows_u = jnp.asarray(rows[perm])
    dt = dev_time(lambda x: jnp.zeros((m, 32), jnp.float32).at[rows_u].set(
        x, unique_indices=True, mode="promise_in_bounds"), src)
    print(f"[C] scatter 16.4K UNSORTED unique rows:         {dt*1e6:.1f} us",
          flush=True)

    # [D] segment_matmul tile overhead at E=128 vs 256, F_pad=128
    from dgsparse_tpu.kernels.pallas_spmm import segment_matmul

    for e, rbk in ((128, 128), (256, 128), (128, 256)):
        tiles = 147892 // e + 1
        lrow = jnp.asarray(rng.integers(0, rbk, tiles * e).astype(np.int32))
        tile_rb = jnp.asarray(
            np.sort(rng.integers(0, m // rbk, tiles)).astype(np.int32))
        contrib = jnp.asarray(
            rng.standard_normal((tiles * e, 128)).astype(np.float32))
        dt = dev_time(
            lambda x, lrow=lrow, tile_rb=tile_rb, tiles=tiles, e=e, rbk=rbk:
            segment_matmul(x, lrow, tile_rb, tiles, e, rbk, m), contrib)
        print(f"[D] segmm E={e} R={rbk} tiles={tiles}: {dt*1e6:.1f} us "
              f"({dt/tiles*1e9:.0f} ns/tile)", flush=True)


if __name__ == "__main__":
    main()
