"""VERDICT r3 #1: can a Pallas kernel whose dense-operand BlockSpec
index_map is driven by prefetched column indices (PrefetchScalarGridSpec)
beat the XLA gather + K-sum pipeline on the p2p headline?

The mechanism under test is the TPU analog of the reference's row-caching
staging trick (src/ge-spmm/csrspmm_rowcaching.cu:50-71): stage the needed
B rows close to compute while the previous group multiplies. On TPU the
only index-driven staging primitives are (a) the BlockSpec index_map
pipeline (one block DMA per operand per grid step) and (b) in-kernel
make_async_copy. Both issue ONE DMA descriptor per gathered row; XLA's
gather is a hardware-assisted loop that issues rows at ~1.9-4.8 ns/row.
This probe measures the actual per-row cost of (a) at headline scale,
plus the bare per-grid-step floor, against the XLA gather floor and the
full current pipeline.

Run: python benchmark/probe_fused_gather.py [F=32]
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgsparse_tpu.utils.cache import enable

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


R = 8  # output rows per grid step (8 B-row DMAs per step)


def _fused_kernel(k2: int, cols_ref, w_ref, *refs):
    """refs = (b_0..b_{R-1}, out_ref). Step t covers slot j = t % k2 of
    output tile i = t // k2: out[i*R+r] += w[i*R+r, j] * B[cols[i*R+r, j]]
    where each b_r block was DMA'd by the index_map from the prefetched
    cols. Output block revisits accumulate in VMEM (same contract as
    segment_matmul)."""
    bs = refs[:R]
    out_ref = refs[R]
    t = pl.program_id(0)
    j = jax.lax.rem(t, k2)
    i = jax.lax.div(t, k2)
    rows = jnp.concatenate([b[:] for b in bs], axis=0)        # [R, 128]
    wcol = jnp.stack([w_ref[i * R + r, j] for r in range(R)])  # [R]
    partial = rows * wcol[:, None]

    @pl.when(j == 0)
    def _():
        out_ref[:] = partial

    @pl.when(j != 0)
    def _():
        out_ref[:] = out_ref[:] + partial


def fused_ell_ksum(cols, w, dense_pad, rb: int, k2: int):
    """[rb, k2] ELL K-sum with index-map-gathered B rows. dense_pad is
    [N, 128] (f padded to full lanes)."""
    f_pad = dense_pad.shape[-1]
    n_tiles = rb // R
    assert rb % R == 0

    def b_spec(r):
        return pl.BlockSpec(
            (1, f_pad),
            lambda t, cols_r, w_r, r=r: (
                cols_r[jax.lax.div(t, k2) * R + r, jax.lax.rem(t, k2)], 0),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles * k2,),
        in_specs=[b_spec(r) for r in range(R)],
        out_specs=pl.BlockSpec(
            (R, f_pad), lambda t, cols_r, w_r: (jax.lax.div(t, k2), 0),
            memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_fused_kernel, k2),
        out_shape=jax.ShapeDtypeStruct((rb, f_pad), jnp.float32),
        grid_spec=grid_spec,
    )(cols, w, *([dense_pad] * R))


def _noop_kernel(in_ref, out_ref):
    out_ref[:] = in_ref[:] * 2.0


def per_step_floor(n_steps: int):
    """Bare Pallas per-grid-step cost: trivial kernel, constant blocks."""
    x = jnp.ones((8, 128), jnp.float32)
    return pl.pallas_call(
        _noop_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        grid=(n_steps,),
        in_specs=[pl.BlockSpec((8, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
    )(x)


def main():
    feat = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    from dgsparse_tpu.utils.bench import time_pytree_2pt

    # Headline-scale single bucket: 152K slots (the p2p plan's total).
    rb, k2 = 38400, 4
    n = 62586
    rng = np.random.default_rng(0)
    cols = jnp.asarray(rng.integers(0, n, size=(rb, k2)).astype(np.int32))
    w = jnp.asarray(rng.standard_normal((rb, k2)).astype(np.float32))
    dense = jnp.asarray(rng.standard_normal((n, feat)).astype(np.float32))
    dense_pad = jnp.pad(dense, ((0, 0), (0, 128 - feat)))
    slots = rb * k2
    log(f"slots={slots} rb={rb} k2={k2} feat={feat} (padded to 128)")

    def t(fn, args, label):
        dt = time_pytree_2pt(fn, args, iters=(20, 100), repeats=3)
        log(f"  [{label:28s}] {dt*1e6:9.1f} us  "
            f"({dt*1e9/slots:6.2f} ns/slot)")
        return dt

    # 0. bare grid-step floor at the fused kernel's step count
    n_steps = (rb // R) * k2
    dt0 = time_pytree_2pt(lambda _: per_step_floor(n_steps),
                          (jnp.float32(1.0),), iters=(20, 100), repeats=3)
    log(f"  [{'per-step floor':28s}] {dt0*1e6:9.1f} us  "
        f"({dt0*1e9/n_steps:6.2f} ns/step, {n_steps} steps)")

    # 1. XLA gather floor (the primitive the fused kernel must beat)
    t(lambda x, c: jnp.take(x, c.reshape(-1), axis=0).sum() * 1e-30
      + jnp.float32(0),
      (dense, cols), "xla gather floor (f=32)")

    # 2. current packed pipeline shape: gather + packed w-mul K-sum
    from dgsparse_tpu.kernels.pallas_spmm import _gather_ksum_packed
    t(lambda x, c, ww: _gather_ksum_packed(x, c, ww, rb, k2,
                                           jnp.float32).sum() * 1e-30
      + jnp.float32(0),
      (dense, cols, w), "xla packed gather+ksum")

    # 3. the fused index-map kernel
    t(lambda x, c, ww: fused_ell_ksum(c, ww, x, rb, k2).sum() * 1e-30
      + jnp.float32(0),
      (dense_pad, cols, w), "fused index-map kernel")

    # correctness spot check
    ref = (jnp.take(dense_pad, cols.reshape(-1), axis=0)
           .reshape(rb, k2, 128) * w[:, :, None]).sum(axis=1)
    got = fused_ell_ksum(cols, w, dense_pad, rb, k2)
    err = float(jnp.max(jnp.abs(ref - got)))
    log(f"  fused kernel max|err| = {err:.2e}")


if __name__ == "__main__":
    main()
