"""VERDICT r3 #1: can a Pallas kernel whose dense-operand BlockSpec
index_map is driven by prefetched column indices (PrefetchScalarGridSpec)
beat the XLA gather + K-sum pipeline on the p2p headline?

The mechanism under test is the TPU analog of the reference's row-caching
staging trick (src/ge-spmm/csrspmm_rowcaching.cu:50-71): stage the needed
B rows close to compute while the previous group multiplies. On TPU the
only index-driven staging primitives are (a) the BlockSpec index_map
pipeline (one block DMA per operand per grid step) and (b) in-kernel
make_async_copy. Both issue ONE DMA descriptor per gathered row; XLA's
gather is a hardware-assisted loop that issues rows at ~1.6-4.8 ns/row.

Variants measured at headline scale (p2p's 152K slots, F=32 lane-packed):

  A   fused index-map kernel, grid = tiles*k2, R=8 row-DMAs/step
  A2  fused index-map kernel, grid = tiles, R*k2=32 row-DMAs/step
  B   XLA gather -> ONE Pallas pass (w-mul + K-sum + g-fold fused)
  B2  XLA gather -> XLA mul/sum with plan-time pre-expanded 128-lane
      weights (kills the runtime jnp.repeat of _gather_ksum_packed)
  cur the current packed pipeline (_gather_ksum_packed)

plus the two floors (bare per-grid-step cost, raw XLA gather).

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


# ---------------------------------------------------------------- variant A
def _fused_kernel(k2: int, cols_ref, w_ref, *refs):
    """refs = (b_0..b_{R-1}, out_ref). Step t covers slot j = t % k2 of
    output tile i = t // k2: out[i*R+r] += w[i*R+r, j] * B[cols[i*R+r, j]]
    where each b_r block was DMA'd by the index_map from the prefetched
    cols. Output block revisits accumulate in VMEM."""
    bs = refs[:R]
    out_ref = refs[R]
    t = pl.program_id(0)
    j = jax.lax.rem(t, k2)
    i = jax.lax.div(t, k2)
    rows = jnp.concatenate([b[0] for b in bs], axis=0)         # [R, 128]
    wcol = jnp.stack([w_ref[i * R + r, j] for r in range(R)])  # [R]
    partial = rows * wcol[:, None]

    @pl.when(j == 0)
    def _():
        out_ref[:] = partial

    @pl.when(j != 0)
    def _():
        out_ref[:] = out_ref[:] + partial


def fused_ell_ksum(cols, w, dense3, rb: int, k2: int):
    """[rb, k2] ELL K-sum with index-map-gathered B rows. dense3 is
    [N, 1, 128] (f padded to full lanes; middle singleton so the (1,1,128)
    block satisfies Mosaic's trailing-dims rule)."""
    f_pad = dense3.shape[-1]
    n_tiles = rb // R
    assert rb % R == 0

    def b_spec(r):
        return pl.BlockSpec(
            (1, 1, f_pad),
            lambda t, cols_r, w_r, r=r: (
                cols_r[jax.lax.div(t, k2) * R + r, jax.lax.rem(t, k2)],
                0, 0),
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
    )(cols, w, *([dense3] * R))


# --------------------------------------------------------------- variant A2
def _fused_kernel2(k2: int, cols_ref, w_ref, *refs):
    """refs = (b_{r,j} for r<R for j<k2, out). Step t = tile i: one shot,
    out[i*R+r] = sum_j w[i*R+r, j] * B[cols[i*R+r, j]]."""
    n = R * k2
    bs = refs[:n]
    out_ref = refs[n]
    i = pl.program_id(0)
    acc = []
    for r in range(R):
        row = bs[r * k2][0] * w_ref[i * R + r, 0]
        for j in range(1, k2):
            row = row + bs[r * k2 + j][0] * w_ref[i * R + r, j]
        acc.append(row)
    out_ref[:] = jnp.concatenate(acc, axis=0)


def fused_ell_ksum2(cols, w, dense3, rb: int, k2: int):
    f_pad = dense3.shape[-1]
    n_tiles = rb // R
    assert rb % R == 0

    def b_spec(r, j):
        return pl.BlockSpec(
            (1, 1, f_pad),
            lambda t, cols_r, w_r, r=r, j=j: (cols_r[t * R + r, j], 0, 0),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[b_spec(r, j) for r in range(R) for j in range(k2)],
        out_specs=pl.BlockSpec(
            (R, f_pad), lambda t, cols_r, w_r: (t, 0),
            memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_fused_kernel2, k2),
        out_shape=jax.ShapeDtypeStruct((rb, f_pad), jnp.float32),
        grid_spec=grid_spec,
    )(cols, w, *([dense3] * (R * k2)))


# ---------------------------------------------------------------- variant B
def _postgather_kernel(g: int, f: int, kg: int, x_ref, w_ref, out_ref):
    """x [RT, kg, 128] gathered+packed block, w [RT, kg, 128] pre-expanded
    weights. out[RT, f] = fold_g(sum_kg(x * w))."""
    x = x_ref[:] * w_ref[:]
    acc = x[:, 0] if kg == 1 else jnp.sum(x, axis=1)
    folded = acc[:, :f]
    for gg in range(1, g):
        folded = folded + acc[:, gg * f:(gg + 1) * f]
    out_ref[:] = folded


def postgather_fused(gathered, wp, rb: int, f: int, rt: int = 512):
    """gathered, wp: [rb, kg, 128]. One Pallas pass for mul+Ksum+fold."""
    kg = gathered.shape[1]
    g = 128 // f
    rt = min(rt, rb)
    assert rb % rt == 0
    return pl.pallas_call(
        functools.partial(_postgather_kernel, g, f, kg),
        out_shape=jax.ShapeDtypeStruct((rb, f), jnp.float32),
        grid=(rb // rt,),
        in_specs=[pl.BlockSpec((rt, kg, 128), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rt, kg, 128), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rt, f), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
    )(gathered, wp)


def variant_b(dense, cols, wp, rb, k2, f):
    g = 128 // f
    gathered = jnp.take(dense, cols.reshape(-1), axis=0)
    gp = gathered.reshape(rb, k2 // g, g * f)
    return postgather_fused(gp, wp, rb, f)


# --------------------------------------------------------------- variant B2
def variant_b2(dense, cols, wp, rb, k2, f):
    """XLA-only; wp [rb, kg, 128] is a PLAN-TIME constant (no repeat)."""
    g = 128 // f
    gathered = jnp.take(dense, cols.reshape(-1), axis=0)
    gp = gathered.reshape(rb, k2 // g, g * f)
    acc = (wp * gp).sum(axis=1, dtype=jnp.float32)
    return acc.reshape(rb, g, f).sum(axis=1)


# ------------------------------------------------------------------- floors
def _noop_kernel(in_ref, out_ref):
    out_ref[:] = in_ref[:] * 2.0


def per_step_floor(n_steps: int):
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
    g = 128 // feat
    kg = k2 // g
    rng = np.random.default_rng(0)
    cols = jnp.asarray(rng.integers(0, n, size=(rb, k2)).astype(np.int32))
    w = jnp.asarray(rng.standard_normal((rb, k2)).astype(np.float32))
    dense = jnp.asarray(rng.standard_normal((n, feat)).astype(np.float32))
    dense_pad = jnp.pad(dense, ((0, 0), (0, 128 - feat)))
    dense3 = dense_pad.reshape(n, 1, 128)
    # plan-time pre-expanded packed weights [rb, kg, 128]
    wp = jnp.repeat(w.reshape(rb, kg, g), feat, axis=2)
    slots = rb * k2
    log(f"slots={slots} rb={rb} k2={k2} kg={kg} feat={feat} "
        f"(padded to 128)")

    def t(fn, args, label):
        dt = time_pytree_2pt(fn, args, iters=(20, 100), repeats=3)
        log(f"  [{label:28s}] {dt*1e6:9.1f} us  "
            f"({dt*1e9/slots:6.2f} ns/slot)")
        return dt

    # 0. bare grid-step floors at both fused step counts
    for n_steps in ((rb // R) * k2, rb // R):
        dt0 = time_pytree_2pt(lambda _: per_step_floor(n_steps),
                              (jnp.float32(1.0),), iters=(20, 100),
                              repeats=3)
        log(f"  [{'per-step floor':28s}] {dt0*1e6:9.1f} us  "
            f"({dt0*1e9/n_steps:6.2f} ns/step, {n_steps} steps)")

    # 1. XLA gather floor (the primitive the fused kernel must beat)
    t(lambda x, c: jnp.take(x, c.reshape(-1), axis=0).sum() * 1e-30
      + jnp.float32(0),
      (dense, cols), "xla gather floor")

    # 2. current packed pipeline shape: gather + packed w-mul K-sum
    from dgsparse_tpu.kernels.pallas_spmm import _gather_ksum_packed
    t(lambda x, c, ww: _gather_ksum_packed(x, c, ww, rb, k2,
                                           jnp.float32).sum() * 1e-30
      + jnp.float32(0),
      (dense, cols, w), "cur: xla packed gather+ksum")

    # 3. variant B2: gather + mul/sum with pre-expanded weights
    t(lambda x, c, ww: variant_b2(x, c, ww, rb, k2, feat).sum() * 1e-30
      + jnp.float32(0),
      (dense, cols, wp), "B2: pre-expanded wp (XLA)")

    # 4. variant B: gather + fused Pallas post-pass
    t(lambda x, c, ww: variant_b(x, c, ww, rb, k2, feat).sum() * 1e-30
      + jnp.float32(0),
      (dense, cols, wp), "B: gather + pallas postpass")

    # correctness spot checks vs the unpacked reference
    ref = (jnp.take(dense, cols.reshape(-1), axis=0)
           .reshape(rb, k2, feat) * w[:, :, None]).sum(axis=1)
    got_b = variant_b(dense, cols, wp, rb, k2, feat)
    got_b2 = variant_b2(dense, cols, wp, rb, k2, feat)
    log(f"  B  max|err| = {float(jnp.max(jnp.abs(ref - got_b))):.2e}")
    log(f"  B2 max|err| = {float(jnp.max(jnp.abs(ref - got_b2))):.2e}")

    # 5. variant A/A2: the index-map DMA-gather kernels
    t(lambda x, c, ww: fused_ell_ksum(c, ww, x, rb, k2).sum() * 1e-30
      + jnp.float32(0),
      (dense3, cols, w), "A: index-map fused kernel")
    got_a = fused_ell_ksum(cols, w, dense3, rb, k2)[:, :feat]
    log(f"  A  max|err| = {float(jnp.max(jnp.abs(ref - got_a))):.2e}")

    t(lambda x, c, ww: fused_ell_ksum2(c, ww, x, rb, k2).sum() * 1e-30
      + jnp.float32(0),
      (dense3, cols, w), "A2: index-map 1-shot kernel")
    got_a2 = fused_ell_ksum2(cols, w, dense3, rb, k2)[:, :feat]
    log(f"  A2 max|err| = {float(jnp.max(jnp.abs(ref - got_a2))):.2e}")


if __name__ == "__main__":
    main()
