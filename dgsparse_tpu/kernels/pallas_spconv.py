"""Fused Pallas spconv kernels: weight-stationary gather-GEMM-scatter.

TPU counterpart of the reference's fused FGMS kernel family
(include/cuda/spconv.cuh:1097-1248 tf32 wmma path, :1406-1875 fp16
tensor-core paths): one kernel pass over the rulebook pair stream that
multiplies gathered input rows against the full weight stack and
accumulates output row blocks in VMEM — no scatter, no stream
materialization in HBM.

Where the reference orders pairs by kernel offset (qkpos quantization →
one weight slice per block) and scatters with atomicAdd, the TPU
formulation inverts the layout: pairs are ordered by OUTPUT row block
(the ESC plan), so the scatter becomes a VMEM-resident accumulation —
and the per-pair weight selection moves INTO the matmul:

    H       = X_tile @ W_flat           [E, k_vol*c_out]   (all offsets)
    G       = H ⊙ (j // c_out == widx)  mask by each pair's offset
    contrib = G @ S                     [E, c_out], S[j,o] = (j%c_out==o)
    out    += onehot(lrow) @ contrib    [R, c_out]

Computing every offset's projection for every pair costs k_vol× the
minimal FLOPs — the classic TPU trade: the MXU is idle while HBM random
access is the bottleneck, so spending "free" FLOPs to remove one whole
gather of the pair stream (and its HBM round-trip) is a net win. The
mask and S selection are exact (one-hots in bf16); fp32 inputs use a
hi/lo split (see _mm) for ~fp32 accuracy.

The same kernel shape serves the backward:
- dX: pairs re-ordered by INPUT row block, gather g rows, weights W^T.
- dW: one accumulator block [k_vol*c_in, c_out] revisited by every tile;
  Xhat = (X replicated per offset, masked) contracted against the
  gathered cotangent rows over the pair axis (pl.dot trans_a).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = bool(value)


def _exact_dot(a, b):
    """Plain fp32 dot at Precision.HIGHEST — used under interpret mode.

    Interpreted kernels lower to regular XLA (not Mosaic), whose
    algebraic simplifier reassociates dot(a,hi)+dot(a,lo) ->
    dot(a, hi+lo) with the add in bf16, silently deleting the lo half
    of the split trick (same failure as pallas_spmm._split_onehot_dot;
    observed as ~1e-2 rel error in test_spconv_fused on TPU,
    2026-08-20). Interpret is the testing mode; exactness > speed."""
    return jnp.dot(a.astype(jnp.float32), b.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)


def _mm(a, b, exact: bool):
    """a @ b on the MXU. exact=True: hi/lo split of BOTH operands
    (3 bf16 passes, ~fp32-accurate); exact=False: one bf16 pass."""
    if not exact:
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    if _INTERPRET:
        return _exact_dot(a, b)
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jnp.dot(ah, bh, preferred_element_type=jnp.float32)
            + jnp.dot(ah, bl, preferred_element_type=jnp.float32)
            + jnp.dot(al, bh, preferred_element_type=jnp.float32))


def _mm_onehot(a, onehot_bf16, exact: bool):
    """a @ onehot where the rhs is exact in bf16: 2 passes when exact."""
    if not exact:
        return jnp.dot(a.astype(jnp.bfloat16), onehot_bf16,
                       preferred_element_type=jnp.float32)
    if _INTERPRET:
        return _exact_dot(a, onehot_bf16)
    a = a.astype(jnp.float32)
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jnp.dot(ah, onehot_bf16, preferred_element_type=jnp.float32)
            + jnp.dot(al, onehot_bf16, preferred_element_type=jnp.float32))


def _fused_pair_kernel(row_block: int, edge_tile: int, c_sel: int,
                       exact: bool,
                       tile_rb_ref, widx_ref, lrow_ref, x_ref, w_ref, s_ref,
                       out_ref):
    """One pair tile: project against the full weight stack, select each
    pair's offset slice, accumulate into the owning output row block."""
    t = pl.program_id(0)
    widx = widx_ref[0, 0, :]                                  # [E]
    lr = lrow_ref[0, 0, :]                                    # [E]

    h = _mm(x_ref[:], w_ref[:], exact)                        # [E, KC]
    kc = h.shape[-1]
    jj = jax.lax.broadcasted_iota(jnp.int32, (edge_tile, kc), 1)
    sel = (jj // c_sel) == widx[:, None]
    g = jnp.where(sel, h, 0.0)
    contrib = _mm_onehot(g, s_ref[:], exact)                  # [E, c_sel]

    rows = jax.lax.broadcasted_iota(jnp.int32, (row_block, edge_tile), 0)
    one = (rows == lr[None, :]).astype(jnp.bfloat16)          # [R, E]
    if exact:
        partial = _split_scatter(one, contrib)
    else:
        partial = jnp.dot(one, contrib.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    prev = tile_rb_ref[jnp.maximum(t - 1, 0)]
    is_first = jnp.logical_or(t == 0, prev != tile_rb_ref[t])

    @pl.when(is_first)
    def _():
        out_ref[:] = partial.astype(out_ref.dtype)

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[:] = (out_ref[:].astype(jnp.float32) + partial).astype(
            out_ref.dtype)


def _split_scatter(onehot_bf16, x):
    """onehot @ x with exact one-hot lhs: hi/lo split of x (2 passes)."""
    if _INTERPRET:
        return _exact_dot(onehot_bf16, x)
    x = x.astype(jnp.float32)
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jnp.dot(onehot_bf16, hi, preferred_element_type=jnp.float32)
            + jnp.dot(onehot_bf16, lo, preferred_element_type=jnp.float32))


def fused_pair_matmul(
    x_slot: jax.Array,        # [S, c_in] gathered rows (0 on padding slots)
    widx_slot: jax.Array,     # [S] kernel-offset id per slot (0 padding)
    lrow: jax.Array,          # [S] local out row in block (row_block pad)
    tile_rb: jax.Array,       # [T] owning out row block per tile
    w_flat: jax.Array,        # [c_in, k_vol*c_out]; w_flat[i, k*c_out+o]=W[k,i,o]
    num_rows: int,
    c_out: int,
    edge_tile: int,
    row_block: int,
    exact: bool = True,
) -> jax.Array:
    """Run the fused pair-stream kernel. Returns [num_rows, c_out] fp32."""
    s = x_slot.shape[0]
    t = s // edge_tile
    kc = w_flat.shape[-1]
    k_vol = kc // c_out
    # selection one-hot S[j, o] = (j % c_out == o), exact in bf16
    sel = (jnp.arange(kc, dtype=jnp.int32)[:, None] % c_out
           == jnp.arange(c_out, dtype=jnp.int32)[None, :]).astype(
               jnp.bfloat16)
    kernel = functools.partial(_fused_pair_kernel, row_block, edge_tile,
                               c_out, exact)
    c_in = x_slot.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, 1, edge_tile), lambda i, rb: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, edge_tile), lambda i, rb: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((edge_tile, c_in), lambda i, rb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, kc), lambda i, rb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kc, c_out), lambda i, rb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_block, c_out), lambda i, rb: (rb[i], 0),
                               memory_space=pltpu.VMEM),
    )
    passes = 3 if exact else 1
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((num_rows, c_out), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * t * edge_tile * kc * (c_in + 1 + row_block // k_vol)
            * passes,
            bytes_accessed=x_slot.size * 4 + num_rows * c_out * 4,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(tile_rb,
      widx_slot.reshape(t, 1, edge_tile),
      lrow.reshape(t, 1, edge_tile),
      x_slot, w_flat, sel)


def _dw_kernel(edge_tile: int, c_in: int, exact: bool,
               widx_ref, x_ref, g_ref, rep_ref, out_ref):
    """Accumulate dW_flat[k*c_in+i, o] += sum_pairs x[i]·g[o] of offset k.

    Xrep = X @ Rep replicates each input row across all offset slices
    (Rep[i, k*c_in+i] = 1, exact bf16); the offset mask zeroes all but the
    pair's own slice; pl.dot(trans_a) contracts the pair axis."""
    t = pl.program_id(0)
    widx = widx_ref[0, 0, :]                                  # [E]
    xrep = _mm_onehot(x_ref[:], rep_ref[:], exact)            # [E, K*Ci]
    kci = xrep.shape[-1]
    jj = jax.lax.broadcasted_iota(jnp.int32, (edge_tile, kci), 1)
    sel = (jj // c_in) == widx[:, None]
    xhat = jnp.where(sel, xrep, 0.0)
    if exact and _INTERPRET:
        # see _exact_dot: interpreted kernels lower through the XLA
        # simplifier, which re-folds the hi/lo split in bf16
        part = jax.lax.dot_general(
            xhat.astype(jnp.float32), g_ref[:].astype(jnp.float32),
            (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    elif exact:
        xh = xhat.astype(jnp.bfloat16)
        xl = (xhat - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        g32 = g_ref[:].astype(jnp.float32)
        gh = g32.astype(jnp.bfloat16)
        gl = (g32 - gh.astype(jnp.float32)).astype(jnp.bfloat16)
        part = (jax.lax.dot_general(
            xh, gh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + jax.lax.dot_general(
                xh, gl, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(
                xl, gh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    else:
        part = jax.lax.dot_general(
            xhat.astype(jnp.bfloat16), g_ref[:].astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(t == 0)
    def _():
        out_ref[:] = part

    @pl.when(t != 0)
    def _():
        out_ref[:] = out_ref[:] + part


def fused_pair_dw(
    x_slot: jax.Array,        # [S, c_in] gathered inputs (0 padding)
    g_slot: jax.Array,        # [S, c_out] gathered cotangents (0 padding)
    widx_slot: jax.Array,     # [S]
    k_vol: int,
    edge_tile: int,
    exact: bool = True,
) -> jax.Array:
    """Returns dW as [k_vol, c_in, c_out] fp32 in ONE pass over the pair
    stream (the I_transpose kernels of the reference,
    include/cuda/spconv.cuh:2138-2342)."""
    s, c_in = x_slot.shape
    c_out = g_slot.shape[-1]
    t = s // edge_tile
    kci = k_vol * c_in
    rep = (jnp.arange(kci, dtype=jnp.int32)[None, :] % c_in
           == jnp.arange(c_in, dtype=jnp.int32)[:, None]).astype(
               jnp.bfloat16)                                  # [c_in, K*Ci]
    kernel = functools.partial(_dw_kernel, edge_tile, c_in, exact)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, 1, edge_tile), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((edge_tile, c_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((edge_tile, c_out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, kci), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kci, c_out), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    dw_flat = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((kci, c_out), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * t * edge_tile * kci * (c_in + c_out)
            * (3 if exact else 1),
            bytes_accessed=(x_slot.size + g_slot.size) * 4
            + kci * c_out * 4,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(widx_slot.reshape(t, 1, edge_tile), x_slot, g_slot, rep)
    return dw_flat.reshape(k_vol, c_in, c_out)
