"""Sparse 3D convolution layers over SparseConvTensor.

The reference exposes spconv only as a raw op (torch.ops.dgsparse_spconv,
src/spconv.cpp:74) with rulebooks passed by hand; these flax modules carry
the rulebook cache on the SparseConvTensor (the design the reference's
header comment sketches, src/spconv.cpp:11-17) and give a usable layer API:
SubMConv3d (submanifold, stride 1) and SparseConv3d (strided/downsampling).
"""

from typing import Any, Optional, Tuple, Union

import flax.linen as nn

import jax.numpy as jnp

from dgsparse_tpu.ops.spconv import SparseConvTensor, spconv


def _cast(features, w, b, compute_dtype):
    """bf16/fp16 compute mode (the reference ships fp16/tf32 spconv kernel
    variants, src/cuda/spconv_cuda.cu; on TPU the MXU accumulates in fp32
    either way, so casting inputs is the whole story)."""
    if compute_dtype is None:
        return features, w, b
    return (features.astype(compute_dtype), w.astype(compute_dtype),
            b.astype(compute_dtype))


class SubMConv3d(nn.Module):
    """Submanifold sparse conv: output sites == input sites."""

    out_channels: int
    kernel_size: Union[int, Tuple[int, int, int]] = 3
    compute_dtype: Optional[Any] = None   # e.g. jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, st: SparseConvTensor) -> SparseConvTensor:
        plan, _ = st.plan_for(self.kernel_size, 1,
                              (self.kernel_size // 2
                               if isinstance(self.kernel_size, int) else
                               tuple(k // 2 for k in self.kernel_size)))
        c_in = st.features.shape[-1]
        w = self.param(
            "kernel", nn.initializers.he_normal(),
            (plan.k_vol, c_in, self.out_channels), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,),
                       self.param_dtype)
        f, w, b = _cast(st.features, w, b, self.compute_dtype)
        out = spconv(f, w, plan) + b
        return st.replace(features=out)


class SparseConv3d(nn.Module):
    """Strided sparse conv (downsampling): generates new output sites."""

    out_channels: int
    kernel_size: Union[int, Tuple[int, int, int]] = 3
    stride: Union[int, Tuple[int, int, int]] = 2
    padding: Union[int, Tuple[int, int, int]] = 1
    compute_dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, st: SparseConvTensor) -> SparseConvTensor:
        plan, out_coords = st.plan_for(self.kernel_size, self.stride,
                                       self.padding)
        c_in = st.features.shape[-1]
        w = self.param(
            "kernel", nn.initializers.he_normal(),
            (plan.k_vol, c_in, self.out_channels), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,),
                       self.param_dtype)
        f, w, b = _cast(st.features, w, b, self.compute_dtype)
        out = spconv(f, w, plan) + b
        # true conv output extent (s + 2p - k)//stride + 1 — ceil division
        # undercounts when padding > kernel//2, masking valid sites in later
        # rulebooks
        from dgsparse_tpu.ops.spconv import _triple

        ks = _triple(self.kernel_size)
        srd = _triple(self.stride)
        pad = _triple(self.padding)
        new_shape = tuple(
            max((s + 2 * p - k) // v + 1, 1)
            for s, k, v, p in zip(st.spatial_shape, ks, srd, pad))
        new = SparseConvTensor(out, out_coords, new_shape)
        return new


class SparseInverseConv3d(nn.Module):
    """Transposed sparse conv: scatters coarse features back to the exact
    fine sites of a cached encoder plan (UNet decoder op; no reference
    equivalent). Pass the SparseConvTensor at the coarse level and the
    (kernel_size, stride, padding) of the encoder conv whose plan lives on
    `fine_st`."""

    out_channels: int
    compute_dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, coarse_features, fine_st: SparseConvTensor,
                 kernel_size=3, stride=2, padding=1) -> SparseConvTensor:
        from dgsparse_tpu.ops.spconv import inverse_plan

        fwd_plan, _ = fine_st.plan_for(kernel_size, stride, padding)
        key = ("inv", (kernel_size, stride, padding))
        if key not in fine_st._plans:
            fine_st._plans[key] = inverse_plan(fwd_plan)
        plan = fine_st._plans[key]
        c_in = coarse_features.shape[-1]
        w = self.param("kernel", nn.initializers.he_normal(),
                       (plan.k_vol, c_in, self.out_channels),
                       self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,),
                       self.param_dtype)
        f, w, b = _cast(coarse_features, w, b, self.compute_dtype)
        out = spconv(f, w, plan) + b
        return fine_st.replace(features=out)


class SparseConvBlock(nn.Module):
    """SubM conv -> layernorm -> relu, the standard point-cloud block."""

    out_channels: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, st: SparseConvTensor) -> SparseConvTensor:
        st = SubMConv3d(self.out_channels, self.kernel_size)(st)
        f = nn.LayerNorm()(st.features)
        return st.replace(features=nn.relu(f))
