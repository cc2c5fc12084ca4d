"""Inverse (transposed) sparse conv: adjoint identity + UNet roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np

import flax.linen as nn

from dgsparse_tpu.nn import SparseConv3d, SparseInverseConv3d, SubMConv3d
from dgsparse_tpu.ops.spconv import (SparseConvTensor, build_rulebook,
                                     inverse_plan, spconv)
from tests.test_spconv import random_cloud


def test_inverse_is_adjoint():
    """<spconv(x, W, P), y> == <x, spconv(y, W_mirror_T, inv(P))> — the
    transposed conv with mirrored+transposed weights is the exact adjoint."""
    shape = (12, 12, 8)
    coords = random_cloud(150, shape, 1, seed=3)
    rng = np.random.default_rng(4)
    c_in, c_out = 8, 16
    x = rng.standard_normal((len(coords), c_in)).astype(np.float32)
    w = rng.standard_normal((27, c_in, c_out)).astype(np.float32)

    plan, out_coords = build_rulebook(coords, 3, 2, 1, spatial_shape=shape)
    y = rng.standard_normal((plan.num_out, c_out)).astype(np.float32)

    lhs = float(jnp.vdot(spconv(jnp.asarray(x), jnp.asarray(w), plan),
                         jnp.asarray(y)))

    ip = inverse_plan(plan)
    # inverse uses mirrored offsets; adjoint weights = mirror-indexed W^T
    w_adj = np.transpose(w[::-1], (0, 2, 1)).copy()
    rhs = float(jnp.vdot(spconv(jnp.asarray(y), jnp.asarray(w_adj), ip),
                         jnp.asarray(x)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_inverse_restores_sites():
    shape = (12, 12, 8)
    coords = random_cloud(140, shape, 1, seed=5)
    plan, out_coords = build_rulebook(coords, 3, 2, 1, spatial_shape=shape)
    ip = inverse_plan(plan)
    assert ip.num_out == len(coords)
    assert ip.num_in == plan.num_out


class TinyUNet(nn.Module):
    @nn.compact
    def __call__(self, st):
        st1 = SubMConv3d(16, name="enc")(st)
        st2 = SparseConv3d(32, stride=2, name="down")(st1)
        up = SparseInverseConv3d(16, name="up")(st2.features, st1)
        # skip connection at identical fine sites
        return up.replace(features=up.features + st1.features)


def test_unet_roundtrip_trains():
    import optax

    shape = (12, 12, 8)
    coords = random_cloud(150, shape, 1, seed=7)
    rng = np.random.default_rng(8)
    feats = jnp.asarray(rng.standard_normal((len(coords), 8))
                        .astype(np.float32))
    st = SparseConvTensor(feats, coords, shape)
    model = TinyUNet()
    params = model.init(jax.random.key(0), st)
    out = model.apply(params, st)
    assert out.features.shape == (len(coords), 16)

    target = jnp.asarray(rng.standard_normal(out.features.shape)
                         .astype(np.float32))
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    def loss_fn(p, f):
        o = model.apply(p, st.replace(features=f))
        return jnp.mean((o.features - target) ** 2)

    losses = []
    for _ in range(25):
        loss, g = jax.value_and_grad(loss_fn)(params, feats)
        upd, opt = tx.update(g, opt)
        params = optax.apply_updates(params, upd)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses[::8]
