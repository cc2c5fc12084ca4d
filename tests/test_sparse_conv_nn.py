"""Sparse conv layer tests: a small submanifold+downsample network trains."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import flax.linen as nn

from dgsparse_tpu.nn import SparseConv3d, SparseConvBlock, SubMConv3d
from dgsparse_tpu.ops.spconv import SparseConvTensor
from tests.test_spconv import random_cloud


class TinyNet(nn.Module):
    @nn.compact
    def __call__(self, st):
        st = SparseConvBlock(16)(st)
        st = SubMConv3d(16)(st)
        st = SparseConv3d(32, stride=2)(st)
        # global mean pool -> classifier
        return nn.Dense(4)(st.features.mean(axis=0))


def make_cloud(seed=0):
    shape = (12, 12, 8)
    coords = random_cloud(150, shape, 1, seed=seed)
    rng = np.random.default_rng(seed + 1)
    feats = jnp.asarray(rng.standard_normal((len(coords), 8))
                        .astype(np.float32))
    return SparseConvTensor(feats, coords, shape)


def test_forward_shapes():
    st = make_cloud()
    model = TinyNet()
    params = model.init(jax.random.key(0), st)
    out = model.apply(params, st)
    assert out.shape == (4,)
    assert np.isfinite(np.asarray(out)).all()


def test_downsample_reduces_sites():
    st = make_cloud(seed=2)
    conv = SparseConv3d(8, stride=2)
    params = conv.init(jax.random.key(0), st)
    out = conv.apply(params, st)
    assert out.features.shape[1] == 8
    assert out.features.shape[0] <= st.features.shape[0]
    assert out.features.shape[0] > 0


def test_tiny_net_trains():
    st = make_cloud(seed=3)
    model = TinyNet()
    params = model.init(jax.random.key(0), st)
    target = jnp.asarray([1.0, -1.0, 0.5, 2.0])
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    # jit over features only; structure (plans) closed over.
    def loss_fn(p, feats):
        out = model.apply(p, st.replace(features=feats))
        return jnp.sum((out - target) ** 2)

    step_loss = []
    feats = st.features
    grad_fn = jax.value_and_grad(loss_fn)
    for _ in range(30):
        loss, g = grad_fn(params, feats)
        updates, opt = tx.update(g, opt)
        params = optax.apply_updates(params, updates)
        step_loss.append(float(loss))
    assert step_loss[-1] < step_loss[0] * 0.5, step_loss[::10]
