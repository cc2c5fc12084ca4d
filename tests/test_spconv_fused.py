"""Fused Pallas pair-stream spconv kernel (forced on; TPU perf tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgsparse_tpu.kernels import pallas_spconv as kf
from dgsparse_tpu.ops import spconv as S
from tests.test_spconv import dense_conv_oracle, random_cloud


@pytest.fixture
def force_fused():
    prev = kf._INTERPRET
    kf.set_interpret(True)
    S._FORCE_FUSED[0] = True
    yield
    S._FORCE_FUSED[0] = None
    kf.set_interpret(prev)


def test_fused_spconv_fwd(force_fused):
    shape, batch, c_in, c_out = (12, 10, 8), 1, 8, 16
    coords = random_cloud(140, shape, batch, seed=42)
    rng = np.random.default_rng(43)
    feats = rng.standard_normal((len(coords), c_in)).astype(np.float32)
    kernel = rng.standard_normal((27, c_in, c_out)).astype(np.float32) * 0.1
    plan, _ = S.build_rulebook(coords, 3, 1, 1, spatial_shape=shape)
    assert plan.use_fused(c_in, c_out)

    out = np.asarray(S.spconv(jnp.asarray(feats), jnp.asarray(kernel), plan))
    dense_out = dense_conv_oracle(coords, feats, kernel, shape, batch, 1, 1)
    ref = dense_out[coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]]
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_fused_spconv_grads_match_dense(force_fused):
    shape, batch, c_in, c_out = (10, 9, 7), 2, 8, 8
    coords = random_cloud(120, shape, batch, seed=7)
    rng = np.random.default_rng(8)
    feats = rng.standard_normal((len(coords), c_in)).astype(np.float32)
    kernel = rng.standard_normal((27, c_in, c_out)).astype(np.float32) * 0.1
    plan, _ = S.build_rulebook(coords, 3, 1, 1, spatial_shape=shape)
    assert plan.use_fused(c_in, c_out)
    out = S.spconv(jnp.asarray(feats), jnp.asarray(kernel), plan)
    ct = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))

    def loss(f, w):
        return jnp.vdot(S.spconv(f, w, plan), ct)

    gf_f, gw_f = jax.grad(loss, argnums=(0, 1))(jnp.asarray(feats),
                                                jnp.asarray(kernel))
    S._FORCE_FUSED[0] = False
    gf_d, gw_d = jax.grad(loss, argnums=(0, 1))(jnp.asarray(feats),
                                                jnp.asarray(kernel))
    S._FORCE_FUSED[0] = True
    np.testing.assert_allclose(np.asarray(gf_f), np.asarray(gf_d),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_d),
                               rtol=2e-4, atol=2e-4)


def test_fused_spconv_strided(force_fused):
    shape, c_in, c_out = (12, 12, 8), 8, 8
    coords = random_cloud(120, shape, 1, seed=44)
    rng = np.random.default_rng(45)
    feats = rng.standard_normal((len(coords), c_in)).astype(np.float32)
    kernel = rng.standard_normal((27, c_in, c_out)).astype(np.float32) * 0.1
    plan, out_coords = S.build_rulebook(coords, 3, 2, 1, spatial_shape=shape)
    assert plan.use_fused(c_in, c_out)
    out = np.asarray(S.spconv(jnp.asarray(feats), jnp.asarray(kernel), plan))
    dense_out = dense_conv_oracle(coords, feats, kernel, shape, 1, 2, 1)
    ref = dense_out[out_coords[:, 0], out_coords[:, 1], out_coords[:, 2],
                    out_coords[:, 3]]
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_fused_gate_rejects_wide_channels():
    coords = random_cloud(100, (10, 10, 8), 1, seed=3)
    plan, _ = S.build_rulebook(coords, 3, 1, 1, spatial_shape=(10, 10, 8))
    # 27 * 128 = 3456 > 2048: falls back (VMEM budget)
    assert not plan.use_fused(128, 128)
