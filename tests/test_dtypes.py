"""dtype handling: bf16 feature matrices through every op/kernel path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgsparse_tpu import Algorithm, SparseTensor, gspmm, sddmm, spmm
from dgsparse_tpu.utils.testing import random_csr, spmm_oracle


def make(feat=32, seed=0, m=200, n=180):
    rowptr, col, values = random_csr(m, n, avg_degree=6.0, seed=seed)
    rng = np.random.default_rng(seed + 1)
    dense = rng.standard_normal((n, feat)).astype(np.float32)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(values), sparse_sizes=(m, n))
    return sp, rowptr, col, values, dense


@pytest.mark.parametrize("alg", [Algorithm.XLA_SEGMENT,
                                 Algorithm.PALLAS_EDGE_TILE])
def test_spmm_bf16(alg):
    sp, rowptr, col, values, dense = make()
    xb = jnp.asarray(dense).astype(jnp.bfloat16)
    out = spmm(sp, xb, "sum", alg)
    assert out.dtype == jnp.bfloat16
    ref = spmm_oracle(rowptr, col, values, dense, "sum")
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32), ref,
                               rtol=0.05, atol=0.1)


def test_spmm_bf16_grad_dtypes():
    sp, rowptr, col, values, dense = make()
    xb = jnp.asarray(dense).astype(jnp.bfloat16)
    v = jnp.asarray(values)

    def loss(v_, x_):
        return spmm(sp.set_values(v_), x_, "sum").astype(jnp.float32).sum()

    gv, gx = jax.grad(loss, argnums=(0, 1))(v, xb)
    assert gv.dtype == v.dtype
    assert gx.dtype == xb.dtype
    assert np.isfinite(np.asarray(gv, np.float32)).all()


def test_sddmm_mixed():
    sp, rowptr, col, values, dense = make(feat=16)
    d1 = jnp.asarray(np.random.default_rng(3)
                     .standard_normal((200, 16)).astype(np.float32))
    out32 = sddmm(sp, d1, jnp.asarray(dense))
    assert out32.dtype == jnp.float32
    assert np.isfinite(np.asarray(out32)).all()


@pytest.mark.parametrize("force_esc", [False, True])
def test_spconv_bf16(force_esc):
    from dgsparse_tpu.ops import spconv as S
    from tests.test_spconv import dense_conv_oracle, random_cloud

    shape, c_in, c_out = (12, 10, 8), 8, 16
    coords = random_cloud(140, shape, 1, seed=42)
    rng = np.random.default_rng(43)
    feats = rng.standard_normal((len(coords), c_in)).astype(np.float32)
    kernel = rng.standard_normal((27, c_in, c_out)).astype(np.float32) * 0.1
    plan, _ = S.build_rulebook(coords, 3, 1, 1, spatial_shape=shape)
    ref = dense_conv_oracle(coords, feats, kernel, shape, 1, 1, 1)[
        coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]]

    S._FORCE_ESC[0] = force_esc
    try:
        fb = jnp.asarray(feats).astype(jnp.bfloat16)
        kb = jnp.asarray(kernel).astype(jnp.bfloat16)
        out = S.spconv(fb, kb, plan)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), ref, rtol=0.08, atol=0.08)
        gf, gw = jax.grad(
            lambda f, w: jnp.vdot(S.spconv(f, w, plan).astype(jnp.float32),
                                  jnp.asarray(ref)),
            argnums=(0, 1))(fb, kb)
        assert gf.dtype == jnp.bfloat16 and gw.dtype == jnp.bfloat16
    finally:
        S._FORCE_ESC[0] = False


def test_spconv_module_compute_dtype():
    from dgsparse_tpu.nn.sparse_conv import SubMConv3d
    from dgsparse_tpu.ops.spconv import SparseConvTensor
    from tests.test_spconv import random_cloud

    coords = random_cloud(120, (10, 10, 8), 1, seed=1)
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.standard_normal((len(coords), 8)).astype(
        np.float32))
    st = SparseConvTensor(feats, coords, (10, 10, 8))
    m = SubMConv3d(16, compute_dtype=jnp.bfloat16)
    params = m.init(jax.random.key(0), st)
    # params stay fp32 (param_dtype default), activations bf16
    assert params["params"]["kernel"].dtype == jnp.float32
    out = m.apply(params, st)
    assert out.features.dtype == jnp.bfloat16

    m32 = SubMConv3d(16)
    out32 = m32.apply(params, st)
    np.testing.assert_allclose(
        np.asarray(out.features, np.float32), np.asarray(out32.features),
        rtol=0.08, atol=0.08)
