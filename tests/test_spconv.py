"""Sparse conv vs dense conv oracle.

The reference's spconv test loads pickled rulebooks and has its correctness
assert commented out (test/test_spconv.py:151-158); here the rulebook builder
is tested for real: densify the voxel grid, run a dense 3D convolution with
lax.conv, and compare at the active output sites.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgsparse_tpu.ops.spconv import (SparseConvTensor, build_rulebook,
                                     spconv)


def random_cloud(num_points=200, shape=(13, 11, 9), batch=2, seed=0):
    rng = np.random.default_rng(seed)
    total = batch * shape[0] * shape[1] * shape[2]
    flat = rng.choice(total, size=min(num_points, total), replace=False)
    b, r = np.divmod(flat, shape[0] * shape[1] * shape[2])
    x, r = np.divmod(r, shape[1] * shape[2])
    y, z = np.divmod(r, shape[2])
    coords = np.stack([b, x, y, z], 1).astype(np.int32)
    return coords


def dense_conv_oracle(coords, feats, kernel, shape, batch, stride, padding):
    """Dense lax.conv_general_dilated as oracle."""
    c_in = feats.shape[1]
    k = round(len(kernel) ** (1 / 3))
    dense = np.zeros((batch, *shape, c_in), np.float32)
    dense[coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]] = feats
    w = np.asarray(kernel).reshape(k, k, k, c_in, -1)
    out = jax.lax.conv_general_dilated(
        jnp.asarray(dense), jnp.asarray(w),
        window_strides=(stride,) * 3,
        padding=[(padding, padding)] * 3,
        dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
        # fp32-exact oracle on TPU too (default = one bf16 MXU pass)
        precision=jax.lax.Precision.HIGHEST,
    )
    return np.asarray(out)


@pytest.mark.parametrize("c_in,c_out", [(16, 32), (8, 8)])
def test_submanifold_matches_dense(c_in, c_out):
    shape, batch = (13, 11, 9), 2
    coords = random_cloud(200, shape, batch)
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((len(coords), c_in)).astype(np.float32)
    kernel = rng.standard_normal((27, c_in, c_out)).astype(np.float32) * 0.1

    plan, out_coords = build_rulebook(coords, kernel_size=3, stride=1,
                                      padding=1, spatial_shape=shape)
    np.testing.assert_array_equal(out_coords, coords)  # submanifold
    out = np.asarray(spconv(jnp.asarray(feats), jnp.asarray(kernel), plan))

    dense_out = dense_conv_oracle(coords, feats, kernel, shape, batch,
                                  stride=1, padding=1)
    ref = dense_out[coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_strided_matches_dense():
    shape, batch, c_in, c_out = (12, 12, 8), 1, 8, 16
    coords = random_cloud(150, shape, batch, seed=3)
    rng = np.random.default_rng(4)
    feats = rng.standard_normal((len(coords), c_in)).astype(np.float32)
    kernel = rng.standard_normal((27, c_in, c_out)).astype(np.float32) * 0.1

    plan, out_coords = build_rulebook(coords, kernel_size=3, stride=2,
                                      padding=1, spatial_shape=shape)
    assert not plan.separate_mid
    out = np.asarray(spconv(jnp.asarray(feats), jnp.asarray(kernel), plan))

    dense_out = dense_conv_oracle(coords, feats, kernel, shape, batch,
                                  stride=2, padding=1)
    ref = dense_out[out_coords[:, 0], out_coords[:, 1], out_coords[:, 2],
                    out_coords[:, 3]]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
    # Every nonzero dense output site is covered by an out_coord.
    nz = np.argwhere(np.abs(dense_out).sum(-1) > 1e-6)
    have = {tuple(c) for c in out_coords.tolist()}
    for site in nz.tolist():
        assert tuple(site) in have


def test_backward_finite_and_correct():
    shape, batch, c_in, c_out = (10, 10, 6), 1, 8, 8
    coords = random_cloud(120, shape, batch, seed=5)
    rng = np.random.default_rng(6)
    feats = rng.standard_normal((len(coords), c_in)).astype(np.float32)
    kernel = rng.standard_normal((27, c_in, c_out)).astype(np.float32) * 0.1
    plan, _ = build_rulebook(coords, 3, 1, 1, spatial_shape=shape)

    ct = jnp.asarray(rng.standard_normal((plan.num_out, c_out))
                     .astype(np.float32))

    def loss(f, w):
        return jnp.vdot(spconv(f, w, plan), ct)

    gf, gw = jax.grad(loss, argnums=(0, 1))(jnp.asarray(feats),
                                            jnp.asarray(kernel))
    assert np.isfinite(np.asarray(gf)).all()
    assert np.isfinite(np.asarray(gw)).all()

    # Exact check: autodiff of the dense lax.conv formulation. For a
    # submanifold conv, out rows == coords, so the sparse loss equals the
    # dense loss with the cotangent scattered onto the active sites.
    dense = np.zeros((batch, *shape, c_in), np.float32)
    dense[coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]] = feats
    ct_dense = np.zeros((batch, *shape, c_out), np.float32)
    ct_dense[coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]] = \
        np.asarray(ct)

    def dense_loss(f_d, w):
        out = jax.lax.conv_general_dilated(
            f_d, w.reshape(3, 3, 3, c_in, c_out),
            window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
            precision=jax.lax.Precision.HIGHEST)
        return jnp.vdot(out, jnp.asarray(ct_dense))

    gfd, gwd = jax.grad(dense_loss, argnums=(0, 1))(
        jnp.asarray(dense), jnp.asarray(kernel))
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gwd), rtol=1e-3,
                               atol=1e-4)
    gfd_sites = np.asarray(gfd)[coords[:, 0], coords[:, 1], coords[:, 2],
                                coords[:, 3]]
    np.testing.assert_allclose(np.asarray(gf), gfd_sites, rtol=1e-3,
                               atol=1e-4)


def test_bf16_features_close():
    """bf16 feature path (the reference's fp16 kernels' analog): matmuls in
    bf16, f32 accumulation via preferred_element_type."""
    shape, batch, c_in, c_out = (10, 10, 6), 1, 16, 16
    coords = random_cloud(120, shape, batch, seed=9)
    rng = np.random.default_rng(10)
    feats = rng.standard_normal((len(coords), c_in)).astype(np.float32)
    kernel = rng.standard_normal((27, c_in, c_out)).astype(np.float32) * 0.1
    plan, _ = build_rulebook(coords, 3, 1, 1, spatial_shape=shape)
    out32 = np.asarray(spconv(jnp.asarray(feats), jnp.asarray(kernel), plan))
    out16 = np.asarray(
        spconv(jnp.asarray(feats, jnp.bfloat16),
               jnp.asarray(kernel, jnp.bfloat16), plan).astype(jnp.float32))
    rel = np.abs(out16 - out32) / (np.abs(out32) + 0.5)
    assert rel.max() < 0.1, rel.max()


def test_sparse_conv_tensor_caches_plans():
    shape = (8, 8, 8)
    coords = random_cloud(60, shape, 1, seed=7)
    feats = jnp.ones((len(coords), 4), jnp.float32)
    st = SparseConvTensor(feats, coords, shape)
    p1, _ = st.plan_for(3, 1, 1)
    p2, _ = st.plan_for(3, 1, 1)
    assert p1 is p2
    st2 = st.replace(features=feats * 2)
    p3, _ = st2.plan_for(3, 1, 1)
    assert p3 is p1


def test_native_strided_rulebook_matches_numpy():
    """Native C++ strided rulebook == numpy expand/unique/searchsorted path
    (coords order, pair counts, and conv output)."""
    from dgsparse_tpu import native
    from dgsparse_tpu.ops import spconv as S

    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    n, shape = 6000, (60, 60, 20)
    coords = np.unique(np.stack([
        rng.integers(0, 2, n).astype(np.int32),
        rng.integers(0, shape[0], n), rng.integers(0, shape[1], n),
        rng.integers(0, shape[2], n)], 1), axis=0).astype(np.int32)
    assert len(coords) >= 2048  # native gate

    orig = native.rulebook_strided
    for ks, st, pd in ((3, 2, 1), (2, 2, 0), (5, 3, 2)):
        plan_n, oc_n = S.build_rulebook(coords, ks, st, pd,
                                        spatial_shape=shape)
        native.rulebook_strided = lambda *a, **k: None
        try:
            plan_p, oc_p = S.build_rulebook(coords, ks, st, pd,
                                            spatial_shape=shape)
        finally:
            native.rulebook_strided = orig
        np.testing.assert_array_equal(oc_n, oc_p)
        assert list(plan_n.knnz) == list(plan_p.knnz)
        f = jnp.asarray(rng.standard_normal((len(coords), 4)).astype(
            np.float32))
        w = jnp.asarray(rng.standard_normal(
            (ks ** 3, 4, 8)).astype(np.float32) * 0.1)
        np.testing.assert_allclose(
            np.asarray(S.spconv(f, w, plan_n)),
            np.asarray(S.spconv(f, w, plan_p)), rtol=1e-5, atol=1e-5)
