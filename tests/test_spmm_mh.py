"""Multi-head batched SpMM vs a per-head loop of the single-head oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgsparse_tpu import Algorithm, SparseTensor, spmm_multihead
from dgsparse_tpu.utils.testing import random_csr, spmm_oracle

M, N, H, F = 210, 170, 4, 24


def make(seed=0):
    rowptr, col, vals = random_csr(M, N, avg_degree=6, seed=seed)
    rng = np.random.default_rng(seed + 1)
    values = rng.standard_normal((len(col), H)).astype(np.float32)
    dense = rng.standard_normal((N, H, F)).astype(np.float32)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col), None,
                               sparse_sizes=(M, N))
    return sp, rowptr, col, values, dense


def oracle_mh(rowptr, col, values, dense, reduce):
    return np.stack([
        spmm_oracle(rowptr, col,
                    None if values is None else values[:, k],
                    dense[:, k, :], reduce)
        for k in range(dense.shape[1])
    ], axis=1)


@pytest.mark.parametrize("alg", [Algorithm.XLA_SEGMENT,
                                 Algorithm.PALLAS_EDGE_TILE])
@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_forward(alg, reduce):
    sp, rowptr, col, values, dense = make(3)
    out = spmm_multihead(sp, jnp.asarray(values), jnp.asarray(dense),
                         reduce, alg)
    ref = oracle_mh(rowptr, col, values, dense, reduce)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("alg", [Algorithm.XLA_SEGMENT,
                                 Algorithm.PALLAS_EDGE_TILE])
def test_forward_no_values(alg):
    sp, rowptr, col, _, dense = make(5)
    out = spmm_multihead(sp, None, jnp.asarray(dense), "sum", alg)
    ref = oracle_mh(rowptr, col, None, dense, "sum")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("alg", [Algorithm.XLA_SEGMENT,
                                 Algorithm.PALLAS_EDGE_TILE])
@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_grads_match_per_head_loop(alg, reduce):
    sp, rowptr, col, values, dense = make(7)
    rng = np.random.default_rng(11)
    ct = jnp.asarray(rng.standard_normal((M, H, F)).astype(np.float32))

    def loss_mh(v, d):
        return jnp.vdot(spmm_multihead(sp, v, d, reduce, alg), ct)

    def loss_loop(v, d):
        from dgsparse_tpu import spmm

        outs = [spmm(sp.set_values(v[:, k]), d[:, k, :], reduce,
                     Algorithm.XLA_SEGMENT) for k in range(H)]
        return jnp.vdot(jnp.stack(outs, axis=1), ct)

    gv, gd = jax.grad(loss_mh, argnums=(0, 1))(jnp.asarray(values),
                                               jnp.asarray(dense))
    gv_r, gd_r = jax.grad(loss_loop, argnums=(0, 1))(jnp.asarray(values),
                                                     jnp.asarray(dense))
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gd_r),
                               rtol=1e-4, atol=1e-4)


def test_jit_and_empty_rows():
    rowptr = np.array([0, 0, 2, 2, 5], np.int32)
    col = np.array([1, 3, 0, 2, 3], np.int32)
    rng = np.random.default_rng(0)
    values = rng.standard_normal((5, 2)).astype(np.float32)
    dense = rng.standard_normal((4, 2, 8)).astype(np.float32)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col), None,
                               sparse_sizes=(4, 4))
    fn = jax.jit(lambda v, d: spmm_multihead(sp, v, d, "mean"))
    out = np.asarray(fn(jnp.asarray(values), jnp.asarray(dense)))
    ref = oracle_mh(rowptr, col, values, dense, "mean")
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
    assert np.all(out[0] == 0) and np.all(out[2] == 0)


def test_shape_validation():
    sp, _, col, values, dense = make(1)
    with pytest.raises(ValueError):
        spmm_multihead(sp, jnp.asarray(values[:, :2]), jnp.asarray(dense))
    with pytest.raises(ValueError):
        spmm_multihead(sp, jnp.asarray(values),
                       jnp.asarray(dense[:, 0, :]))


@pytest.mark.parametrize("reduce", ["max", "min"])
def test_maxmin_forward(reduce):
    sp, rowptr, col, values, dense = make(13)
    out = spmm_multihead(sp, jnp.asarray(values), jnp.asarray(dense),
                         reduce)
    ref = oracle_mh(rowptr, col, values, dense, reduce)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("reduce", ["max", "min"])
def test_maxmin_no_values(reduce):
    sp, rowptr, col, _, dense = make(17)
    out = spmm_multihead(sp, None, jnp.asarray(dense), reduce)
    ref = oracle_mh(rowptr, col, None, dense, reduce)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("reduce", ["max", "min"])
def test_maxmin_grads_match_per_head_loop(reduce):
    sp, rowptr, col, values, dense = make(19)
    rng = np.random.default_rng(23)
    ct = jnp.asarray(rng.standard_normal((M, H, F)).astype(np.float32))

    def loss_mh(v, d):
        return jnp.vdot(spmm_multihead(sp, v, d, reduce), ct)

    def loss_loop(v, d):
        from dgsparse_tpu import spmm

        outs = [spmm(sp.set_values(v[:, k]), d[:, k, :], reduce,
                     Algorithm.XLA_SEGMENT) for k in range(H)]
        return jnp.vdot(jnp.stack(outs, axis=1), ct)

    gv, gd = jax.grad(loss_mh, argnums=(0, 1))(jnp.asarray(values),
                                               jnp.asarray(dense))
    gv_r, gd_r = jax.grad(loss_loop, argnums=(0, 1))(jnp.asarray(values),
                                                     jnp.asarray(dense))
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gd_r),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("reduce", ["max", "min"])
def test_maxmin_chunked_matches_unchunked(reduce, monkeypatch):
    """Force tiny edge chunks and check fwd+grads stay identical."""
    from dgsparse_tpu.kernels import xla as kx

    sp, rowptr, col, values, dense = make(29)
    rng = np.random.default_rng(31)
    ct = jnp.asarray(rng.standard_normal((M, H, F)).astype(np.float32))

    def loss(v, d):
        return jnp.vdot(spmm_multihead(sp, v, d, reduce), ct)

    out1 = spmm_multihead(sp, jnp.asarray(values), jnp.asarray(dense),
                          reduce)
    g1 = jax.grad(loss, argnums=(0, 1))(jnp.asarray(values),
                                        jnp.asarray(dense))
    monkeypatch.setattr(kx, "_SPMM_CHUNK_BUDGET", 400 * 4 * H * F)
    out2 = spmm_multihead(sp, jnp.asarray(values), jnp.asarray(dense),
                          reduce)
    g2 = jax.grad(loss, argnums=(0, 1))(jnp.asarray(values),
                                        jnp.asarray(dense))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-6, atol=1e-6)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
