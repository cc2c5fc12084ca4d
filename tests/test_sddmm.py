"""SDDMM forward/backward vs oracle (reference: src/sddmm/, the SpMM
backward's d_values path in src/spmm.cpp:66)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgsparse_tpu import SparseTensor, sddmm, sddmm_coo
from dgsparse_tpu.utils.testing import random_csr, sddmm_oracle


def make(m=80, n=60, feat=16, seed=0):
    rowptr, col, _ = random_csr(m, n, avg_degree=5.0, seed=seed)
    rng = np.random.default_rng(seed + 1)
    d1 = rng.standard_normal((m, feat)).astype(np.float32)
    d2 = rng.standard_normal((n, feat)).astype(np.float32)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               sparse_sizes=(m, n))
    return sp, rowptr, col, d1, d2


@pytest.mark.parametrize("feat", [1, 8, 33, 64])
@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_forward(feat, reduce):
    sp, rowptr, col, d1, d2 = make(feat=feat)
    out = sddmm(sp, jnp.asarray(d1), jnp.asarray(d2), reduce)
    ref = sddmm_oracle(rowptr, col, d1, d2, reduce)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_coo_forward():
    sp, rowptr, col, d1, d2 = make()
    coo_row = np.repeat(np.arange(len(rowptr) - 1), np.diff(rowptr))
    out = sddmm_coo(jnp.asarray(coo_row, jnp.int32), jnp.asarray(col),
                    jnp.asarray(d1), jnp.asarray(d2))
    ref = sddmm_oracle(rowptr, col, d1, d2)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_backward(reduce):
    sp, rowptr, col, d1, d2 = make(feat=8)
    rng = np.random.default_rng(9)
    ct = jnp.asarray(rng.standard_normal(len(col)).astype(np.float32))

    def loss(d1_, d2_):
        return jnp.vdot(sddmm(sp, d1_, d2_, reduce), ct)

    g1, g2 = jax.grad(loss, argnums=(0, 1))(jnp.asarray(d1), jnp.asarray(d2))

    # Reference: autodiff of the plain gather/einsum formulation.
    coo_row = jnp.asarray(
        np.repeat(np.arange(len(rowptr) - 1), np.diff(rowptr)), jnp.int32)
    deg = jnp.asarray(np.maximum(np.diff(rowptr), 1), jnp.float32)

    def ref_loss(d1_, d2_):
        e = jnp.einsum("ef,ef->e", jnp.take(d1_, coo_row, axis=0),
                       jnp.take(d2_, jnp.asarray(col), axis=0))
        if reduce == "mean":
            e = e / jnp.take(deg, coo_row)
        return jnp.vdot(e, ct)

    r1, r2 = jax.grad(ref_loss, argnums=(0, 1))(jnp.asarray(d1),
                                                jnp.asarray(d2))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(r1), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(r2), rtol=1e-4,
                               atol=1e-5)


def test_spmm_sddmm_adjoint_consistency():
    """<SpMM(A,B), G> == <values, SDDMM(G, B)> — the identity the reference's
    backward relies on (src/spmm.cpp:66)."""
    from dgsparse_tpu import spmm_sum

    m, n, feat = 40, 30, 8
    rowptr, col, values = random_csr(m, n, avg_degree=4.0, seed=21)
    rng = np.random.default_rng(22)
    b = rng.standard_normal((n, feat)).astype(np.float32)
    g = rng.standard_normal((m, feat)).astype(np.float32)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(values), sparse_sizes=(m, n))
    lhs = jnp.vdot(spmm_sum(sp, jnp.asarray(b), 0), jnp.asarray(g))
    rhs = jnp.vdot(jnp.asarray(values),
                   sddmm(sp, jnp.asarray(g), jnp.asarray(b)))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)
