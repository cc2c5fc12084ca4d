"""Slot-space fused GAT attention vs the edge-space oracle (forward and
gradients), on hybrid-planned and plain storages."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgsparse_tpu import SparseTensor
from dgsparse_tpu.core.planner import HybridPlan
from dgsparse_tpu.ops.attention import (_edge_space_attention,
                                        gat_attention)
from dgsparse_tpu.utils.testing import random_csr


def clustered_csr(m=1500, n=1500, deg=40, comm=150, intra=0.8, seed=0):
    rng = np.random.default_rng(seed)
    degs = np.maximum(rng.poisson(deg, m), 0).astype(np.int64)
    degs[::17] = 0  # empty rows must yield zero output rows
    nnz = int(degs.sum())
    row = np.repeat(np.arange(m, dtype=np.int64), degs)
    c0 = (row // comm) * comm
    width = np.minimum(comm, n - c0)
    pick = rng.random(nnz) < intra
    col = np.where(pick, c0 + rng.integers(0, 1 << 30, nnz) % width,
                   rng.integers(0, n, nnz)).astype(np.int32)
    order = np.argsort(row * (n + 1) + col, kind="stable")
    col = col[order]
    rowptr = np.zeros(m + 1, np.int64)
    rowptr[1:] = np.cumsum(degs)
    return rowptr.astype(np.int32), col


def oracle(rowptr, col, s_row, s_col, x, slope=0.2):
    """Dense numpy reference."""
    m = len(rowptr) - 1
    out = np.zeros((m, x.shape[1]), np.float64)
    for r in range(m):
        cs = col[rowptr[r]:rowptr[r + 1]]
        if not len(cs):
            continue
        z = s_row[r] + s_col[cs]
        logit = np.where(z > 0, z, slope * z)
        e = np.exp(logit - logit.max())
        a = e / e.sum()
        out[r] = (a[:, None] * x[cs]).sum(axis=0)
    return out


def make_inputs(n, m, feat, seed):
    rng = np.random.default_rng(seed)
    s_row = rng.standard_normal(m).astype(np.float32)
    s_col = rng.standard_normal(n).astype(np.float32)
    x = rng.standard_normal((n, feat)).astype(np.float32)
    return s_row, s_col, x


@pytest.mark.parametrize("feat", [16, 64])
def test_hybrid_attention_forward(feat):
    rowptr, col = clustered_csr(seed=21)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               None, sparse_sizes=(1500, 1500))
    assert isinstance(sp.storage.ell_plan(), HybridPlan)
    s_row, s_col, x = make_inputs(1500, 1500, feat, 22)
    out = gat_attention(sp, jnp.asarray(s_row), jnp.asarray(s_col),
                        jnp.asarray(x))
    ref = oracle(rowptr, col, s_row, s_col, x)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_hybrid_attention_grads_match_edge_space():
    rowptr, col = clustered_csr(seed=31)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               None, sparse_sizes=(1500, 1500))
    assert isinstance(sp.storage.ell_plan(), HybridPlan)
    s_row, s_col, x = make_inputs(1500, 1500, 16, 32)
    rng = np.random.default_rng(33)
    ct = jnp.asarray(rng.standard_normal((1500, 16)).astype(np.float32))

    def loss_fast(sr, sc, xx):
        return jnp.vdot(gat_attention(sp, sr, sc, xx), ct)

    def loss_ref(sr, sc, xx):
        return jnp.vdot(_edge_space_attention(sp, sr, sc, xx, 0.2), ct)

    gf = jax.grad(loss_fast, argnums=(0, 1, 2))(
        jnp.asarray(s_row), jnp.asarray(s_col), jnp.asarray(x))
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(s_row), jnp.asarray(s_col), jnp.asarray(x))
    for a, b, name in zip(gf, gr, ("s_row", "s_col", "x")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_plain_storage_falls_back_to_edge_space():
    rowptr, col, _ = random_csr(400, 400, avg_degree=5.0, seed=4)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               None, sparse_sizes=(400, 400))
    assert not isinstance(sp.storage.ell_plan(), HybridPlan)
    s_row, s_col, x = make_inputs(400, 400, 8, 5)
    out = gat_attention(sp, jnp.asarray(s_row), jnp.asarray(s_col),
                        jnp.asarray(x))
    ref = oracle(rowptr, col, s_row, s_col, x)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_hybrid_attention_under_jit():
    rowptr, col = clustered_csr(seed=41)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               None, sparse_sizes=(1500, 1500))
    s_row, s_col, x = make_inputs(1500, 1500, 8, 42)
    f = jax.jit(lambda sr, sc, xx: gat_attention(sp, sr, sc, xx))
    out = f(jnp.asarray(s_row), jnp.asarray(s_col), jnp.asarray(x))
    ref = oracle(rowptr, col, s_row, s_col, x)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)
