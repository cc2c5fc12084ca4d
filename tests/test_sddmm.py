"""SDDMM forward/backward vs oracle (reference: src/sddmm/, the SpMM
backward's d_values path in src/spmm.cpp:66)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgsparse_tpu import SparseTensor, sddmm, sddmm_coo
from dgsparse_tpu.kernels import xla as kx
from dgsparse_tpu.ops.types import ReduceOp
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


def test_sddmm_chunked_matches_unchunked(monkeypatch):
    """Edge-chunked SDDMM (lean mode for 100M+-edge graphs) is exact."""
    import jax

    from dgsparse_tpu.kernels import xla as kx

    monkeypatch.setattr(kx, "_SDDMM_CHUNK_BUDGET", 1024)
    rng = np.random.default_rng(0)
    m = n = 200
    nnz = 5000
    row = np.sort(rng.integers(0, m, nnz)).astype(np.int32)
    col = rng.integers(0, n, nnz).astype(np.int32)
    d1 = jnp.asarray(rng.standard_normal((m, 16)).astype(np.float32))
    d2 = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    out = kx.sddmm_chunked(jnp.asarray(row), jnp.asarray(col), d1, d2)
    ref = kx.sddmm(jnp.asarray(row), jnp.asarray(col), d1, d2)
    # chunk boundaries regroup the F-axis accumulation: last-ulp grade
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)
    # rowptr path: per-chunk clipped-degree repeat expansion of d1
    rowptr = np.zeros(m + 1, np.int64)
    rowptr[1:] = np.cumsum(np.bincount(row, minlength=m))
    out_rp = kx.sddmm_chunked(jnp.asarray(row), jnp.asarray(col), d1, d2,
                              rowptr=jnp.asarray(rowptr.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out_rp), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    g = jnp.asarray(rng.standard_normal(nnz).astype(np.float32))
    b1 = kx.sddmm_bwd_chunked(jnp.asarray(row), jnp.asarray(col), g, d2, m)
    r1 = jax.ops.segment_sum(
        jnp.take(d2, jnp.asarray(col), axis=0) * g[:, None],
        jnp.asarray(row), num_segments=m, indices_are_sorted=True)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(r1), rtol=1e-5,
                               atol=1e-5)


def test_sddmm_hybrid_matches_xla():
    """3-tier hybrid SDDMM (dense cells as block matmuls + edge_src
    assembly gather) is exact vs the 2-row-gather formulation."""
    from dgsparse_tpu.core.planner import build_hybrid_plan
    from dgsparse_tpu.kernels import pallas_sddmm as ps
    from dgsparse_tpu.kernels import pallas_spmm as kp

    # restore afterward: leaking interpret=True made every Pallas test
    # after this file run interpreted on the real-TPU suite (the inner
    # one-hot dots then lower as default-precision XLA matmuls -> bf16)
    prev_interp = kp._INTERPRET
    kp.set_interpret(True)
    try:
        rng = np.random.default_rng(11)
        m = n = 1500
        comm = 150
        deg = np.maximum(rng.poisson(40, m), 0).astype(np.int64)
        deg[::11] = 0
        nnz = int(deg.sum())
        row = np.repeat(np.arange(m, dtype=np.int64), deg)
        c0 = (row // comm) * comm
        col = np.where(rng.random(nnz) < 0.8,
                       c0 + rng.integers(0, 1 << 30, nnz)
                       % np.minimum(comm, n - c0),
                       rng.integers(0, n, nnz)).astype(np.int32)
        order = np.argsort(row * (n + 1) + col, kind="stable")
        col = col[order]
        rowptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
        hp = build_hybrid_plan(rowptr, col, n)
        assert hp is not None and hp.cells is not None
        d1 = jnp.asarray(rng.standard_normal((m, 24)).astype(np.float32))
        d2 = jnp.asarray(rng.standard_normal((n, 24)).astype(np.float32))
        coo = jnp.asarray(np.repeat(np.arange(m, dtype=np.int32),
                                    np.diff(rowptr)))
        got = ps.sddmm_hybrid(hp, d1, d2)
        ref = kx.sddmm(coo, jnp.asarray(col), d1, d2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        # MEAN flavor
        degs = jnp.asarray(np.diff(rowptr).astype(np.int32))
        got_m = ps.sddmm_hybrid(hp, d1, d2, ReduceOp.MEAN, degs, coo)
        ref_m = kx.sddmm(coo, jnp.asarray(col), d1, d2, ReduceOp.MEAN, degs)
        np.testing.assert_allclose(np.asarray(got_m), np.asarray(ref_m),
                                   rtol=1e-4, atol=1e-4)
    finally:
        kp.set_interpret(prev_interp)
