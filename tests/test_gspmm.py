"""Generalized semiring SpMM vs oracle (reference: src/gspmm-fp/ and the
u_*_e_* grid in example/gspmm-fp/util.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgsparse_tpu import GSpMM_u, GSpMM_u_e, SparseTensor, gspmm
from dgsparse_tpu.ops import gspmm as gmod
from dgsparse_tpu.utils.testing import gspmm_oracle, random_csr

COMPUTES = ["add", "sub", "mul", "div"]
REDUCES = ["sum", "mean", "max", "min"]


def make(m=50, n=40, feat=8, seed=0, positive_values=False):
    rowptr, col, values = random_csr(m, n, avg_degree=4.0, seed=seed)
    if positive_values:
        values = np.abs(values) + 0.5  # keep DIV well-conditioned
    rng = np.random.default_rng(seed + 1)
    dense = rng.standard_normal((n, feat)).astype(np.float32)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(values), sparse_sizes=(m, n))
    return sp, rowptr, col, values, dense


@pytest.mark.parametrize("compute", COMPUTES)
@pytest.mark.parametrize("reduce", REDUCES)
def test_forward(compute, reduce):
    sp, rowptr, col, values, dense = make(positive_values=(compute == "div"))
    out = gspmm(sp, jnp.asarray(dense), reduce, compute)
    ref = gspmm_oracle(rowptr, col, values, dense, reduce, compute)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("reduce", REDUCES)
def test_copy_u(reduce):
    sp, rowptr, col, _, dense = make()
    op = getattr(gmod, f"copy_u_{reduce}")
    out = op(sp, jnp.asarray(dense))
    ref = gspmm_oracle(rowptr, col, None, dense, reduce, "mul")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_op_grid_complete():
    """The full DGL-style grid exists (example/gspmm-fp/util.py:17-110)."""
    for c in COMPUTES:
        for r in REDUCES:
            assert callable(getattr(gmod, f"u_{c}_e_{r}"))
    for r in REDUCES:
        assert callable(getattr(gmod, f"copy_u_{r}"))


def test_raw_csr_entries():
    sp, rowptr, col, values, dense = make()
    out = GSpMM_u_e(jnp.asarray(rowptr), jnp.asarray(col),
                    jnp.asarray(values), jnp.asarray(dense), "sum", "mul")
    ref = gspmm_oracle(rowptr, col, values, dense, "sum", "mul")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)

    out_u = GSpMM_u(jnp.asarray(rowptr), jnp.asarray(col),
                    jnp.asarray(dense), "max")
    ref_u = gspmm_oracle(rowptr, col, None, dense, "max", "mul")
    np.testing.assert_allclose(np.asarray(out_u), ref_u, rtol=1e-4, atol=1e-5)


def test_raw_csr_under_jit():
    """Storage built from tracers inside jit (concrete=False path): falls
    back to traced transforms + XLA kernels."""
    sp, rowptr, col, values, dense = make()

    @jax.jit
    def f(rowptr_, col_, values_, dense_):
        return GSpMM_u_e(rowptr_, col_, values_, dense_, "sum", "mul")

    out = f(jnp.asarray(rowptr), jnp.asarray(col), jnp.asarray(values),
            jnp.asarray(dense))
    ref = gspmm_oracle(rowptr, col, values, dense, "sum", "mul")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("compute", COMPUTES)
@pytest.mark.parametrize("reduce", ["sum", "max"])
def test_backward_vs_autodiff(compute, reduce):
    sp, rowptr, col, values, dense = make(positive_values=True)
    feat = dense.shape[1]
    rng = np.random.default_rng(3)
    ct = jnp.asarray(rng.standard_normal((sp.shape[0], feat))
                     .astype(np.float32))
    coo_row = jnp.asarray(
        np.repeat(np.arange(len(rowptr) - 1), np.diff(rowptr)), jnp.int32)

    def ours(v, d):
        return jnp.vdot(gspmm(sp.set_values(v), d, reduce, compute), ct)

    def ref(v, d):
        feats = jnp.take(d, jnp.asarray(col), axis=0)
        e = v[:, None]
        c = {"add": feats + e, "sub": feats - e,
             "mul": feats * e, "div": feats / e}[compute]
        if reduce == "sum":
            o = jax.ops.segment_sum(c, coo_row, num_segments=sp.shape[0])
        else:
            o = jax.ops.segment_max(c, coo_row, num_segments=sp.shape[0])
            o = jnp.where(jnp.isfinite(o), o, 0)
        return jnp.vdot(o, ct)

    gv, gd = jax.grad(ours, argnums=(0, 1))(jnp.asarray(values),
                                            jnp.asarray(dense))
    rv, rd = jax.grad(ref, argnums=(0, 1))(jnp.asarray(values),
                                           jnp.asarray(dense))
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(rd), rtol=1e-4,
                               atol=1e-4)


@pytest.mark.parametrize("compute", ["mul", "add", "div"])
@pytest.mark.parametrize("reduce", ["max", "min"])
def test_gspmm_maxmin_ell_matches_xla(compute, reduce):
    """ELL K-space semiring max/min (fwd + winner grads) == XLA edge-space
    path, on integer data so ties are exact."""
    from dgsparse_tpu.ops import gspmm as G

    m, n, f = 750, 680, 12
    rowptr, col, _ = random_csr(m, n, avg_degree=6, seed=50, skew=1.0)
    rng = np.random.default_rng(51)
    values = rng.integers(1, 5, len(col)).astype(np.float32)  # >0 for div
    dense = rng.integers(-3, 4, (n, f)).astype(np.float32)
    ct = jnp.asarray(rng.standard_normal((m, f)).astype(np.float32))
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(values), sparse_sizes=(m, n))
    assert sp.storage.ell_plan() is not None

    def loss(v, d):
        return jnp.vdot(G.gspmm(sp.set_values(v), d, reduce, compute), ct)

    v0, d0 = jnp.asarray(values), jnp.asarray(dense)
    G._FORCE_ELL[0] = True
    try:
        out_e = G.gspmm(sp, d0, reduce, compute)
        ge = jax.grad(loss, argnums=(0, 1))(v0, d0)
    finally:
        G._FORCE_ELL[0] = False
    out_x = G.gspmm(sp, d0, reduce, compute)
    gx = jax.grad(loss, argnums=(0, 1))(v0, d0)
    np.testing.assert_allclose(np.asarray(out_e), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(ge, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_gspmm_copy_u_max_ell():
    from dgsparse_tpu.ops import gspmm as G

    m, n, f = 750, 680, 8
    rowptr, col, _ = random_csr(m, n, avg_degree=6, seed=52, skew=1.0)
    rng = np.random.default_rng(53)
    dense = rng.integers(-3, 4, (n, f)).astype(np.float32)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col), None,
                               sparse_sizes=(m, n))
    d0 = jnp.asarray(dense)
    ct = jnp.asarray(rng.standard_normal((m, f)).astype(np.float32))
    G._FORCE_ELL[0] = True
    try:
        out_e = G.gspmm(sp, d0, "max", "mul")
        ge = jax.grad(lambda d: jnp.vdot(G.gspmm(sp, d, "max", "mul"),
                                         ct))(d0)
    finally:
        G._FORCE_ELL[0] = False
    out_x = G.gspmm(sp, d0, "max", "mul")
    gx = jax.grad(lambda d: jnp.vdot(G.gspmm(sp, d, "max", "mul"), ct))(d0)
    np.testing.assert_allclose(np.asarray(out_e), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ge), np.asarray(gx),
                               rtol=1e-5, atol=1e-5)


def test_gspmm_on_hybrid_storage_falls_back_exact():
    """A clustered graph now AUTO-selects the HybridPlan (round-3
    selection fix); the generic semiring grid must stay exact through
    its ESC/XLA fallback, and spmm max/min through the ESC path."""
    from dgsparse_tpu import Algorithm, spmm
    from dgsparse_tpu.core.planner import HybridPlan
    from dgsparse_tpu.utils.testing import spmm_oracle

    rng = np.random.default_rng(41)
    m = n = 1024
    comm = 128
    deg = np.maximum(rng.poisson(48, m), 1).astype(np.int64)
    nnz = int(deg.sum())
    row = np.repeat(np.arange(m, dtype=np.int64), deg)
    c0 = (row // comm) * comm
    col = np.where(rng.random(nnz) < 0.9,
                   c0 + rng.integers(0, comm, nnz),
                   rng.integers(0, n, nnz)).astype(np.int32)
    order = np.argsort(row * (n + 1) + col, kind="stable")
    col = col[order]
    rowptr = np.zeros(m + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    vals = np.abs(rng.standard_normal(nnz)).astype(np.float32) + 0.1
    sp = SparseTensor.from_csr(jnp.asarray(rowptr.astype(np.int32)),
                               jnp.asarray(col), jnp.asarray(vals),
                               sparse_sizes=(m, n))
    assert isinstance(sp.storage.ell_plan(), HybridPlan)

    u = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    e = jnp.asarray(vals)
    # SUM/MEAN take the tier-fast hybrid decomposition; MAX falls back
    for op, reduce in (("mul", "sum"), ("sub", "sum"), ("add", "mean"),
                       ("div", "sum"), ("mul", "max")):
        out = gspmm(sp, u, reduce, op)
        ref = gspmm_oracle(rowptr, col, np.asarray(e), np.asarray(u),
                           reduce, op)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4,
                                   atol=2e-4)
    # grads of the decomposition == pure-XLA autodiff oracle
    from dgsparse_tpu.kernels import xla as kx2
    from dgsparse_tpu.ops.types import ComputeOp, ReduceOp

    coo_row = np.repeat(np.arange(m), deg).astype(np.int32)
    ct = jnp.asarray(rng.standard_normal((m, 8)).astype(np.float32))

    def loss_hy(v, d):
        return jnp.vdot(gspmm(sp.set_values(v), d, "sum", "sub"), ct)

    def loss_xla(v, d):
        out, _ = kx2.gspmm_forward(jnp.asarray(coo_row), jnp.asarray(col),
                                   v, d, m, ReduceOp.SUM, ComputeOp.SUB)
        return jnp.vdot(out, ct)

    gv, gd = jax.jit(jax.grad(loss_hy, argnums=(0, 1)))(e, u)
    gv_r, gd_r = jax.jit(jax.grad(loss_xla, argnums=(0, 1)))(e, u)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_r),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gd_r),
                               rtol=1e-4, atol=2e-4)
    # spmm max on the hybrid storage rides the ESC plan (< 16M edges)
    out = spmm(sp, u, "max")
    ref = spmm_oracle(rowptr, col, vals, np.asarray(u), "max")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
