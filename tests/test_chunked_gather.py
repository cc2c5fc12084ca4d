"""Column-chunked gather SpMM (planner.ColChunkedEllPlan).

The chunked plan slices the dense gather table into row ranges so every
random row gather stays in the v5e fast regime (<=~16 MB tables, measured
benchmark/probe_gather_tablesize.py). These tests force chunking on small
graphs via DGSPARSE_CHUNKED_GATHER=<n> and check exactness against the
dense oracle — forward, MEAN, grads, jit-with-sparse-argument, and the
hybrid residue integration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgsparse_tpu import Algorithm, SparseTensor, spmm
from dgsparse_tpu.core.planner import (ColChunkedEllPlan, HybridPlan,
                                       build_col_chunked_ell_plan)
from dgsparse_tpu.kernels.pallas_spmm import spmm_col_chunked_ell
from dgsparse_tpu.ops.spmm import ReduceOp
from dgsparse_tpu.utils.testing import random_csr, spmm_oracle


def _force(monkeypatch, n):
    monkeypatch.setenv("DGSPARSE_CHUNKED_GATHER", str(n))


def _powerlaw_csr(m=1200, n=500, seed=0):
    rng = np.random.default_rng(seed)
    deg = np.minimum(rng.zipf(1.7, m), 64).astype(np.int64)
    deg[::13] = 0
    nnz = int(deg.sum())
    col = rng.integers(0, n, nnz).astype(np.int32)
    row = np.repeat(np.arange(m, dtype=np.int64), deg)
    order = np.argsort(row * (n + 1) + col, kind="stable")
    col = col[order]
    rowptr = np.zeros(m + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    vals = rng.standard_normal(nnz).astype(np.float32)
    return rowptr.astype(np.int32), col, vals


def test_builder_partitions_edges_exactly():
    rowptr, col, _ = _powerlaw_csr()
    plan = build_col_chunked_ell_plan(rowptr, col, 500, 4)
    assert isinstance(plan, ColChunkedEllPlan)
    assert plan.nchunks == 4
    # every edge appears exactly once across chunks, with global ids
    ids = []
    for c, sub in enumerate(plan.subs):
        ep = np.asarray(sub.eperm)
        valid = ep[ep >= 0]
        ids.append(valid)
        # chunk-local columns stay inside the chunk extent
        cols = np.asarray(sub.cols)
        mask = ep >= 0
        extent = min(plan.chunk_size, 500 - c * plan.chunk_size)
        assert cols[mask].size == 0 or cols[mask].max() < extent
        # and map back to the global columns of exactly these edges
        np.testing.assert_array_equal(
            np.sort(cols[mask] + c * plan.chunk_size),
            np.sort(col[valid]))
    allids = np.concatenate(ids)
    np.testing.assert_array_equal(np.sort(allids), np.arange(len(col)))


@pytest.mark.parametrize("reduce", ["sum", "mean"])
@pytest.mark.parametrize("has_value", [True, False])
def test_chunked_executor_matches_oracle(reduce, has_value):
    rowptr, col, vals = _powerlaw_csr(seed=3)
    plan = build_col_chunked_ell_plan(rowptr, col, 500, 5)
    rng = np.random.default_rng(7)
    dense = jnp.asarray(rng.standard_normal((500, 24)).astype(np.float32))
    v = jnp.asarray(vals) if has_value else None
    degrees = jnp.asarray(np.diff(rowptr)) if reduce == "mean" else None
    out = spmm_col_chunked_ell(
        plan, v, dense,
        ReduceOp.SUM if reduce == "sum" else ReduceOp.MEAN,
        degrees=degrees)
    ref = spmm_oracle(rowptr, col, vals if has_value else None,
                      np.asarray(dense), reduce)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_forced_chunking_through_public_spmm(monkeypatch):
    _force(monkeypatch, 4)
    rowptr, col, vals = _powerlaw_csr(seed=5)
    sp = SparseTensor.from_csr(rowptr, col, jnp.asarray(vals), (1200, 500))
    cp = sp.storage.ell_chunked(24, 4)
    if cp is None:
        pytest.skip("structure did not admit an ELL plan")
    rng = np.random.default_rng(11)
    dense = jnp.asarray(rng.standard_normal((500, 24)).astype(np.float32))
    for reduce in ("sum", "mean"):
        out = spmm(sp, dense, reduce, Algorithm.PALLAS_ROW_TILE)
        ref = spmm_oracle(rowptr, col, vals, np.asarray(dense), reduce)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5,
                                   atol=2e-5)


def test_forced_chunking_grads_exact(monkeypatch):
    _force(monkeypatch, 3)
    rowptr, col, vals = _powerlaw_csr(seed=9)
    sp = SparseTensor.from_csr(rowptr, col, jnp.asarray(vals), (1200, 500))
    if sp.storage.ell_chunked(24, 4) is None:
        pytest.skip("structure did not admit an ELL plan")
    rng = np.random.default_rng(13)
    dense = jnp.asarray(rng.standard_normal((500, 16)).astype(np.float32))

    def loss(values_, dense_):
        s = sp.set_values(values_)
        return jnp.sum(spmm(s, dense_, "sum", Algorithm.PALLAS_ROW_TILE)
                       * jnp.cos(jnp.arange(16.0)))

    g_v, g_d = jax.grad(loss, argnums=(0, 1))(jnp.asarray(vals), dense)

    # reference: explicit dense formulation
    coo_r = np.repeat(np.arange(1200), np.diff(rowptr))

    def dense_loss(values_, dense_):
        a = jnp.zeros((1200, 500), jnp.float32)
        a = a.at[jnp.asarray(coo_r), jnp.asarray(col)].add(values_)
        return jnp.sum((a @ dense_) * jnp.cos(jnp.arange(16.0)))

    # pin the oracle's matmul: the TPU default is one bf16 pass and the
    # comparison is fp32-tight (PERF_GUIDE rule 10 / TPU_SUITE.md run 1)
    with jax.default_matmul_precision("float32"):
        r_v, r_d = jax.grad(dense_loss, argnums=(0, 1))(jnp.asarray(vals),
                                                        dense)
    np.testing.assert_allclose(np.asarray(g_d), np.asarray(r_d),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g_v), np.asarray(r_v),
                               rtol=2e-4, atol=2e-4)


def test_chunked_survives_jit_with_sparse_argument(monkeypatch):
    _force(monkeypatch, 4)
    rowptr, col, vals = _powerlaw_csr(seed=21)
    sp = SparseTensor.from_csr(rowptr, col, jnp.asarray(vals), (1200, 500))
    if sp.storage.ell_chunked(24, 4) is None:
        pytest.skip("structure did not admit an ELL plan")
    rng = np.random.default_rng(23)
    dense = jnp.asarray(rng.standard_normal((500, 24)).astype(np.float32))

    @jax.jit
    def f(s, x):
        return spmm(s, x, "sum", Algorithm.PALLAS_ROW_TILE)

    out = f(sp, dense)
    ref = spmm_oracle(rowptr, col, vals, np.asarray(dense), "sum")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_hybrid_residue_chunked(monkeypatch):
    _force(monkeypatch, 4)
    from tests.test_hybrid import clustered_csr

    rowptr, col, vals = clustered_csr()
    sp = SparseTensor.from_csr(rowptr, col, jnp.asarray(vals),
                               (1500, 1500))
    plan = sp.storage.ell_plan()
    if not isinstance(plan, HybridPlan):
        pytest.skip("clustered fixture no longer selects hybrid")
    cp = sp.storage.ell_chunked(64, 4)
    assert cp is not None and isinstance(cp, HybridPlan)
    assert isinstance(cp.ell, ColChunkedEllPlan)
    rng = np.random.default_rng(31)
    dense = jnp.asarray(rng.standard_normal((1500, 32)).astype(np.float32))
    out = spmm(sp, dense, "sum", Algorithm.PALLAS_ROW_TILE)
    ref = spmm_oracle(rowptr, col, vals, np.asarray(dense), "sum")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)

    # gradient exercises the chunked transpose plan (ell_t)
    def loss(dense_):
        return jnp.sum(spmm(sp, dense_, "sum", Algorithm.PALLAS_ROW_TILE)
                       ** 2)

    g = jax.grad(loss)(dense)
    coo_r = np.repeat(np.arange(1500), np.diff(rowptr))

    def dense_loss(dense_):
        a = jnp.zeros((1500, 1500), jnp.float32)
        a = a.at[jnp.asarray(coo_r), jnp.asarray(col)].add(
            jnp.asarray(vals))
        return jnp.sum((a @ dense_) ** 2)

    # pin the oracle's matmul (TPU default is one bf16 pass; rule 10)
    with jax.default_matmul_precision("float32"):
        r = jax.grad(dense_loss)(dense)
    np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=2e-3,
                               atol=2e-3)


def test_maxmin_unaffected_by_chunk_env(monkeypatch):
    """MAX/MIN must keep riding the UNCHUNKED plan (argmax residuals)."""
    _force(monkeypatch, 4)
    rowptr, col, vals = _powerlaw_csr(seed=41)
    sp = SparseTensor.from_csr(rowptr, col, jnp.asarray(vals), (1200, 500))
    rng = np.random.default_rng(43)
    dense = jnp.asarray(rng.standard_normal((500, 16)).astype(np.float32))
    out = spmm(sp, dense, "max", Algorithm.AUTO)
    ref = spmm_oracle(rowptr, col, vals, np.asarray(dense), "max")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_auto_refuses_chunking_small_tables():
    """Without the env override, small graphs never build chunked plans."""
    rowptr, col, vals = _powerlaw_csr(seed=51)
    sp = SparseTensor.from_csr(rowptr, col, jnp.asarray(vals), (1200, 500))
    assert sp.storage.ell_chunked(64, 4) is None


def test_gspmm_tier_fast_rides_chunked_plan(monkeypatch):
    """gspmm's hybrid tier-fast SUM/MEAN delegation must pick up the
    chunked plan the same way public spmm does."""
    _force(monkeypatch, 4)
    from dgsparse_tpu.ops.gspmm import ComputeOp, gspmm

    from tests.test_hybrid import clustered_csr

    rowptr, col, vals = clustered_csr()
    sp = SparseTensor.from_csr(rowptr, col, jnp.asarray(vals),
                               (1500, 1500))
    if not isinstance(sp.storage.ell_plan(), HybridPlan):
        pytest.skip("clustered fixture no longer selects hybrid")
    assert sp.storage.ell_chunked(32, 4) is not None
    rng = np.random.default_rng(61)
    dense = jnp.asarray(rng.standard_normal((1500, 32)).astype(np.float32))
    # per-edge reference (the fixture is a multigraph — dense-matrix
    # formulations undercount duplicate edges)
    coo_r = np.repeat(np.arange(1500), np.diff(rowptr))
    d_np = np.asarray(dense)
    ref_mul = np.zeros((1500, 32), np.float32)
    np.add.at(ref_mul, coo_r, d_np[col] * vals[:, None])
    ref_add = np.zeros((1500, 32), np.float32)
    np.add.at(ref_add, coo_r, d_np[col] + vals[:, None])
    for compute, ref in ((ComputeOp.MUL, ref_mul),
                         (ComputeOp.ADD, ref_add)):
        out = gspmm(sp, dense, "sum", compute)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4,
                                   atol=2e-4)
