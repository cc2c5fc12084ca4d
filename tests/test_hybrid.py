"""Hybrid BELL+ELL schedule: dense cells on the MXU kernel, residue on
bucketed ELL (no reference counterpart — plan-time structure split)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgsparse_tpu import Algorithm, SparseTensor, spmm
from dgsparse_tpu.core.planner import HybridPlan, build_hybrid_plan
from dgsparse_tpu.utils.testing import spmm_oracle


def clustered_csr(m=1500, n=1500, deg=40, comm=150, intra=0.8, seed=0):
    rng = np.random.default_rng(seed)
    degs = np.maximum(rng.poisson(deg, m), 0).astype(np.int64)
    degs[::17] = 0  # some empty rows
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
    vals = rng.standard_normal(nnz).astype(np.float32)
    return rowptr.astype(np.int32), col, vals


def test_hybrid_plan_built_and_partitions_edges():
    rowptr, col, vals = clustered_csr()
    plan = build_hybrid_plan(rowptr, col, 1500)
    assert isinstance(plan, HybridPlan)
    assert plan.dense_fraction >= 0.3
    # every edge appears exactly once across the three tiers
    parts = []
    if plan.bell is not None:
        be = np.asarray(plan.bell.eperm)
        parts.append(be[be >= 0])
    if plan.cells is not None:
        parts.append(np.asarray(plan.cells.eperm.np))
    ee = np.asarray(plan.ell.eperm)
    parts.append(ee[ee >= 0])
    ids = np.concatenate(parts)
    np.testing.assert_array_equal(np.sort(ids), np.arange(len(col)))
    # clustered test graph: communities are dense enough to materialize
    assert plan.cells is not None and plan.cells.num_cells > 0
    # dense-cell slots are sorted (segment-sum contract)
    slot = np.asarray(plan.cells.slot.np)
    assert np.all(np.diff(slot) >= 0)


def test_hybrid_plan_none_on_sparse_graph():
    rng = np.random.default_rng(1)
    m = n = 3000
    deg = np.full(m, 4, np.int64)
    col = rng.integers(0, n, int(deg.sum())).astype(np.int32)
    rowptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    assert build_hybrid_plan(rowptr, col, n) is None


@pytest.mark.parametrize("reduce", ["sum", "mean"])
@pytest.mark.parametrize("has_value", [True, False])
def test_hybrid_forward_matches_oracle(reduce, has_value):
    rowptr, col, vals = clustered_csr(seed=2)
    sp = SparseTensor.from_csr(
        jnp.asarray(rowptr), jnp.asarray(col),
        jnp.asarray(vals) if has_value else None, sparse_sizes=(1500, 1500))
    assert isinstance(sp.storage.ell_plan(), HybridPlan)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1500, 24)).astype(np.float32)
    out = spmm(sp, jnp.asarray(x), reduce, Algorithm.PALLAS_ROW_TILE)
    v = vals if has_value else np.ones(len(col), np.float32)
    ref = spmm_oracle(rowptr, col, v, x, reduce)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_hybrid_grads_match_xla():
    rowptr, col, vals = clustered_csr(seed=4)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(1500, 1500))
    assert isinstance(sp.storage.ell_plan(), HybridPlan)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1500, 16)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((1500, 16)).astype(np.float32))

    def loss(v, d, alg):
        return jnp.vdot(spmm(sp.set_values(v), d, "sum", alg), ct)

    gh = jax.grad(lambda v, d: loss(v, d, Algorithm.PALLAS_ROW_TILE),
                  argnums=(0, 1))(jnp.asarray(vals), x)
    gx = jax.grad(lambda v, d: loss(v, d, Algorithm.XLA_SEGMENT),
                  argnums=(0, 1))(jnp.asarray(vals), x)
    for a, b in zip(gh, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_hybrid_maxmin_falls_back_correctly():
    """MAX on a hybrid-planned tensor must not hit the ELL maxmin path."""
    rowptr, col, vals = clustered_csr(seed=6)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(1500, 1500))
    assert isinstance(sp.storage.ell_plan(), HybridPlan)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((1500, 8)).astype(np.float32)
    out = spmm(sp, jnp.asarray(x), "max", Algorithm.PALLAS_ROW_TILE)
    ref = spmm_oracle(rowptr, col, vals, x, "max")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_native_cell_split_matches_numpy():
    """The C++ counting-sort cell split (native/dgsparse_host.cpp
    dg_cell_split_*) reproduces the numpy twin's tiering and slot layout
    exactly."""
    from dgsparse_tpu import native
    from dgsparse_tpu.core.planner import build_dense_cell_plan

    if not native.available():
        pytest.skip("native lib unavailable")
    rowptr, col, _ = clustered_csr(m=2000, n=2000, deg=60, comm=160, seed=9)
    m = n = 2000
    nat = native.cell_split(rowptr, col, m, n, 128, 128, 96, 768, 65536)
    assert nat is not None
    d_slot, d_eperm, cell_rb, cell_cw, bell_ids, res_ids = nat

    # numpy twin: classify cells by count
    deg_ = np.diff(rowptr)
    coo_row = np.repeat(np.arange(m, dtype=np.int64), deg_)
    ncw = -(-n // 128)
    cell = (coo_row // 128) * ncw + col.astype(np.int64) // 128
    counts = np.bincount(cell, minlength=-(-m // 128) * ncw)
    tier = np.where(counts >= 768, 2, np.where(counts >= 96, 1, 0))
    et = tier[cell]
    np.testing.assert_array_equal(np.sort(bell_ids),
                                  np.nonzero(et == 1)[0])
    np.testing.assert_array_equal(np.sort(res_ids),
                                  np.nonzero(et == 0)[0])
    sel = np.nonzero(tier == 2)[0]
    np.testing.assert_array_equal(cell_rb, sel // ncw)
    np.testing.assert_array_equal(cell_cw, sel % ncw)
    # slot layout identical to the numpy builder (stable sort by slot)
    mat_edges = np.nonzero(et == 2)[0]
    ref = build_dense_cell_plan(coo_row[mat_edges], col[mat_edges],
                                mat_edges, sel, ncw, 128, 128, m, n,
                                len(col))
    np.testing.assert_array_equal(d_slot, ref.slot.np)
    np.testing.assert_array_equal(d_eperm, ref.eperm.np)


def test_hybrid_cached_values_backward():
    """d_dense through the vslot-cached hybrid transpose path (concrete
    values on the Storage → cached cells + ell_t slot weights) matches the
    XLA backward."""
    rowptr, col, vals = clustered_csr(seed=12)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(1500, 1500))
    hp = sp.storage.ell_plan()
    assert isinstance(hp, HybridPlan) and hp.cells is not None
    assert hp.ell_t is not None
    vs = sp.storage.vslot()
    assert vs is not None and vs["ell"]["cells"] is not None
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((1500, 16)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((1500, 16)).astype(np.float32))

    def loss(d, alg):
        return jnp.vdot(spmm(sp, d, "sum", alg), ct)

    gh = jax.grad(lambda d: loss(d, Algorithm.PALLAS_ROW_TILE))(x)
    gx = jax.grad(lambda d: loss(d, Algorithm.XLA_SEGMENT))(x)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gx),
                               rtol=1e-3, atol=1e-3)
