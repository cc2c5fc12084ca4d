"""Pallas ESC SpMM kernel vs oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgsparse_tpu import Algorithm, SparseTensor, spmm
from dgsparse_tpu.core.planner import build_edge_tile_plan
from dgsparse_tpu.kernels.pallas_spmm import segment_matmul, spmm_esc
from dgsparse_tpu.utils.testing import random_csr, spmm_oracle


def make(m, n, feat, seed=0, avg_degree=6.0, has_value=True):
    rowptr, col, values = random_csr(m, n, avg_degree=avg_degree, seed=seed)
    rng = np.random.default_rng(seed + 1)
    dense = rng.standard_normal((n, feat)).astype(np.float32)
    sp = SparseTensor.from_csr(
        jnp.asarray(rowptr), jnp.asarray(col),
        jnp.asarray(values) if has_value else None,
        sparse_sizes=(m, n))
    return sp, rowptr, col, values if has_value else None, dense


def test_plan_invariants():
    rowptr, col, _ = random_csr(300, 250, avg_degree=5.0, seed=3)
    plan = build_edge_tile_plan(rowptr, col, 250, edge_tile=128,
                                row_block=64)
    assert plan.num_tiles * plan.edge_tile == int(plan.cols.shape[0])
    # every tile belongs to one row block, nondecreasing
    rb = np.asarray(plan.tile_rb)
    assert (np.diff(rb) >= 0).all()
    # every row block appears at least once (zero-init guarantee)
    assert set(rb.tolist()) == set(range(plan.num_row_blocks))
    # eperm maps plan slots back to CSR edges exactly once
    ep = np.asarray(plan.eperm)
    real = ep[ep >= 0]
    assert sorted(real.tolist()) == list(range(len(col)))
    # lrow of real slots within block bounds; padding slots out of range
    lrow = np.asarray(plan.lrow)
    assert (lrow[ep >= 0] >= 0).all()
    assert (lrow[ep >= 0] < plan.row_block).all()
    assert (lrow[ep < 0] == plan.row_block).all()
    # cols of real slots match the CSR cols
    np.testing.assert_array_equal(np.asarray(plan.cols)[ep >= 0],
                                  col[real])


def test_segment_matmul_matches_segment_sum():
    rng = np.random.default_rng(0)
    rowptr, col, _ = random_csr(200, 100, avg_degree=4.0, seed=1)
    plan = build_edge_tile_plan(rowptr, col, 100, edge_tile=128,
                                row_block=128)
    te = plan.num_tiles * plan.edge_tile
    contrib = rng.standard_normal((te, 128)).astype(np.float32)
    contrib[np.asarray(plan.eperm) < 0] = 0
    out = segment_matmul(jnp.asarray(contrib), plan.lrow, plan.tile_rb,
                         plan.num_tiles, plan.edge_tile, plan.row_block,
                         plan.num_rows)
    rows = np.repeat(np.asarray(plan.tile_rb), plan.edge_tile) * \
        plan.row_block + np.asarray(plan.lrow)
    real = np.asarray(plan.eperm) >= 0
    ref = np.zeros((plan.num_rows, 128), np.float32)
    np.add.at(ref, rows[real], contrib[real])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("feat", [32, 100])
@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_esc_forward(feat, reduce):
    sp, rowptr, col, values, dense = make(260, 190, feat, seed=5)
    out = spmm(sp, jnp.asarray(dense), reduce,
               Algorithm.PALLAS_EDGE_TILE)
    ref = spmm_oracle(rowptr, col, values, dense, reduce)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_esc_forward_no_value():
    sp, rowptr, col, _, dense = make(150, 150, 64, seed=7, has_value=False)
    out = spmm(sp, jnp.asarray(dense), "sum", Algorithm.PALLAS_EDGE_TILE)
    ref = spmm_oracle(rowptr, col, None, dense, "sum")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_esc_backward_matches_xla_path():
    sp, rowptr, col, values, dense = make(180, 140, 32, seed=9)
    rng = np.random.default_rng(10)
    ct = jnp.asarray(rng.standard_normal((180, 32)).astype(np.float32))

    def loss(v, d, alg):
        return jnp.vdot(spmm(sp.set_values(v), d, "sum", alg), ct)

    gv_p, gd_p = jax.grad(lambda v, d: loss(v, d, Algorithm.PALLAS_EDGE_TILE),
                          argnums=(0, 1))(jnp.asarray(values),
                                          jnp.asarray(dense))
    gv_x, gd_x = jax.grad(lambda v, d: loss(v, d, Algorithm.XLA_SEGMENT),
                          argnums=(0, 1))(jnp.asarray(values),
                                          jnp.asarray(dense))
    np.testing.assert_allclose(np.asarray(gv_p), np.asarray(gv_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gd_p), np.asarray(gd_x),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("reduce", ["max", "min"])
def test_esc_maxmin_kernel(reduce):
    sp, rowptr, col, values, dense = make(230, 170, 48, seed=11)
    out = spmm(sp, jnp.asarray(dense), reduce, Algorithm.PALLAS_EDGE_TILE)
    ref = spmm_oracle(rowptr, col, values, dense, reduce)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-4, atol=5e-4)


@pytest.mark.parametrize("reduce", ["max", "min"])
def test_esc_maxmin_backward_matches_xla(reduce):
    # Integer-valued data: argmax ties are EXACT, so both paths break them
    # identically (earliest edge) — float near-ties would legitimately pick
    # different winners across kernels.
    sp, rowptr, col, values, dense = make(150, 130, 24, seed=13)
    rng = np.random.default_rng(14)
    values = rng.integers(1, 6, len(col)).astype(np.float32)
    dense = rng.integers(-4, 5, dense.shape).astype(np.float32)
    ct = jnp.asarray(rng.standard_normal((150, 24)).astype(np.float32))

    def loss(v, d, alg):
        return jnp.vdot(spmm(sp.set_values(v), d, reduce, alg), ct)

    gv_p, gd_p = jax.grad(
        lambda v, d: loss(v, d, Algorithm.PALLAS_EDGE_TILE),
        argnums=(0, 1))(jnp.asarray(values), jnp.asarray(dense))
    gv_x, gd_x = jax.grad(
        lambda v, d: loss(v, d, Algorithm.XLA_SEGMENT),
        argnums=(0, 1))(jnp.asarray(values), jnp.asarray(dense))
    np.testing.assert_allclose(np.asarray(gv_p), np.asarray(gv_x),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gd_p), np.asarray(gd_x),
                               rtol=1e-3, atol=1e-3)


def test_esc_maxmin_empty_rows_zero():
    rowptr = np.array([0, 0, 3, 3, 5], np.int32)
    col = np.array([0, 1, 2, 1, 3], np.int32)
    vals = np.array([-1.0, -2.0, -3.0, 2.0, 4.0], np.float32)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(4, 4))
    dense = jnp.asarray(np.ones((4, 8), np.float32))
    # plan exists (tiny nnz -> python planner); force pallas
    out = spmm(sp, dense, "max", Algorithm.PALLAS_EDGE_TILE)
    ref = spmm_oracle(rowptr, col, vals, np.asarray(dense), "max")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)
    assert np.allclose(np.asarray(out)[0], 0) and \
        np.allclose(np.asarray(out)[2], 0)
