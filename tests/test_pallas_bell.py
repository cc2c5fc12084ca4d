"""BELL (blocked-ELL, fully in-MXU) SpMM kernel vs oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgsparse_tpu import Algorithm, SparseTensor, spmm
from dgsparse_tpu.core.planner import build_bell_plan
from dgsparse_tpu.kernels.pallas_spmm import spmm_bell
from dgsparse_tpu.ops.types import ReduceOp
from dgsparse_tpu.utils.testing import random_csr, spmm_oracle


def make(m=300, n=260, feat=64, deg=40.0, seed=0):
    rowptr, col, values = random_csr(m, n, avg_degree=deg, seed=seed,
                                     skew=0.5)
    rng = np.random.default_rng(seed + 1)
    dense = rng.standard_normal((n, feat)).astype(np.float32)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(values), sparse_sizes=(m, n))
    return sp, rowptr, col, values, dense


def test_bell_plan_invariants():
    rowptr, col, _ = random_csr(300, 260, avg_degree=20.0, seed=1, skew=0.5)
    plan = build_bell_plan(rowptr, col, 260)
    ep = np.asarray(plan.eperm)
    real = ep[ep >= 0]
    assert sorted(real.tolist()) == list(range(len(col)))
    # each slot's reconstructed (row, col) matches the CSR entry
    rb = np.repeat(np.asarray(plan.tile_rb), plan.edge_tile)
    cw = np.repeat(np.asarray(plan.tile_cw), plan.edge_tile)
    rows = rb * plan.row_block + np.asarray(plan.lrow)
    cols = cw * plan.col_window + np.asarray(plan.lcol)
    coo_row = np.repeat(np.arange(300), np.diff(rowptr))
    mask = ep >= 0
    np.testing.assert_array_equal(rows[mask], coo_row[real])
    np.testing.assert_array_equal(cols[mask], col[real])
    assert (np.diff(np.asarray(plan.tile_rb)) >= 0).all()
    assert set(np.asarray(plan.tile_rb).tolist()) == set(
        range(plan.num_row_blocks))


@pytest.mark.parametrize("feat", [32, 100])
@pytest.mark.parametrize("reduce", [ReduceOp.SUM, ReduceOp.MEAN])
def test_bell_forward_direct(feat, reduce):
    # Build the plan directly: Storage now prefers the 3-tier hybrid on
    # this dense-ish structure and skips the full-graph BELL plan, but the
    # kernel itself is exercised by the hybrid's BELL tier and PALLAS_BELL.
    sp, rowptr, col, values, dense = make(feat=feat)
    plan = build_bell_plan(rowptr, col, 260)
    degrees = jnp.asarray(np.diff(rowptr))
    out = spmm_bell(plan, jnp.asarray(values), jnp.asarray(dense), reduce,
                    degrees)
    ref = spmm_oracle(rowptr, col, values, dense,
                      "mean" if reduce == ReduceOp.MEAN else "sum")
    # hi/lo split-matmul: ~2^-16 relative per term
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-4, atol=5e-4)


def test_bell_bf16_close():
    sp, rowptr, col, values, dense = make(feat=64, seed=3)
    plan = build_bell_plan(rowptr, col, 260)
    out = spmm_bell(plan, jnp.asarray(values), jnp.asarray(dense),
                    compute_dtype=jnp.bfloat16)
    ref = spmm_oracle(rowptr, col, values, dense, "sum")
    rel = np.abs(np.asarray(out) - ref) / (np.abs(ref) + 1)
    assert rel.max() < 0.08, rel.max()  # bf16 inputs: ~0.4% per product


def test_bell_through_op_and_backward():
    sp, rowptr, col, values, dense = make(seed=5)
    out = spmm(sp, jnp.asarray(dense), "sum", Algorithm.PALLAS_BELL)
    ref = spmm_oracle(rowptr, col, values, dense, "sum")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)

    rng = np.random.default_rng(7)
    ct = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))

    def loss(v, d, alg):
        return jnp.vdot(spmm(sp.set_values(v), d, "sum", alg), ct)

    gv_b, gd_b = jax.grad(lambda v, d: loss(v, d, Algorithm.PALLAS_BELL),
                          argnums=(0, 1))(jnp.asarray(values),
                                          jnp.asarray(dense))
    gv_x, gd_x = jax.grad(lambda v, d: loss(v, d, Algorithm.XLA_SEGMENT),
                          argnums=(0, 1))(jnp.asarray(values),
                                          jnp.asarray(dense))
    np.testing.assert_allclose(np.asarray(gv_b), np.asarray(gv_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gd_b), np.asarray(gd_x),
                               rtol=1e-4, atol=1e-4)


def test_bell_chunked_matches_unchunked():
    """Forced tiny chunk size -> multi-call BELL with block reordering;
    must equal the single-call kernel and the oracle (the Reddit-scale
    SMEM-prefetch path)."""
    from dgsparse_tpu.core import planner as P
    from dgsparse_tpu.kernels.pallas_spmm import spmm_bell
    from dgsparse_tpu.ops.types import ReduceOp
    from dgsparse_tpu.utils.testing import random_csr, spmm_oracle

    m = n = 700
    rowptr, col, vals = random_csr(m, n, avg_degree=40.0, seed=31,
                                   skew=0.6)
    plan_one = P.build_bell_plan(rowptr, col, n)
    assert plan_one.chunks == ()
    old = P._BELL_CHUNK_TILES
    try:
        P._BELL_CHUNK_TILES = 16
        plan_ch = P.build_bell_plan(rowptr, col, n)
    finally:
        P._BELL_CHUNK_TILES = old
    assert len(plan_ch.chunks) > 1
    x = jnp.asarray(np.random.default_rng(32)
                    .standard_normal((n, 16)).astype(np.float32))
    v = jnp.asarray(vals)
    ref = spmm_oracle(rowptr, col, vals, np.asarray(x), "sum")
    out1 = spmm_bell(plan_one, v, x, ReduceOp.SUM)
    out2 = spmm_bell(plan_ch, v, x, ReduceOp.SUM)
    np.testing.assert_allclose(np.asarray(out1), ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out2), ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-6, atol=1e-6)
