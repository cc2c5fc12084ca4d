"""ELL row-balance algorithm (PALLAS_ROW_TILE) on degree-regular graphs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgsparse_tpu import Algorithm, SparseTensor, spmm
from dgsparse_tpu.utils.testing import random_csr, spmm_oracle


def regular_graph(m=700, n=600, deg=8, seed=0):
    rng = np.random.default_rng(seed)
    col = np.stack([np.sort(rng.choice(n, deg, replace=False))
                    for _ in range(m)]).reshape(-1).astype(np.int32)
    rowptr = (np.arange(m + 1) * deg).astype(np.int32)
    vals = rng.standard_normal(m * deg).astype(np.float32)
    return rowptr, col, vals


def test_ell_plan_built_for_regular_graph():
    rowptr, col, vals = regular_graph()
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(700, 600))
    plan = sp.storage.ell_plan()
    assert plan is not None
    assert plan.k == 8
    assert plan.pad_ratio() == 1.0


@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_ell_forward(reduce):
    rowptr, col, vals = regular_graph(seed=1)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(700, 600))
    x = jnp.asarray(np.random.default_rng(2)
                    .standard_normal((600, 48)).astype(np.float32))
    out = spmm(sp, x, reduce, Algorithm.PALLAS_ROW_TILE)
    ref = spmm_oracle(rowptr, col, vals, np.asarray(x), reduce)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_ell_backward_matches_xla():
    rowptr, col, vals = regular_graph(seed=3)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(700, 600))
    x = jnp.asarray(np.random.default_rng(4)
                    .standard_normal((600, 16)).astype(np.float32))
    rng = np.random.default_rng(5)
    ct = jnp.asarray(rng.standard_normal((700, 16)).astype(np.float32))

    def loss(v, d, alg):
        return jnp.vdot(spmm(sp.set_values(v), d, "sum", alg), ct)

    ge = jax.grad(lambda v, d: loss(v, d, Algorithm.PALLAS_ROW_TILE),
                  argnums=(0, 1))(jnp.asarray(vals), x)
    gx = jax.grad(lambda v, d: loss(v, d, Algorithm.XLA_SEGMENT),
                  argnums=(0, 1))(jnp.asarray(vals), x)
    for a, b in zip(ge, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_irregular_graph_gets_bucketed_or_no_plan():
    from dgsparse_tpu.core.planner import (BucketedEllPlan, EllPlan,
                                           HybridPlan)
    from dgsparse_tpu.utils.testing import random_csr

    rowptr, col, vals = random_csr(800, 700, avg_degree=8.0, seed=7,
                                   skew=1.5)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(800, 700))
    plan = sp.storage.ell_plan()
    assert not isinstance(plan, EllPlan)  # not degree-regular
    if isinstance(plan, HybridPlan):      # dense-celled split is also fine
        assert plan.dense_fraction >= 0.3
    elif plan is not None:
        assert isinstance(plan, BucketedEllPlan)
        assert plan.pad_ratio() <= 2.0
    # ROW_TILE stays correct either way (bucketed ELL or ESC fallback)
    x = jnp.asarray(np.random.default_rng(8)
                    .standard_normal((700, 16)).astype(np.float32))
    out = spmm(sp, x, "sum", Algorithm.PALLAS_ROW_TILE)
    ref = spmm_oracle(rowptr, col, vals, np.asarray(x), "sum")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)

def test_bucketed_ell_on_irregular_graph():
    from dgsparse_tpu.core.planner import BucketedEllPlan
    from dgsparse_tpu.utils.testing import random_csr

    rowptr, col, vals = random_csr(900, 800, avg_degree=8.0, seed=11,
                                   skew=1.2)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(900, 800))
    plan = sp.storage.ell_plan()
    if not isinstance(plan, BucketedEllPlan):
        import pytest
        pytest.skip(f"pad ratio rejected bucketed plan: {plan}")
    x = jnp.asarray(np.random.default_rng(12)
                    .standard_normal((800, 32)).astype(np.float32))
    for reduce in ("sum", "mean"):
        out = spmm(sp, x, reduce, Algorithm.PALLAS_ROW_TILE)
        ref = spmm_oracle(rowptr, col, vals, np.asarray(x), reduce)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4,
                                   atol=1e-5)

    # backward matches XLA
    rng = np.random.default_rng(13)
    ct = jnp.asarray(rng.standard_normal((900, 32)).astype(np.float32))

    def loss(v, d, alg):
        return jnp.vdot(spmm(sp.set_values(v), d, "sum", alg), ct)

    gb = jax.grad(lambda v, d: loss(v, d, Algorithm.PALLAS_ROW_TILE),
                  argnums=(0, 1))(jnp.asarray(vals), x)
    gx = jax.grad(lambda v, d: loss(v, d, Algorithm.XLA_SEGMENT),
                  argnums=(0, 1))(jnp.asarray(vals), x)
    for a, b in zip(gb, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_gspmm_ell_direct():
    """Semiring ELL path (gspmm routes here on TPU AUTO)."""
    from dgsparse_tpu.kernels.pallas_spmm import gspmm_ell
    from dgsparse_tpu.ops.types import ComputeOp, ReduceOp
    from dgsparse_tpu.utils.testing import gspmm_oracle, random_csr

    rowptr, col, vals = random_csr(500, 450, avg_degree=8.0, seed=15,
                                   skew=1.0)
    vals = np.abs(vals) + 0.5
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(500, 450))
    plan = sp.storage.ell_plan()
    assert plan is not None
    x = np.random.default_rng(16).standard_normal((450, 24)).astype(
        np.float32)
    degrees = jnp.asarray(np.diff(rowptr))
    for cu in ("add", "sub", "mul", "div"):
        for rd in ("sum", "mean"):
            out = gspmm_ell(plan, jnp.asarray(vals), jnp.asarray(x),
                            ReduceOp(rd), ComputeOp(cu), degrees)
            ref = gspmm_oracle(rowptr, col, vals, x, rd, cu)
            np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4,
                                       atol=1e-5)


@pytest.mark.parametrize("reduce", ["max", "min"])
@pytest.mark.parametrize("regular", [True, False])
def test_ell_maxmin_forward(reduce, regular):
    """ELL K-axis max/min vs oracle (single-K and bucketed plans)."""
    from dgsparse_tpu.core.planner import build_bucketed_ell_plan, \
        build_ell_plan
    from dgsparse_tpu.kernels.pallas_spmm import spmm_ell_maxmin
    from dgsparse_tpu.ops.types import ReduceOp

    m, n, f = 150, 120, 24
    if regular:
        rowptr, col, values = random_csr(m, n, avg_degree=4, seed=40,
                                         skew=0.0)
        plan = build_ell_plan(rowptr, col, n)
    else:
        rowptr, col, values = random_csr(m, n, avg_degree=6, seed=41,
                                         skew=1.0)
        plan = build_bucketed_ell_plan(rowptr, col, n)
    rng = np.random.default_rng(42)
    dense = rng.standard_normal((n, f)).astype(np.float32)
    red = ReduceOp.MAX if reduce == "max" else ReduceOp.MIN
    out, arg = spmm_ell_maxmin(plan, jnp.asarray(values),
                               jnp.asarray(dense), red)
    ref = spmm_oracle(rowptr, col, values, dense, reduce)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("reduce", ["max", "min"])
@pytest.mark.parametrize("has_value", [True, False])
def test_ell_maxmin_grads_match_xla(reduce, has_value):
    """K-space winner backward == XLA edge-space backward (integer data =>
    exact ties, both must pick the earliest edge)."""
    m, n, f = 900, 800, 16
    rowptr, col, _ = random_csr(m, n, avg_degree=6, seed=43, skew=1.0)
    rng = np.random.default_rng(44)
    values = rng.integers(-3, 4, len(col)).astype(np.float32)
    dense = rng.integers(-3, 4, (n, f)).astype(np.float32)
    ct = jnp.asarray(rng.standard_normal((m, f)).astype(np.float32))
    sp = SparseTensor.from_csr(
        jnp.asarray(rowptr), jnp.asarray(col),
        jnp.asarray(values) if has_value else None, sparse_sizes=(m, n))
    assert sp.storage.ell_plan() is not None

    def loss(v, d, alg):
        s = sp.set_values(v) if has_value else sp
        return jnp.vdot(spmm(s, d, reduce, alg), ct)

    v0 = jnp.asarray(values)
    ge = jax.grad(lambda v, d: loss(v, d, Algorithm.PALLAS_ROW_TILE),
                  argnums=(0, 1))(v0, jnp.asarray(dense))
    gx = jax.grad(lambda v, d: loss(v, d, Algorithm.XLA_SEGMENT),
                  argnums=(0, 1))(v0, jnp.asarray(dense))
    # d_dense now rides the one-hot MXU segment matmul (hi/lo bf16 split,
    # ~fp32: worst-case ~1e-3 relative on cancellation-heavy sums) — the
    # same accuracy contract as the SUM Pallas paths. d_values stays exact.
    for a, b in zip(ge, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_ell_maxmin_empty_rows():
    rowptr = np.array([0, 0, 2, 2, 4], np.int32)
    col = np.array([1, 3, 0, 2], np.int32)
    values = np.array([2.0, -1.0, 3.0, 4.0], np.float32)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(values), sparse_sizes=(4, 4))
    rng = np.random.default_rng(0)
    dense = rng.standard_normal((4, 8)).astype(np.float32)
    out = spmm(sp, jnp.asarray(dense), "max", Algorithm.PALLAS_ROW_TILE)
    ref = spmm_oracle(rowptr, col, values, dense, "max")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(out)[0] == 0) and np.all(
        np.asarray(out)[2] == 0)


def test_bucketed_ell_chunked_gather_matches():
    """Tiny gather budget -> per-bucket row chunking; results must be
    identical to the unchunked path (Reddit-scale memory bound)."""
    from dgsparse_tpu.core.planner import build_bucketed_ell_plan
    from dgsparse_tpu.kernels import pallas_spmm as kp
    from dgsparse_tpu.ops.types import ReduceOp
    from dgsparse_tpu.utils.testing import random_csr, spmm_oracle

    rowptr, col, vals = random_csr(500, 400, avg_degree=7.0, seed=13,
                                   skew=1.4)
    plan = build_bucketed_ell_plan(rowptr, col, 400)
    x = jnp.asarray(np.random.default_rng(14)
                    .standard_normal((400, 16)).astype(np.float32))
    v = jnp.asarray(vals)
    ref = spmm_oracle(rowptr, col, vals, np.asarray(x), "sum")
    budget = kp._GATHER_BUDGET_BYTES
    try:
        kp._GATHER_BUDGET_BYTES = 64 * 16 * 4   # forces many chunks
        out = kp.spmm_bucketed_ell(plan, v, x, ReduceOp.SUM)
    finally:
        kp._GATHER_BUDGET_BYTES = budget
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_single_k_ell_chunked_gather_matches():
    """Tiny gather budget -> row chunking on the SINGLE-K EllPlan paths
    (spmm_ell SUM/MEAN, gspmm_ell, spmm_ell_maxmin): degree-regular
    100M-edge graphs land on these via AUTO and must never materialize the
    full [rows*K, F] gather buffer."""
    from dgsparse_tpu.core.planner import build_ell_plan
    from dgsparse_tpu.kernels import pallas_spmm as kp
    from dgsparse_tpu.ops.types import ComputeOp, ReduceOp
    from dgsparse_tpu.utils.testing import gspmm_oracle, spmm_oracle

    rowptr, col, vals = regular_graph(m=300, n=256, deg=6, seed=31)
    plan = build_ell_plan(rowptr, col, 256)
    assert plan is not None
    x = jnp.asarray(np.random.default_rng(32)
                    .standard_normal((256, 16)).astype(np.float32))
    v = jnp.asarray(vals)
    budget = kp._GATHER_BUDGET_BYTES
    try:
        kp._GATHER_BUDGET_BYTES = 40 * 16 * 4   # a few rows per chunk
        out_sum = kp.spmm_ell(plan, v, x, ReduceOp.SUM)
        out_gs = kp.gspmm_ell(plan, v, x, ReduceOp.SUM, ComputeOp.MUL)
        out_max, arg_max = kp.spmm_ell_maxmin(plan, v, x, ReduceOp.MAX)
    finally:
        kp._GATHER_BUDGET_BYTES = budget
    xs = np.asarray(x)
    np.testing.assert_allclose(np.asarray(out_sum),
                               spmm_oracle(rowptr, col, vals, xs, "sum"),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_gs),
                               gspmm_oracle(rowptr, col, vals, xs,
                                            "sum", "mul"),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_max),
                               spmm_oracle(rowptr, col, vals, xs, "max"),
                               rtol=1e-4, atol=1e-4)
    # arg layout: one [rows, F] block in plan row order, K-slot ids
    assert np.asarray(arg_max).shape == (plan.cols.shape[0], 16)


def test_lane_packed_ksum_matches_unpacked():
    """F<128 lane-packing (fold 128/F K-slots per 128-lane group,
    pallas_spmm._ksum_packed) == the unpacked broadcast-multiply form, on
    both ELL paths, fwd + grads, F in {32, 64}."""
    from dgsparse_tpu.core.planner import (build_bucketed_ell_plan,
                                           build_ell_plan)
    from dgsparse_tpu.kernels import pallas_spmm as kp
    from dgsparse_tpu.ops.types import ReduceOp
    from dgsparse_tpu.utils.testing import random_csr, spmm_oracle

    rowptr, col, vals = random_csr(700, 600, avg_degree=9.0, seed=21,
                                   skew=1.3)
    v = jnp.asarray(vals)
    for f in (32, 64):
        x = jnp.asarray(np.random.default_rng(22)
                        .standard_normal((600, f)).astype(np.float32))
        ref = spmm_oracle(rowptr, col, vals, np.asarray(x), "sum")
        bplan = build_bucketed_ell_plan(rowptr, col, 600)
        eplan = build_ell_plan(rowptr, col, 600)
        ct = jnp.asarray(np.random.default_rng(23)
                         .standard_normal((700, f)).astype(np.float32))

        def loss_b(v, d):
            return jnp.vdot(kp.spmm_bucketed_ell(bplan, v, d,
                                                 ReduceOp.SUM), ct)

        # jit everything: eager op-by-op dispatch of the bucketed path
        # costs ~12 s/call on CPU vs one sub-second compile
        try:
            kp.set_lane_pack(True)
            outs = [jax.jit(lambda v, x: kp.spmm_bucketed_ell(
                        bplan, v, x, ReduceOp.SUM))(v, x),
                    jax.jit(lambda v, x: kp.spmm_ell(
                        eplan, v, x, ReduceOp.SUM))(v, x)]
            gp = jax.jit(jax.grad(loss_b, argnums=(0, 1)))(v, x)
        finally:
            kp.set_lane_pack(False)
        gu = jax.jit(jax.grad(loss_b, argnums=(0, 1)))(v, x)
        for out in outs:
            np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4,
                                       atol=1e-4)
        for a, b in zip(gp, gu):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)
