"""Pallas SDDMM kernel vs oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dgsparse_tpu.core.planner import build_edge_tile_plan
from dgsparse_tpu.kernels.pallas_sddmm import sddmm_esc
from dgsparse_tpu.ops.types import ReduceOp
from dgsparse_tpu.utils.testing import random_csr, sddmm_oracle


@pytest.mark.parametrize("feat", [32, 100])
@pytest.mark.parametrize("reduce", [ReduceOp.SUM, ReduceOp.MEAN])
def test_sddmm_esc(feat, reduce):
    m, n = 260, 190
    rowptr, col, _ = random_csr(m, n, avg_degree=5.0, seed=4)
    plan = build_edge_tile_plan(rowptr, col, n)
    rng = np.random.default_rng(5)
    d1 = rng.standard_normal((m, feat)).astype(np.float32)
    d2 = rng.standard_normal((n, feat)).astype(np.float32)
    degrees = jnp.asarray(np.diff(rowptr))
    out = sddmm_esc(plan, jnp.asarray(d1), jnp.asarray(d2), reduce, degrees)
    ref = sddmm_oracle(rowptr, col, d1, d2,
                       "mean" if reduce == ReduceOp.MEAN else "sum")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_inv_eperm_roundtrip():
    rowptr, col, _ = random_csr(150, 120, avg_degree=4.0, seed=7)
    plan = build_edge_tile_plan(rowptr, col, 120)
    # slot values written in plan order, read back in edge order = identity
    slot_vals = np.asarray(plan.eperm).astype(np.float32)
    edge_vals = slot_vals[np.asarray(plan.inv_eperm)]
    np.testing.assert_array_equal(edge_vals, np.arange(len(col)))
