"""Plan-slot value caches (Storage._build_vslot): cached and uncached
paths must agree exactly, including after set_values and under autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgsparse_tpu import Algorithm, SparseTensor, spmm
from dgsparse_tpu.utils.testing import random_csr, spmm_oracle


def _graph(seed=0, m=600, n=500, deg=6.0, skew=1.0):
    rowptr, col, vals = random_csr(m, n, avg_degree=deg, seed=seed,
                                   skew=skew)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(m, n))
    return sp, rowptr, col, vals


def test_vslot_built_and_matches_plans():
    sp, *_ = _graph()
    st = sp.storage
    vs = st.vslot()
    assert vs is not None
    if st.plan() is not None:
        assert vs["esc"].shape[0] == st.plan().padded_edges
        # slot values equal values[eperm] with 0 padding
        ep = np.asarray(jax.device_get(st.plan().eperm))
        vals = np.asarray(jax.device_get(st.values()))
        expect = np.where(ep >= 0, vals[np.maximum(ep, 0)], 0)
        np.testing.assert_array_equal(np.asarray(vs["esc"]), expect)
    # csc cache equals values[perm]
    perm = np.asarray(jax.device_get(st.csr2csc()))
    vals = np.asarray(jax.device_get(st.values()))
    np.testing.assert_array_equal(np.asarray(vs["csc"]), vals[perm])


@pytest.mark.parametrize("alg", [Algorithm.PALLAS_ROW_TILE,
                                 Algorithm.PALLAS_EDGE_TILE,
                                 Algorithm.XLA_SEGMENT])
@pytest.mark.parametrize("reduce", ["sum", "mean", "max"])
def test_cached_path_matches_oracle(alg, reduce):
    sp, rowptr, col, vals = _graph(seed=3, skew=1.3)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((500, 32)).astype(np.float32))
    out = spmm(sp, x, reduce, alg)
    ref = spmm_oracle(rowptr, col, vals, np.asarray(x), reduce)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_set_values_rebuilds_cache():
    sp, rowptr, col, _ = _graph(seed=5)
    rng = np.random.default_rng(6)
    new_vals = rng.standard_normal(sp.nnz).astype(np.float32)
    sp2 = sp.set_values(jnp.asarray(new_vals))
    x = jnp.asarray(rng.standard_normal((500, 16)).astype(np.float32))
    out = spmm(sp2, x, "sum", Algorithm.PALLAS_ROW_TILE)
    ref = spmm_oracle(rowptr, col, new_vals, np.asarray(x), "sum")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
    # stale-cache guard: the original tensor still computes with ITS values
    out0 = spmm(sp, x, "sum", Algorithm.PALLAS_ROW_TILE)
    vals0 = np.asarray(jax.device_get(sp.storage.values()))
    ref0 = spmm_oracle(rowptr, col, vals0, np.asarray(x), "sum")
    np.testing.assert_allclose(np.asarray(out0), ref0, rtol=1e-4, atol=1e-4)


def test_traced_values_bypass_cache_with_exact_grads():
    """Gradients wrt values must flow even though the cached forward never
    reads the traced values array (custom VJP computes d_values
    explicitly)."""
    sp, rowptr, col, vals = _graph(seed=7)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((500, 8)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((600, 8)).astype(np.float32))

    def loss(v):
        return jnp.vdot(
            spmm(sp.set_values(v), x, "sum", Algorithm.PALLAS_ROW_TILE), ct)

    g = jax.grad(loss)(jnp.asarray(vals))
    # numeric check on a few entries
    v0 = np.asarray(vals)
    for i in (0, len(v0) // 2, len(v0) - 1):
        eps = 1e-3
        vp = v0.copy()
        vp[i] += eps
        vm = v0.copy()
        vm[i] -= eps
        fd = (float(loss(jnp.asarray(vp))) - float(loss(jnp.asarray(vm)))) \
            / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd, rtol=5e-2, atol=5e-2)


def test_cached_grads_match_uncached():
    """spmm with the storage's own values (cache active) must produce the
    same gradients as an identical tensor whose cache is disabled."""
    sp, rowptr, col, vals = _graph(seed=9, skew=1.5)
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal((500, 8)).astype(np.float32))
    ct_out = jnp.asarray(rng.standard_normal((600, 8)).astype(np.float32))

    def loss(sp_, x_):
        return jnp.vdot(spmm(sp_, x_, "sum", Algorithm.PALLAS_ROW_TILE),
                        ct_out)

    gx_cached = jax.grad(loss, argnums=1)(sp, x)
    sp_nc = sp.set_values(sp.storage.values())
    sp_nc.storage._vslot = None
    gx_plain = jax.grad(loss, argnums=1)(sp_nc, x)
    np.testing.assert_allclose(np.asarray(gx_cached), np.asarray(gx_plain),
                               rtol=1e-5, atol=1e-5)
