"""SparseTensor/Storage container tests (reference: test_csr2csr.py + the
Storage invariants in dgsparse/storage.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from dgsparse_tpu import SparseTensor
from dgsparse_tpu.core.transform import csr2csc, coo2csr, expand_rowptr
from dgsparse_tpu.utils.testing import random_csr


def _random_scipy(m=50, n=40, seed=3):
    rowptr, col, vals = random_csr(m, n, avg_degree=5.0, seed=seed)
    return sp.csr_matrix((vals, col, rowptr), shape=(m, n))


def test_csr2csc_vs_scipy():
    mat = _random_scipy()
    csc = mat.tocsc()
    colptr, row, vals_t, perm = csr2csc(
        jnp.asarray(mat.indptr, jnp.int32),
        jnp.asarray(mat.indices, jnp.int32),
        jnp.asarray(mat.data),
        num_cols=mat.shape[1],
    )
    np.testing.assert_array_equal(np.asarray(colptr), csc.indptr)
    np.testing.assert_array_equal(np.asarray(row), csc.indices)
    np.testing.assert_allclose(np.asarray(vals_t), csc.data, rtol=1e-6)


def test_storage_csc_cache_matches_scipy():
    mat = _random_scipy(seed=11)
    st = SparseTensor.from_scipy(mat).storage
    csc = mat.tocsc()
    np.testing.assert_array_equal(np.asarray(st.colptr()), csc.indptr)
    np.testing.assert_array_equal(np.asarray(st.row()), csc.indices)
    vals_t = np.asarray(st.values())[np.asarray(st.csr2csc())]
    np.testing.assert_allclose(vals_t, csc.data, rtol=1e-6)


def test_expand_rowptr_with_empty_rows():
    rowptr = jnp.asarray([0, 2, 2, 5, 5], jnp.int32)
    row = expand_rowptr(rowptr, 5)
    np.testing.assert_array_equal(np.asarray(row), [0, 0, 2, 2, 2])


def test_coo2csr_roundtrip():
    mat = _random_scipy(seed=5)
    coo = mat.tocoo()
    perm_in = np.random.default_rng(0).permutation(coo.nnz)
    rowptr, col, vals, _ = coo2csr(
        jnp.asarray(coo.row[perm_in], jnp.int32),
        jnp.asarray(coo.col[perm_in], jnp.int32),
        jnp.asarray(coo.data[perm_in]),
        num_rows=mat.shape[0],
    )
    np.testing.assert_array_equal(np.asarray(rowptr), mat.indptr)
    # Within-row column order may differ after an unstable-source COO; check
    # the matrix is identical.
    back = sp.csr_matrix((np.asarray(vals), np.asarray(col),
                          np.asarray(rowptr)), shape=mat.shape)
    assert (back != mat).nnz == 0


def test_to_dense_and_from_dense():
    mat = _random_scipy(seed=7)
    st = SparseTensor.from_scipy(mat)
    np.testing.assert_allclose(np.asarray(st.to_dense()), mat.toarray(),
                               rtol=1e-6)
    st2 = SparseTensor.from_dense(mat.toarray())
    np.testing.assert_allclose(np.asarray(st2.to_dense()), mat.toarray(),
                               rtol=1e-6)


def test_transpose():
    mat = _random_scipy(seed=9)
    st = SparseTensor.from_scipy(mat)
    t = st.t()
    assert t.sparse_sizes() == (mat.shape[1], mat.shape[0])
    np.testing.assert_allclose(np.asarray(t.to_dense()), mat.T.toarray(),
                               rtol=1e-6)


def test_values_or_ones():
    mat = _random_scipy(seed=13)
    st = SparseTensor.from_csr(
        jnp.asarray(mat.indptr, jnp.int32), jnp.asarray(mat.indices, jnp.int32)
    )
    assert not st.has_value
    np.testing.assert_array_equal(np.asarray(st.values_or_ones()),
                                  np.ones(mat.nnz, np.float32))


def test_pytree_flatten_roundtrip():
    mat = _random_scipy(seed=15)
    st = SparseTensor.from_scipy(mat)
    leaves, treedef = jax.tree_util.tree_flatten(st)
    st2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert st2.sparse_sizes() == st.sparse_sizes()
    assert st2.has_value == st.has_value
    np.testing.assert_array_equal(np.asarray(st2.storage.col()),
                                  np.asarray(st.storage.col()))


def test_build_plans_false():
    """Lean mode: no Pallas plans, ops run on XLA paths (the memory lever
    for 100M+-edge graphs: plans cost ~21 B/edge on top of CSR+CSC)."""
    from dgsparse_tpu import Algorithm, spmm
    from dgsparse_tpu.utils.testing import random_csr, spmm_oracle

    rowptr, col, vals = random_csr(900, 800, avg_degree=6, seed=13)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(900, 800),
                               build_plans=False)
    assert sp.storage.plan() is None
    assert sp.storage.plan(transpose=True) is None
    assert sp.storage.ell_plan() is None
    assert sp.storage.bell_plan() is None
    rng = np.random.default_rng(14)
    dense = rng.standard_normal((800, 8)).astype(np.float32)
    for reduce in ("sum", "mean", "max"):
        out = spmm(sp, jnp.asarray(dense), reduce)
        ref = spmm_oracle(rowptr, col, vals, dense, reduce)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4,
                                   atol=1e-4)
    # explicit Pallas request degrades gracefully to XLA (no plan exists)
    out = spmm(sp, jnp.asarray(dense), "sum", Algorithm.PALLAS_EDGE_TILE)
    np.testing.assert_allclose(
        np.asarray(out), spmm_oracle(rowptr, col, vals, dense, "sum"),
        rtol=1e-4, atol=1e-4)
    # structure ops still shared through set_values / t()
    g = jax.grad(lambda d: (spmm(sp.t(), d, "sum")**2).sum())(
        jnp.asarray(rng.standard_normal((900, 8)).astype(np.float32)))
    assert bool(jnp.isfinite(g).all())


def test_build_plans_ell_light_mode():
    """build_plans='ell' keeps only the ELL-family forward plan (the
    100M-edge scale mode: ~9 B/edge instead of ~33)."""
    import numpy as np

    from dgsparse_tpu import Algorithm, spmm
    from dgsparse_tpu.utils.testing import random_csr, spmm_oracle

    rowptr, col, vals = random_csr(600, 600, avg_degree=8.0, seed=21,
                                   skew=1.2)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(600, 600),
                               build_plans="ell")
    st = sp.storage
    assert st.plan() is None and st.plan(transpose=True) is None
    assert st.bell_plan() is None
    assert st.ell_plan() is not None
    x = jnp.asarray(np.random.default_rng(22)
                    .standard_normal((600, 16)).astype(np.float32))
    out = spmm(sp, x, "sum", Algorithm.PALLAS_ROW_TILE)
    ref = spmm_oracle(rowptr, col, vals, np.asarray(x), "sum")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_build_plans_esc_middle_tier():
    """build_plans='esc' keeps only the ESC edge-tile fwd+bwd plans (~60 %
    of full plan memory) — the middle tier for training workloads that
    need the transpose plan but not the ELL/hybrid/BELL family."""
    import numpy as np

    from dgsparse_tpu import Algorithm, spmm
    from dgsparse_tpu.utils.testing import random_csr, spmm_oracle

    rowptr, col, vals = random_csr(600, 600, avg_degree=8.0, seed=23,
                                   skew=1.2)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(600, 600),
                               build_plans="esc")
    st = sp.storage
    assert st.plan() is not None and st.plan(transpose=True) is not None
    assert st.ell_plan() is None
    assert st.bell_plan() is None
    rng = np.random.default_rng(24)
    x = jnp.asarray(rng.standard_normal((600, 16)).astype(np.float32))
    out = spmm(sp, x, "sum", Algorithm.PALLAS_EDGE_TILE)
    ref = spmm_oracle(rowptr, col, vals, np.asarray(x), "sum")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
    # backward rides the ESC transpose plan
    g = jax.grad(lambda d: (spmm(sp, d, "sum",
                                 Algorithm.PALLAS_EDGE_TILE)**2).sum())(x)
    gref = jax.grad(lambda d: (spmm(sp, d, "sum",
                                    Algorithm.XLA_SEGMENT)**2).sum())(x)
    # atol covers fp32 accumulation-order noise on grad values of
    # magnitude ~1e2 (measured max abs diff 1.1e-3)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref),
                               rtol=1e-4, atol=5e-3)
    # explicit ROW_TILE request degrades gracefully (no ELL plan)
    out = spmm(sp, x, "sum", Algorithm.PALLAS_ROW_TILE)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
