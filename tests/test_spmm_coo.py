"""COO-native SpMM vs the CSR oracle (+ shuffled edge order, grads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgsparse_tpu import spmm_coo
from dgsparse_tpu.utils.testing import random_csr, spmm_oracle

M, N, F = 190, 150, 24


def make(seed=0, shuffle=True):
    rowptr, col, vals = random_csr(M, N, avg_degree=5, seed=seed)
    row = np.repeat(np.arange(M, dtype=np.int32),
                    np.diff(rowptr).astype(np.int64))
    if shuffle:
        rng = np.random.default_rng(seed + 100)
        p = rng.permutation(len(col))
        row, col, vals = row[p], col[p], vals[p]
    rng = np.random.default_rng(seed + 1)
    dense = rng.standard_normal((N, F)).astype(np.float32)
    return rowptr, row, col, vals, dense


@pytest.mark.parametrize("reduce", ["sum", "mean", "max", "min"])
@pytest.mark.parametrize("shuffle", [False, True])
def test_forward(reduce, shuffle):
    rowptr, row, col, vals, dense = make(3, shuffle)
    out = spmm_coo(jnp.asarray(row), jnp.asarray(col), jnp.asarray(vals),
                   jnp.asarray(dense), M, reduce)
    # oracle on the sorted CSR view (order-invariant semantics)
    order = np.argsort(row, kind="stable")
    rp = np.zeros(M + 1, np.int32)
    np.add.at(rp, row + 1, 1)
    rp = np.cumsum(rp).astype(np.int32)
    ref = spmm_oracle(rp, col[order], vals[order], dense, reduce)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_no_values():
    rowptr, row, col, vals, dense = make(5)
    out = spmm_coo(jnp.asarray(row), jnp.asarray(col), None,
                   jnp.asarray(dense), M, "sum")
    order = np.argsort(row, kind="stable")
    rp = np.zeros(M + 1, np.int32)
    np.add.at(rp, row + 1, 1)
    rp = np.cumsum(rp).astype(np.int32)
    ref = spmm_oracle(rp, col[order], None, dense, "sum")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("reduce", ["sum", "mean", "max", "min"])
def test_grads_match_csr_path(reduce):
    from dgsparse_tpu import Algorithm, SparseTensor, spmm

    rowptr, row, col, vals, dense = make(7, shuffle=False)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col), None,
                               sparse_sizes=(M, N))
    rng = np.random.default_rng(11)
    ct = jnp.asarray(rng.standard_normal((M, F)).astype(np.float32))

    def loss_coo(v, d):
        return jnp.vdot(spmm_coo(jnp.asarray(row), jnp.asarray(col), v, d,
                                 M, reduce), ct)

    def loss_csr(v, d):
        return jnp.vdot(spmm(sp.set_values(v), d, reduce,
                             Algorithm.XLA_SEGMENT), ct)

    gv, gd = jax.grad(loss_coo, argnums=(0, 1))(jnp.asarray(vals),
                                                jnp.asarray(dense))
    gv_r, gd_r = jax.grad(loss_csr, argnums=(0, 1))(jnp.asarray(vals),
                                                    jnp.asarray(dense))
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gd_r),
                               rtol=1e-4, atol=1e-4)


def test_jit_and_traced_edges():
    """The whole point of the COO op: structure built UNDER jit."""
    rowptr, row, col, vals, dense = make(13)

    @jax.jit
    def f(row, col, vals, dense):
        return spmm_coo(row, col, vals, dense, M, "sum")

    out = f(jnp.asarray(row), jnp.asarray(col), jnp.asarray(vals),
            jnp.asarray(dense))
    order = np.argsort(row, kind="stable")
    rp = np.zeros(M + 1, np.int32)
    np.add.at(rp, row + 1, 1)
    rp = np.cumsum(rp).astype(np.int32)
    ref = spmm_oracle(rp, col[order], vals[order], dense, "sum")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_duplicate_edges_accumulate():
    row = jnp.asarray(np.array([0, 0, 1], np.int32))
    col = jnp.asarray(np.array([1, 1, 0], np.int32))
    vals = jnp.asarray(np.array([2.0, 3.0, 1.0], np.float32))
    dense = jnp.asarray(np.eye(2, 4, dtype=np.float32))
    out = np.asarray(spmm_coo(row, col, vals, dense, 2, "sum"))
    assert out[0, 1] == 5.0 and out[1, 0] == 1.0


def test_validation():
    rowptr, row, col, vals, dense = make(17)
    with pytest.raises(ValueError):
        spmm_coo(jnp.asarray(row[:-1]), jnp.asarray(col), None,
                 jnp.asarray(dense), M)
    with pytest.raises(ValueError):
        spmm_coo(jnp.asarray(row), jnp.asarray(col),
                 jnp.asarray(vals[:-1]), jnp.asarray(dense), M)


def test_ge_spmm_alias():
    from dgsparse_tpu.ge_spmm import cuda_csr_coo_spmm

    rowptr, row, col, vals, dense = make(19)
    out = cuda_csr_coo_spmm(jnp.asarray(row), jnp.asarray(col),
                            jnp.asarray(vals), jnp.asarray(dense), M)
    out_nt = cuda_csr_coo_spmm(jnp.asarray(row), jnp.asarray(col),
                               jnp.asarray(vals), jnp.asarray(dense.T), M,
                               transpose=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_nt.T),
                               rtol=1e-5, atol=1e-5)
