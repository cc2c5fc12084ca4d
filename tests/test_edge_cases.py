"""Degenerate structures: empty graphs, multigraphs, single rows, all-empty
rows — every path must keep reference semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from dgsparse_tpu import Algorithm, SparseTensor, sddmm, spmm
from dgsparse_tpu.utils.testing import spmm_oracle


def test_empty_graph():
    sp = SparseTensor.from_csr(
        jnp.zeros(5, jnp.int32), jnp.zeros(0, jnp.int32),
        sparse_sizes=(4, 3))
    x = jnp.ones((3, 8), jnp.float32)
    for reduce in ("sum", "mean", "max", "min"):
        out = np.asarray(spmm(sp, x, reduce))
        np.testing.assert_array_equal(out, np.zeros((4, 8), np.float32))


def test_multigraph_duplicate_edges():
    # two parallel edges (0,1) with different weights: contributions add
    rowptr = np.array([0, 2, 3], np.int32)
    col = np.array([1, 1, 0], np.int32)
    vals = np.array([2.0, 3.0, 1.0], np.float32)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(2, 2))
    x = jnp.asarray(np.array([[1.0, 10.0], [2.0, 20.0]], np.float32))
    out = np.asarray(spmm(sp, x, "sum"))
    np.testing.assert_allclose(out, [[10.0, 100.0], [1.0, 10.0]])
    # max over parallel edges picks the larger contribution
    out_max = np.asarray(spmm(sp, x, "max"))
    np.testing.assert_allclose(out_max, [[6.0, 60.0], [1.0, 10.0]])


def test_single_row_and_column():
    rowptr = np.array([0, 3], np.int32)
    col = np.array([0, 0, 0], np.int32)
    vals = np.array([1.0, 2.0, 3.0], np.float32)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(1, 1))
    x = jnp.ones((1, 4), jnp.float32)
    np.testing.assert_allclose(np.asarray(spmm(sp, x, "sum")),
                               np.full((1, 4), 6.0))
    np.testing.assert_allclose(np.asarray(spmm(sp, x, "mean")),
                               np.full((1, 4), 2.0))


@pytest.mark.parametrize("alg", [Algorithm.XLA_SEGMENT,
                                 Algorithm.PALLAS_EDGE_TILE])
def test_all_rows_empty_except_last(alg):
    m, n = 300, 100
    rowptr = np.zeros(m + 1, np.int32)
    rowptr[-1] = 4
    col = np.array([0, 5, 50, 99], np.int32)
    vals = np.ones(4, np.float32)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(m, n))
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((n, 16)).astype(np.float32))
    out = np.asarray(spmm(sp, x, "sum", alg))
    ref = spmm_oracle(rowptr, col, vals, np.asarray(x), "sum")
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    assert np.abs(out[:-1]).max() == 0


def test_sddmm_empty():
    sp = SparseTensor.from_csr(
        jnp.zeros(4, jnp.int32), jnp.zeros(0, jnp.int32),
        sparse_sizes=(3, 5))
    out = sddmm(sp, jnp.ones((3, 8)), jnp.ones((5, 8)))
    assert out.shape == (0,)
