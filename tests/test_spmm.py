"""SpMM forward/backward vs oracles — port of the reference test strategy
(test/test_spmm.py: forward vs torch.sparse.mm, backward via out.sum()).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgsparse_tpu import SparseTensor, spmm, spmm_max, spmm_mean, spmm_min, spmm_sum
from dgsparse_tpu.utils.testing import random_csr, spmm_oracle

GRAPHS = [
    dict(num_rows=60, num_cols=50, avg_degree=4.0, seed=0),
    dict(num_rows=200, num_cols=200, avg_degree=8.0, seed=1, skew=1.5),
    dict(num_rows=33, num_cols=77, avg_degree=2.0, seed=2),
]
FEATS = [1, 7, 32, 64]
REDUCES = ["sum", "mean", "max", "min"]


def make(graph, feat, has_value=True, seed=123):
    rowptr, col, values, = random_csr(**graph)
    rng = np.random.default_rng(seed)
    dense = rng.standard_normal((graph["num_cols"], feat)).astype(np.float32)
    sp = SparseTensor.from_csr(
        jnp.asarray(rowptr), jnp.asarray(col),
        jnp.asarray(values) if has_value else None,
        sparse_sizes=(graph["num_rows"], graph["num_cols"]),
    )
    return sp, rowptr, col, values, dense


@pytest.mark.parametrize("graph", GRAPHS)
@pytest.mark.parametrize("feat", FEATS)
@pytest.mark.parametrize("reduce", REDUCES)
def test_forward(graph, feat, reduce):
    sp, rowptr, col, values, dense = make(graph, feat)
    out = spmm(sp, jnp.asarray(dense), reduce)
    ref = spmm_oracle(rowptr, col, values, dense, reduce)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("reduce", REDUCES)
def test_forward_no_value(reduce):
    graph = GRAPHS[0]
    sp, rowptr, col, _, dense = make(graph, 16, has_value=False)
    out = spmm(sp, jnp.asarray(dense), reduce)
    ref = spmm_oracle(rowptr, col, None, dense, reduce)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def _autodiff_ref(rowptr, col, num_rows, reduce):
    """Plain-JAX differentiable reference (no custom_vjp)."""
    coo_row = np.repeat(np.arange(num_rows, dtype=np.int32),
                        np.diff(rowptr))

    def f(values, dense):
        contrib = jnp.take(dense, jnp.asarray(col), axis=0) * values[:, None]
        seg = jnp.asarray(coo_row)
        if reduce == "sum":
            return jax.ops.segment_sum(contrib, seg, num_segments=num_rows)
        if reduce == "mean":
            deg = jnp.maximum(jnp.asarray(np.diff(rowptr)), 1)
            s = jax.ops.segment_sum(contrib, seg, num_segments=num_rows)
            return s / deg[:, None]
        if reduce == "max":
            out = jax.ops.segment_max(contrib, seg, num_segments=num_rows)
            return jnp.where(jnp.isfinite(out), out, 0)
        out = jax.ops.segment_min(contrib, seg, num_segments=num_rows)
        return jnp.where(jnp.isfinite(out), out, 0)

    return f


@pytest.mark.parametrize("graph", GRAPHS[:2])
@pytest.mark.parametrize("reduce", REDUCES)
def test_backward(graph, reduce):
    feat = 16
    sp, rowptr, col, values, dense = make(graph, feat)
    op = {"sum": spmm_sum, "mean": spmm_mean,
          "max": spmm_max, "min": spmm_min}[reduce]

    # Scalarize with a fixed random cotangent to exercise the whole vjp.
    rng = np.random.default_rng(7)
    ct = jnp.asarray(rng.standard_normal((graph["num_rows"], feat))
                     .astype(np.float32))

    def loss(values_, dense_):
        return jnp.vdot(op(sp.set_values(values_), dense_, 0), ct)

    gv, gd = jax.grad(loss, argnums=(0, 1))(jnp.asarray(values),
                                            jnp.asarray(dense))

    ref_f = _autodiff_ref(rowptr, col, graph["num_rows"], reduce)

    def ref_loss(values_, dense_):
        return jnp.vdot(ref_f(values_, dense_), ct)

    rv, rd = jax.grad(ref_loss, argnums=(0, 1))(jnp.asarray(values),
                                                jnp.asarray(dense))
    np.testing.assert_allclose(np.asarray(gd), np.asarray(rd),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv),
                               rtol=1e-4, atol=1e-4)


def test_jit_and_grad_compose():
    sp, rowptr, col, values, dense = make(GRAPHS[0], 8)

    @jax.jit
    def step(values_, dense_):
        def loss(v, d):
            return spmm_sum(sp.set_values(v), d, 0).sum()

        return jax.grad(loss, argnums=(0, 1))(values_, dense_)

    gv, gd = step(jnp.asarray(values), jnp.asarray(dense))
    assert gv.shape == values.shape and gd.shape == dense.shape
    assert bool(jnp.isfinite(gv).all()) and bool(jnp.isfinite(gd).all())


def test_sparse_tensor_through_jit():
    sp, _, _, _, dense = make(GRAPHS[0], 8)

    @jax.jit
    def f(sp_, dense_):
        return spmm_sum(sp_, dense_, 0)

    out = f(sp, jnp.asarray(dense))
    ref = spmm_sum(sp, jnp.asarray(dense), 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_xla_spmm_edge_chunked_matches_unchunked(monkeypatch):
    """Lean-mode edge chunking of the XLA segment SpMM (100M+-edge
    graphs: the [nnz, F] contribution buffer cannot materialize)."""
    from dgsparse_tpu.kernels import xla as kx
    from dgsparse_tpu.ops.types import ReduceOp

    rng = np.random.default_rng(3)
    m = n = 300
    nnz = 4000
    row = np.sort(rng.integers(0, m, nnz)).astype(np.int32)
    col = rng.integers(0, n, nnz).astype(np.int32)
    vals = rng.standard_normal(nnz).astype(np.float32)
    dense = rng.standard_normal((n, 16)).astype(np.float32)
    ref, _ = kx.spmm_forward(jnp.asarray(row), jnp.asarray(col),
                             jnp.asarray(vals), jnp.asarray(dense), m,
                             ReduceOp.SUM)
    monkeypatch.setattr(kx, "_SPMM_CHUNK_BUDGET", 1024)
    out, arg = kx.spmm_forward(jnp.asarray(row), jnp.asarray(col),
                               jnp.asarray(vals), jnp.asarray(dense), m,
                               ReduceOp.SUM)
    assert arg is None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # MEAN divides once at the end
    refm, _ = kx.spmm_forward(jnp.asarray(row), jnp.asarray(col),
                              jnp.asarray(vals), jnp.asarray(dense), m,
                              ReduceOp.MEAN)
    np.testing.assert_allclose(
        np.asarray(refm),
        np.asarray(ref) / np.maximum(
            np.bincount(row, minlength=m), 1)[:, None],
        rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("reduce", ["max", "min"])
def test_xla_spmm_maxmin_chunked_matches_unchunked(monkeypatch, reduce):
    """Chunked MAX/MIN: extrema and FIRST-winner arg residuals must be
    bit-identical to the one-shot form (the reddit-scale safety net for
    storages whose only plan is the hybrid — ESC is skipped there and
    maxmin falls to this path)."""
    from dgsparse_tpu.kernels import xla as kx
    from dgsparse_tpu.ops.types import ReduceOp

    rng = np.random.default_rng(7)
    m = n = 250
    nnz = 3500
    row = np.sort(rng.integers(0, m, nnz)).astype(np.int32)
    # duplicate (row, col) pairs so exact-tie winners are exercised
    col = rng.integers(0, n, nnz).astype(np.int32)
    col[1::7] = col[::7][: len(col[1::7])]
    row[1::7] = row[::7][: len(row[1::7])]
    order = np.argsort(row, kind="stable")
    row, col = row[order], col[order]
    vals = np.ones(nnz, np.float32)  # ties guaranteed on duplicates
    dense = rng.standard_normal((n, 16)).astype(np.float32)
    rop = ReduceOp.MAX if reduce == "max" else ReduceOp.MIN
    ref, ref_arg = kx.spmm_forward(jnp.asarray(row), jnp.asarray(col),
                                   jnp.asarray(vals), jnp.asarray(dense),
                                   m, rop)
    monkeypatch.setattr(kx, "_SPMM_CHUNK_BUDGET", 1024)
    out, arg = kx.spmm_forward(jnp.asarray(row), jnp.asarray(col),
                               jnp.asarray(vals), jnp.asarray(dense),
                               m, rop)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(arg), np.asarray(ref_arg))


def test_xla_spmm_maxmin_chunked_backward_matches(monkeypatch):
    """Edge-chunked maxmin BACKWARD (winner masks chunked like the
    forward) == one-shot grads, d_values and d_dense."""
    from dgsparse_tpu import Algorithm, spmm
    from dgsparse_tpu.kernels import xla as kx
    from dgsparse_tpu.utils.testing import random_csr

    rowptr, col, vals = random_csr(220, 200, avg_degree=7.0, seed=31)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(220, 200),
                               build_plans=False)
    rng = np.random.default_rng(32)
    x = jnp.asarray(rng.standard_normal((200, 8)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((220, 8)).astype(np.float32))
    vj = jnp.asarray(vals)

    def loss(v, d):
        return jnp.vdot(
            spmm(sp.set_values(v), d, "max", Algorithm.XLA_SEGMENT), ct)

    gv_ref, gd_ref = jax.grad(loss, argnums=(0, 1))(vj, x)
    monkeypatch.setattr(kx, "_SPMM_CHUNK_BUDGET", 1024)
    gv, gd = jax.grad(loss, argnums=(0, 1))(vj, x)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gd_ref),
                               rtol=1e-5, atol=1e-5)
