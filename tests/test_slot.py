"""Slot-space edge-value pipelines (ops/slot.py) vs edge-order oracles.

Covers both layouts: pure bucketed-ELL storages and 3-tier hybrid
storages (dense cells + BELL + ELL residue), forward and gradients, plus
the boundary converters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgsparse_tpu import (SparseTensor, edge_softmax, edge_softmax_slots,
                          edges_to_slots, sddmm, sddmm_slots, slots_to_edges,
                          spmm, spmm_slots)
from dgsparse_tpu.utils.testing import random_csr


def make_ell(seed=0, m=900, n=800, f=24):
    # above the 4096-nnz plan threshold so the bucketed-ELL plan builds
    rowptr, col, vals = random_csr(m, n, avg_degree=7, seed=seed, skew=1.2)
    rng = np.random.default_rng(seed + 1)
    d1 = rng.standard_normal((m, f)).astype(np.float32)
    d2 = rng.standard_normal((n, f)).astype(np.float32)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col), None,
                               sparse_sizes=(m, n))
    return sp, rowptr, col, d1, d2


def _dedupe(rowptr, col):
    """Unique (row, col) pairs: per-edge slot values are per POSITION in
    the dense-cell tier, so duplicate edges with DIFFERENT values have no
    slot representation (documented in ops/slot.py)."""
    m = len(rowptr) - 1
    row = np.repeat(np.arange(m, dtype=np.int64),
                    np.diff(rowptr).astype(np.int64))
    key = np.unique(row * (col.max() + 1) + col)
    row_u = (key // (col.max() + 1)).astype(np.int64)
    col_u = (key % (col.max() + 1)).astype(np.int32)
    rp = np.zeros(m + 1, np.int64)
    np.add.at(rp, row_u + 1, 1)
    return np.cumsum(rp).astype(np.int32), col_u


def make_hybrid(seed=0, f=16):
    from tests.test_hybrid import clustered_csr

    m = n = 1500
    rowptr, col, vals = clustered_csr(m=m, n=n, seed=seed)
    rowptr, col = _dedupe(rowptr, col)
    rng = np.random.default_rng(seed + 1)
    d1 = rng.standard_normal((m, f)).astype(np.float32)
    d2 = rng.standard_normal((n, f)).astype(np.float32)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col), None,
                               sparse_sizes=(m, n))
    return sp, rowptr, col, d1, d2


def _require_layout(sp, kind):
    from dgsparse_tpu.core.planner import HybridPlan

    ell = sp.storage.ell_plan()
    if kind == "hybrid":
        assert isinstance(ell, HybridPlan), "fixture must build hybrid"
    else:
        assert ell is not None and not isinstance(ell, HybridPlan)


@pytest.mark.parametrize("kind", ["ell", "hybrid"])
def test_sddmm_slots_matches_edge_order(kind):
    sp, rowptr, col, d1, d2 = (make_ell(3) if kind == "ell"
                               else make_hybrid(3))
    _require_layout(sp, kind)
    sv = sddmm_slots(sp, jnp.asarray(d1), jnp.asarray(d2))
    got = np.asarray(slots_to_edges(sp, sv))
    ref = np.asarray(sddmm(sp, jnp.asarray(d1), jnp.asarray(d2)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kind", ["ell", "hybrid"])
def test_edge_softmax_slots_matches_edge_order(kind):
    sp, rowptr, col, d1, d2 = (make_ell(5) if kind == "ell"
                               else make_hybrid(5))
    sv = sddmm_slots(sp, jnp.asarray(d1), jnp.asarray(d2))
    soft = edge_softmax_slots(sp, sv)
    got = np.asarray(slots_to_edges(sp, soft))
    logits = slots_to_edges(sp, sv)
    ref = np.asarray(edge_softmax(sp, logits))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kind", ["ell", "hybrid"])
def test_spmm_slots_matches_edge_order(kind):
    sp, rowptr, col, d1, d2 = (make_ell(7) if kind == "ell"
                               else make_hybrid(7))
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal(
        (sp.sparse_sizes()[1], d1.shape[1])).astype(np.float32))
    vals = jnp.asarray(rng.standard_normal(len(col)).astype(np.float32))
    sv = edges_to_slots(sp, vals)
    out = spmm_slots(sp, sv, x)
    ref = spmm(sp.set_values(vals), x, "sum")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # mean too
    out_m = spmm_slots(sp, sv, x, "mean")
    ref_m = spmm(sp.set_values(vals), x, "mean")
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(ref_m),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kind", ["ell", "hybrid"])
def test_full_chain_matches_edge_order_pipeline(kind):
    """SDDMM -> softmax -> SpMM entirely in slot space == the edge-order
    pipeline (the GAT-shaped chain VERDICT r3 #4 targets)."""
    sp, rowptr, col, d1, d2 = (make_ell(13) if kind == "ell"
                               else make_hybrid(13))
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.standard_normal(
        (sp.sparse_sizes()[1], d1.shape[1])).astype(np.float32))

    def chain_slots(d1, d2, x):
        sv = sddmm_slots(sp, d1, d2)
        return spmm_slots(sp, edge_softmax_slots(sp, sv), x)

    def chain_edges(d1, d2, x):
        v = sddmm(sp, d1, d2)
        return spmm(sp.set_values(edge_softmax(sp, v)), x, "sum")

    a = chain_slots(jnp.asarray(d1), jnp.asarray(d2), x)
    b = chain_edges(jnp.asarray(d1), jnp.asarray(d2), x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kind", ["ell", "hybrid"])
def test_full_chain_grads(kind):
    sp, rowptr, col, d1, d2 = (make_ell(19) if kind == "ell"
                               else make_hybrid(19))
    m, n = sp.sparse_sizes()
    f = d1.shape[1]
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((m, f)).astype(np.float32))

    def loss_slots(d1, d2, x):
        sv = sddmm_slots(sp, d1, d2)
        out = spmm_slots(sp, edge_softmax_slots(sp, sv), x)
        return jnp.vdot(out, ct)

    def loss_edges(d1, d2, x):
        v = sddmm(sp, d1, d2)
        out = spmm(sp.set_values(edge_softmax(sp, v)), x, "sum")
        return jnp.vdot(out, ct)

    gs = jax.grad(loss_slots, argnums=(0, 1, 2))(
        jnp.asarray(d1), jnp.asarray(d2), x)
    ge = jax.grad(loss_edges, argnums=(0, 1, 2))(
        jnp.asarray(d1), jnp.asarray(d2), x)
    for a, b in zip(gs, ge):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("kind", ["ell", "hybrid"])
def test_boundary_roundtrip(kind):
    sp, rowptr, col, d1, d2 = (make_ell(29) if kind == "ell"
                               else make_hybrid(29))
    rng = np.random.default_rng(31)
    # roundtrip is exact only for unique edges; assign per-edge values
    # that agree on duplicates (value = f(row, col))
    coo_row = np.repeat(np.arange(len(rowptr) - 1, dtype=np.int64),
                        np.diff(rowptr).astype(np.int64))
    key = (coo_row * 100003 + col.astype(np.int64)) % 997
    vals = jnp.asarray((key / 997.0).astype(np.float32))
    sv = edges_to_slots(sp, vals)
    back = slots_to_edges(sp, sv)
    np.testing.assert_allclose(np.asarray(back), np.asarray(vals),
                               rtol=1e-6, atol=1e-6)


def test_layout_error_without_plans():
    rowptr, col, vals = random_csr(40, 40, avg_degree=3, seed=0)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col), None,
                               sparse_sizes=(40, 40), build_plans=False)
    with pytest.raises(NotImplementedError):
        sddmm_slots(sp, jnp.zeros((40, 8)), jnp.zeros((40, 8)))


def test_public_entry_dispatch():
    """edge_softmax / gspmm / spmm_multihead accept slot-order values."""
    from dgsparse_tpu import gspmm, spmm_multihead

    sp, rowptr, col, d1, d2 = make_ell(37)
    m, n = sp.sparse_sizes()
    f = d1.shape[1]
    rng = np.random.default_rng(41)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))

    sv = sddmm_slots(sp, jnp.asarray(d1), jnp.asarray(d2))
    soft = edge_softmax(sp, sv)          # SlotValues in -> SlotValues out
    assert hasattr(soft, "ell")
    out_g = gspmm(sp, x, "sum", "mul", values=soft)
    ref = spmm(sp.set_values(edge_softmax(sp, slots_to_edges(sp, sv))), x,
               "sum")
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # multi-head: 2 heads with different slot values
    sv2 = edge_softmax(sp, sddmm_slots(sp, jnp.asarray(d1 * 2.0),
                                       jnp.asarray(d2)))
    xh = jnp.asarray(rng.standard_normal((n, 2, f)).astype(np.float32))
    out_mh = spmm_multihead(sp, [soft, sv2], xh, "sum")
    r0 = spmm_slots(sp, soft, xh[:, 0, :])
    r1 = spmm_slots(sp, sv2, xh[:, 1, :])
    np.testing.assert_allclose(np.asarray(out_mh[:, 0]), np.asarray(r0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_mh[:, 1]), np.asarray(r1),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kind", ["ell", "hybrid"])
def test_chain_under_jit_with_sparse_argument(kind):
    """The full slot chain jitted with the SparseTensor as a traced
    ARGUMENT (the production/bench shape): plan objects are rebuilt by
    tree_unflatten inside the trace, so anything the ops need must be a
    pytree child — regression for the _eperm_host AttributeError the
    reddit-scale bench hit (Storage.slot_gmap now carries the transpose
    gather map)."""
    import jax

    sp, rowptr, col, d1, d2 = (make_ell(23) if kind == "ell"
                               else make_hybrid(23))
    rng = np.random.default_rng(29)
    x = jnp.asarray(rng.standard_normal(
        (sp.sparse_sizes()[1], d1.shape[1])).astype(np.float32))

    @jax.jit
    def chain(d1, d2, x, spa):
        sv = sddmm_slots(spa, d1, d2)
        return spmm_slots(spa, edge_softmax_slots(spa, sv), x)

    got = chain(jnp.asarray(d1), jnp.asarray(d2), x, sp)
    ref = chain.__wrapped__(jnp.asarray(d1), jnp.asarray(d2), x, sp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# round 5: slot-order MAX/MIN + the full slot-order gspmm semiring grid
# (VERDICT r4 #9 — the former NotImplementedError scope guards)
# ---------------------------------------------------------------------------

def _edge_values(sp, rowptr, seed, positive=False):
    rng = np.random.default_rng(seed)
    nnz = int(sp.nnz)
    v = (rng.uniform(0.5, 1.5, nnz) if positive
         else rng.standard_normal(nnz)).astype(np.float32)
    return jnp.asarray(v)


@pytest.mark.parametrize("kind", ["ell", "hybrid"])
@pytest.mark.parametrize("reduce", ["max", "min"])
def test_spmm_slots_maxmin_matches_edge_order(kind, reduce):
    sp, rowptr, col, d1, d2 = (make_ell(7) if kind == "ell"
                               else make_hybrid(7))
    _require_layout(sp, kind)
    v = _edge_values(sp, rowptr, 11)
    sv = edges_to_slots(sp, v)
    x = jnp.asarray(d2)
    got = np.asarray(spmm_slots(sp, sv, x, reduce))
    ref = np.asarray(spmm(sp.set_values(v), x, reduce))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kind", ["ell", "hybrid"])
@pytest.mark.parametrize("reduce", ["max", "min"])
def test_spmm_slots_maxmin_grads(kind, reduce):
    """Gradients wrt (edge values, dense) agree between the slot path
    (edges_to_slots -> spmm_slots) and the edge-order masked backward,
    for the SAME scalar loss."""
    sp, rowptr, col, d1, d2 = (make_ell(13) if kind == "ell"
                               else make_hybrid(13))
    v = _edge_values(sp, rowptr, 17)
    x = jnp.asarray(d2)
    rng = np.random.default_rng(19)
    ct = jnp.asarray(rng.standard_normal(
        (sp.sparse_sizes()[0], x.shape[1])).astype(np.float32))

    def loss_slot(v, x):
        return jnp.vdot(spmm_slots(sp, edges_to_slots(sp, v), x, reduce),
                        ct)

    def loss_edge(v, x):
        return jnp.vdot(spmm(sp.set_values(v), x, reduce), ct)

    gs = jax.grad(loss_slot, argnums=(0, 1))(v, x)
    ge = jax.grad(loss_edge, argnums=(0, 1))(v, x)
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(ge[0]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(ge[1]),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("kind", ["ell", "hybrid"])
@pytest.mark.parametrize("compute", ["add", "sub", "mul", "div"])
@pytest.mark.parametrize("reduce", ["sum", "mean", "max", "min"])
def test_gspmm_slot_order_full_grid(kind, compute, reduce):
    """gspmm with SlotValues across the FULL semiring grid vs the
    edge-order gspmm on the same values (reference grid:
    example/gspmm-fp/util.py:17-110)."""
    from dgsparse_tpu import gspmm

    sp, rowptr, col, d1, d2 = (make_ell(29) if kind == "ell"
                               else make_hybrid(29))
    v = _edge_values(sp, rowptr, 31, positive=(compute == "div"))
    sv = edges_to_slots(sp, v)
    x = jnp.asarray(d2)
    got = np.asarray(gspmm(sp, x, reduce, compute, values=sv))
    ref = np.asarray(gspmm(sp.set_values(v), x, reduce, compute))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("compute", ["add", "div"])
def test_gspmm_slot_order_grads(compute):
    from dgsparse_tpu import gspmm

    sp, rowptr, col, d1, d2 = make_ell(37)
    v = _edge_values(sp, rowptr, 41, positive=True)
    x = jnp.asarray(d2)
    rng = np.random.default_rng(43)
    ct = jnp.asarray(rng.standard_normal(
        (sp.sparse_sizes()[0], x.shape[1])).astype(np.float32))

    def loss_slot(v, x):
        return jnp.vdot(
            gspmm(sp, x, "sum", compute, values=edges_to_slots(sp, v)), ct)

    def loss_edge(v, x):
        return jnp.vdot(gspmm(sp.set_values(v), x, "sum", compute), ct)

    gs = jax.grad(loss_slot, argnums=(0, 1))(v, x)
    ge = jax.grad(loss_edge, argnums=(0, 1))(v, x)
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(ge[0]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(ge[1]),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("compute", ["add", "sub", "mul", "div"])
@pytest.mark.parametrize("reduce", ["max", "min"])
def test_gspmm_slot_order_maxmin_grads(compute, reduce):
    """Gradient coverage for the MAX/MIN x {ADD,SUB,MUL,DIV} branches of
    the slot-order semiring backward (_spmm_slots_mm_b) — each d_v/d_x
    derivative branch vs the edge-order backward on the same loss."""
    from dgsparse_tpu import gspmm

    sp, rowptr, col, d1, d2 = make_ell(47)
    v = _edge_values(sp, rowptr, 53, positive=True)
    x = jnp.asarray(d2)
    rng = np.random.default_rng(59)
    ct = jnp.asarray(rng.standard_normal(
        (sp.sparse_sizes()[0], x.shape[1])).astype(np.float32))

    def loss_slot(v, x):
        return jnp.vdot(
            gspmm(sp, x, reduce, compute, values=edges_to_slots(sp, v)),
            ct)

    def loss_edge(v, x):
        return jnp.vdot(gspmm(sp.set_values(v), x, reduce, compute), ct)

    gs = jax.grad(loss_slot, argnums=(0, 1))(v, x)
    ge = jax.grad(loss_edge, argnums=(0, 1))(v, x)
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(ge[0]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(ge[1]),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("reduce", ["max", "min"])
def test_spmm_slots_maxmin_size_gate_fallback(reduce, monkeypatch):
    """Over the winner-buffer budget, slot max/min must route through the
    edge-order assembly (the slot backward cannot row-chunk) and stay
    exact for fwd AND grads."""
    import dgsparse_tpu.ops.slot as slot_mod
    import dgsparse_tpu.ops.spmm as spmm_mod

    monkeypatch.setattr(spmm_mod, "_ell_maxmin_fits",
                        lambda plan, f: False)
    sp, rowptr, col, d1, d2 = make_ell(61)
    v = _edge_values(sp, rowptr, 67)
    x = jnp.asarray(d2)
    sv = edges_to_slots(sp, v)
    got = np.asarray(slot_mod.spmm_slots(sp, sv, x, reduce))
    ref = np.asarray(spmm(sp.set_values(v), x, reduce))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    rng = np.random.default_rng(71)
    ct = jnp.asarray(rng.standard_normal(got.shape).astype(np.float32))
    g = jax.grad(lambda x: jnp.vdot(
        slot_mod.spmm_slots(sp, sv, x, reduce), ct))(x)
    ge = jax.grad(lambda x: jnp.vdot(
        spmm(sp.set_values(v), x, reduce), ct))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ge),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("reduce", ["max", "min"])
def test_spmm_multihead_slot_order_maxmin(reduce):
    from dgsparse_tpu import spmm_multihead

    sp, rowptr, col, d1, d2 = make_ell(47)
    n, f = sp.sparse_sizes()[1], d2.shape[1]
    v0 = _edge_values(sp, rowptr, 53)
    v1 = _edge_values(sp, rowptr, 59)
    svs = [edges_to_slots(sp, v0), edges_to_slots(sp, v1)]
    rng = np.random.default_rng(61)
    xh = jnp.asarray(rng.standard_normal((n, 2, f)).astype(np.float32))
    out = spmm_multihead(sp, svs, xh, reduce)
    for h, v in enumerate((v0, v1)):
        ref = np.asarray(spmm(sp.set_values(v), xh[:, h, :], reduce))
        np.testing.assert_allclose(np.asarray(out[:, h]), ref,
                                   rtol=1e-4, atol=1e-4)
