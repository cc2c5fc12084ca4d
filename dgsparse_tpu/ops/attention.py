"""Fused slot-space GAT attention: scores + softmax + weighted SpMM
without ever materializing CSR-edge-order values.

`gat_attention(sp, s_row, s_col, x)` computes

    out[r] = sum_c softmax_r( LeakyReLU(s_row[r] + s_col[c]) ) * x[c]

over the edges of `sp`. GAT logits are RANK-1 over (row, col) — the
reference's a·[Wh_i || Wh_j] scoring splits into per-node halves (its GAT
consumers do exactly this; the reference declares edge_softmax_cuda in
include/dgsparse.h:17 but ships no implementation) — which means on a
3-tier hybrid plan every tier can build its logits WITHOUT touching CSR
edge order:

- dense-cell tier: logits for a whole [128 x 128] cell are an outer
  broadcast of two 128-vectors — zero gathers for ~80% of the edges on
  community-clustered graphs;
- BELL / bucketed-ELL tiers: one 1-D small-table gather per slot (4-byte
  elements, bf16-able), instead of the ~20 ns/edge CSR-assembly gather
  that dominates edge-space attention at 100M-edge scale
  (docs/BENCHMARKS.md SDDMM section).

Softmax shift: per-row UPPER BOUND  shift[r] = LeakyReLU(s_row[r] +
max(s_col))  — monotonicity of LeakyReLU makes it >= every logit in row
r, so exp(logit - shift) never overflows, and since softmax is exactly
shift-invariant the result is EXACT (no edge-level max reduction needed
at all). The bound is loose by at most range(s_col); exp underflows only
if a row's true max sits > ~80 below the bound (documented caveat; the
edge-space fallback has the classic per-row max).

The denominator rides the SAME weighted SpMM as an appended ones column
(kernels pad F to 128 lanes, so for F < 128 it is literally free).

Backward is a custom VJP assembled from the same tier kernels:
d_x via the transpose hybrid (reusing the materialized attention cells),
dE via sddmm_cells + slot dots, and the row/col reductions of d_logits
via ones-column SpMMs. No [nnz]-sized edge-order intermediate anywhere.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from dgsparse_tpu.core.formats import SparseTensor
from dgsparse_tpu.ops.types import ReduceOp

# keep well inside normal f32 range: XLA flushes subnormals to zero, so a
# 1e-38 guard silently becomes 0/0 on empty rows
_TINY = 1e-30


def _leaky(z, slope):
    return jnp.where(z > 0, z, slope * z)


def _dleaky(z, slope):
    return jnp.where(z > 0, jnp.float32(1.0), jnp.float32(slope))


def _int_zero(x):
    return jnp.zeros((), x.dtype) if hasattr(x, "dtype") else x


# ---------------------------------------------------------------------------
# tier-local slot geometry (all static shapes; repeat = streaming access)
# ---------------------------------------------------------------------------

def _ell_geom(ell):
    """(reps [n_ne], flat_n) for a BucketedEllPlan."""
    rbs, ks = ell.rbs, ell.ks
    flat_n = sum(rb * k for rb, k in zip(rbs, ks))
    reps = (jnp.full((rbs[0],), ks[0], jnp.int32) if len(ks) == 1 else
            jnp.concatenate([jnp.full((rb,), k, jnp.int32)
                             for rb, k in zip(rbs, ks)]))
    return reps, flat_n


def _ell_slot_rowvals(ell, per_row):
    """Expand per-row values [M] (or [M,F]) to flat ELL slot order."""
    reps, flat_n = _ell_geom(ell)
    cat = jnp.take(per_row, ell.rows, axis=0)
    return jnp.repeat(cat, reps, axis=0, total_repeat_length=flat_n)


def _ell_E(ell, s_row, s_col, shift, slope):
    """exp(lrelu(z) - shift) * valid on flat bucketed-ELL slots; also
    returns z (for the backward's lrelu')."""
    cols = ell.cols.reshape(-1)
    z = _ell_slot_rowvals(ell, s_row) + jnp.take(s_col, cols)
    e = jnp.exp(_leaky(z, slope) - _ell_slot_rowvals(ell, shift))
    return jnp.where(ell.eperm.reshape(-1) >= 0, e, 0), z


def _bell_rows_cols(bell):
    e = bell.edge_tile
    rows = (jnp.repeat(bell.tile_rb, e) * bell.row_block + bell.lrow)
    cols = (jnp.repeat(bell.tile_cw, e) * bell.col_window + bell.lcol)
    m1 = bell.num_rows - 1
    n1 = bell.num_cols - 1
    return jnp.minimum(rows, m1), jnp.minimum(cols, n1)


def _bell_E(bell, s_row, s_col, shift, slope):
    rows, cols = _bell_rows_cols(bell)
    z = jnp.take(s_row, rows) + jnp.take(s_col, cols)
    e = jnp.exp(_leaky(z, slope) - jnp.take(shift, rows))
    return jnp.where(bell.eperm >= 0, e, 0), z


def _cells_z(cells, s_row, s_col):
    """[ncells, R, C] broadcast logits z = s_row + s_col per cell."""
    r, c = cells.row_block, cells.col_window
    m_pad = cells.num_rows + (-cells.num_rows) % r
    n_pad = cells.num_cols + (-cells.num_cols) % c
    sr = jnp.pad(s_row, (0, m_pad - s_row.shape[0])).reshape(-1, r)
    sc = jnp.pad(s_col, (0, n_pad - s_col.shape[0])).reshape(-1, c)
    zr = jnp.take(sr, cells.cell_rb, axis=0)              # [ncells, R]
    zc = jnp.take(sc, cells.cell_cw, axis=0)              # [ncells, C]
    return zr[:, :, None] + zc[:, None, :]


def _cells_E(cells, mult, s_row, s_col, shift, slope):
    """Attention cell blocks exp(lrelu(z) - shift) * multiplicity.
    `mult` is the ones-materialized cell array (edge multiplicity — 0 at
    non-edge positions, >1 for duplicate edges, both exactly right)."""
    r = cells.row_block
    m_pad = cells.num_rows + (-cells.num_rows) % r
    sh = jnp.pad(shift, (0, m_pad - shift.shape[0])).reshape(-1, r)
    sh = jnp.take(sh, cells.cell_rb, axis=0)              # [ncells, R]
    z = _cells_z(cells, s_row, s_col)
    return jnp.exp(_leaky(z, slope) - sh[:, :, None]) * mult, z


# ---------------------------------------------------------------------------
# hybrid fast path (custom VJP)
# ---------------------------------------------------------------------------

def _hybrid_weights(hp, mult_cells, s_row, s_col, shift, slope):
    w = {}
    zs = {}
    if hp.cells is not None:
        w["cells"], zs["cells"] = _cells_E(hp.cells, mult_cells, s_row,
                                           s_col, shift, slope)
    if hp.bell is not None:
        w["bell"], zs["bell"] = _bell_E(hp.bell, s_row, s_col, shift,
                                        slope)
    w["ell"], zs["ell"] = _ell_E(hp.ell, s_row, s_col, shift, slope)
    return w, zs


def _hybrid_fwd_core(hp, mult_cells, s_row, s_col, x, slope, cd):
    from dgsparse_tpu.kernels.pallas_spmm import spmm_hybrid

    shift = jax.lax.stop_gradient(
        _leaky(s_row + jnp.max(s_col), slope)).astype(jnp.float32)
    w, _ = _hybrid_weights(hp, mult_cells, s_row.astype(jnp.float32),
                           s_col.astype(jnp.float32), shift, slope)
    f = x.shape[-1]
    xd = jnp.concatenate(
        [x.astype(jnp.float32), jnp.ones((x.shape[0], 1), jnp.float32)],
        axis=1)
    nd = spmm_hybrid(hp, None, xd, ReduceOp.SUM, w_slot=w,
                     compute_dtype=cd)
    denom = jnp.maximum(nd[:, f], _TINY)
    out = nd[:, :f] / denom[:, None]
    return out.astype(x.dtype), (shift, denom, out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _hybrid_attention(hp, mult_cells, s_row, s_col, x, slope,
                      cd=jnp.float32):
    return _hybrid_fwd_core(hp, mult_cells, s_row, s_col, x, slope,
                            cd)[0]


def _hybrid_attention_fwd(hp, mult_cells, s_row, s_col, x, slope, cd):
    out, (shift, denom, out32) = _hybrid_fwd_core(hp, mult_cells, s_row,
                                                  s_col, x, slope, cd)
    return out, (hp, mult_cells, s_row, s_col, x, shift, denom, out32)


def _hybrid_attention_bwd(slope, cd, res, g):
    from dgsparse_tpu.kernels.pallas_sddmm import sddmm_cells
    from dgsparse_tpu.kernels.pallas_spmm import (spmm_hybrid,
                                                  spmm_hybrid_t)

    hp, mult_cells, s_row, s_col, x, shift, denom, out32 = res
    g32 = g.astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    sr32 = s_row.astype(jnp.float32)
    sc32 = s_col.astype(jnp.float32)
    u = g32 / denom[:, None]                               # [M, F]
    # rho[r] = sum_c sigma_rc * dsig_rc = rowdot(g, out) / denom
    rho = jnp.sum(g32 * out32, axis=-1) / denom            # [M]

    w, zs = _hybrid_weights(hp, mult_cells, sr32, sc32, shift, slope)

    # --- d_x = A(E)^T · u : transpose hybrid, cells reused as-is --------
    wt = {"cells": w.get("cells")}
    z_t = None
    if hp.ell_t is not None:
        # E at transpose-plan slots (rows of ell_t are original COLS)
        cols_t = hp.ell_t.cols.reshape(-1)                 # original rows
        rows_safe = jnp.minimum(cols_t, hp.num_rows - 1)
        z_t = (jnp.take(sr32, rows_safe)
               + _ell_slot_rowvals(hp.ell_t, sc32))
        e_t = jnp.exp(_leaky(z_t, slope) - jnp.take(shift, rows_safe))
        wt["ell_t"] = jnp.where(hp.ell_t.eperm.reshape(-1) >= 0, e_t, 0)
    d_x = spmm_hybrid_t(hp, None, u, w_slot=wt,
                        compute_dtype=cd).astype(x.dtype)

    # --- d_logits per slot: dz = E * (dsig - rho[row]) * lrelu'(z) ------
    # dsig_rc = dot(u[r], x[c])  (the softmax-weight cotangent)
    dz = {}
    if hp.cells is not None:
        ds_c = sddmm_cells(hp.cells, u, x32).reshape(w["cells"].shape)
        r = hp.cells.row_block
        m_pad = hp.cells.num_rows + (-hp.cells.num_rows) % r
        rho_b = jnp.take(jnp.pad(rho, (0, m_pad - rho.shape[0]))
                         .reshape(-1, r), hp.cells.cell_rb, axis=0)
        dz["cells"] = (w["cells"] * (ds_c - rho_b[:, :, None])
                       * _dleaky(zs["cells"], slope))
    if hp.bell is not None:
        rows_b, cols_b = _bell_rows_cols(hp.bell)
        ds_b = jnp.sum(jnp.take(u, rows_b, axis=0)
                       * jnp.take(x32, cols_b, axis=0), axis=-1)
        dz["bell"] = (w["bell"] * (ds_b - jnp.take(rho, rows_b))
                      * _dleaky(zs["bell"], slope))
    cols_e = jnp.minimum(hp.ell.cols.reshape(-1), hp.num_cols - 1)
    ds_e = jnp.sum(_ell_slot_rowvals(hp.ell, u)
                   * jnp.take(x32, cols_e, axis=0), axis=-1)
    dz["ell"] = (w["ell"] * (ds_e - _ell_slot_rowvals(hp.ell, rho))
                 * _dleaky(zs["ell"], slope))

    ones_m = jnp.ones((hp.num_rows, 1), jnp.float32)
    ones_n = jnp.ones((hp.num_cols, 1), jnp.float32)
    # row sums of dz over all forward tiers -> d_s_row
    d_s_row = spmm_hybrid(hp, None, ones_n, ReduceOp.SUM,
                          w_slot=dz)[:, 0].astype(s_row.dtype)
    # col sums of dz: cells tier transposed + dz at ell_t slots
    dzt = {"cells": dz.get("cells")}
    if hp.ell_t is not None:
        cols_t = hp.ell_t.cols.reshape(-1)
        rows_safe = jnp.minimum(cols_t, hp.num_rows - 1)
        ds_t = jnp.sum(jnp.take(u, rows_safe, axis=0)
                       * _ell_slot_rowvals(hp.ell_t, x32), axis=-1)
        dzt["ell_t"] = (wt["ell_t"] * (ds_t - jnp.take(rho, rows_safe))
                        * _dleaky(z_t, slope))
    d_s_col = spmm_hybrid_t(hp, None, ones_m,
                            w_slot=dzt)[:, 0].astype(s_col.dtype)

    d_hp = jax.tree.map(_int_zero, hp)
    d_mult = jax.tree.map(_int_zero, mult_cells)
    return d_hp, d_mult, d_s_row, d_s_col, d_x


_hybrid_attention.defvjp(_hybrid_attention_fwd, _hybrid_attention_bwd)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

def gat_attention(
    sparse: SparseTensor,
    s_row: jax.Array,          # [M] destination-side score half
    s_col: jax.Array,          # [N] source-side score half
    x: jax.Array,              # [N, F] values to aggregate
    negative_slope: float = 0.2,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Softmax attention aggregation over the edges of `sparse`:
    out[r] = sum_c alpha_rc x[c] with alpha = softmax_r(LeakyReLU(
    s_row[r] + s_col[c])) over r's neighbors. Structure-only: the
    sparse tensor's values are ignored (duplicate edges each attend).

    Hybrid-planned storages run fully in plan-slot space (no CSR-order
    edge intermediate); everything else uses the edge-space pipeline
    (coo gathers + edge_softmax + segment reduce)."""
    st = sparse.storage
    from dgsparse_tpu.core.planner import HybridPlan

    hp = st.ell_plan() if hasattr(st, "ell_plan") else None
    if isinstance(hp, HybridPlan):
        mult = None
        if hp.cells is not None:
            vs = st.vslot()
            if (st.values() is None and vs is not None
                    and isinstance(vs.get("ell"), dict)):
                mult = vs["ell"].get("cells")
            if mult is None:
                from dgsparse_tpu.kernels.pallas_spmm import \
                    materialize_cells

                mult = materialize_cells(hp.cells, None)
        return _hybrid_attention(hp, mult, s_row, s_col, x,
                                 float(negative_slope), compute_dtype)
    return _edge_space_attention(sparse, s_row, s_col, x, negative_slope)


def _edge_space_attention(sparse, s_row, s_col, x, negative_slope):
    """Differentiable edge-space fallback (any storage)."""
    from dgsparse_tpu.ops.edge_softmax import edge_softmax
    from dgsparse_tpu.ops.spmm import spmm

    st = sparse.storage
    row, col = st.coo_row(), st.col()
    z = jnp.take(s_row, row) + jnp.take(s_col, col)
    logits = _leaky(z, negative_slope)
    alpha = edge_softmax(sparse, logits)
    return spmm(sparse.set_values(alpha.astype(jnp.float32)), x, "sum")
