"""Pure-XLA sparse kernels: gather + segment reductions.

These are (a) the always-available fallback on any backend, (b) the
correctness oracle the Pallas kernels are tested against, and (c) genuinely
fast on TPU for small/medium graphs because XLA fuses the gather, the
multiply, and the scatter-add.

Semantics match the reference CUDA kernels exactly:
- empty rows produce 0 for every reduction
  (include/cuda/spmm_cuda.cuh:46-48),
- MAX/MIN track the *first* strictly-improving edge as the arg-residual
  (include/cuda/spmm_cuda.cuh:38-41: update on strict `<`/`>`),
- MEAN divides by the row degree (include/cuda/spmm_cuda.cuh:43-45),
- missing values mean implicit 1.0 (include/cuda/cuda_util.cuh:139-146),
- semiring combine is compute(edge, feat) with SUB = feat - edge and
  DIV = feat / edge (include/gspmm.h:67-91).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dgsparse_tpu.ops.types import ComputeOp, ReduceOp


def combine(compute: ComputeOp, edge_vals: jax.Array, feats: jax.Array) -> jax.Array:
    """Semiring combine; edge_vals is [nnz] (broadcast against [nnz, F]),
    or already shaped to broadcast (same ndim as feats)."""
    e = edge_vals if edge_vals.ndim == feats.ndim else edge_vals[:, None]
    if compute == ComputeOp.ADD:
        return feats + e
    if compute == ComputeOp.SUB:
        return feats - e
    if compute == ComputeOp.MUL:
        return feats * e
    if compute == ComputeOp.DIV:
        return feats / e
    raise ValueError(compute)


def segment_reduce(
    contrib: jax.Array,
    seg_ids: jax.Array,
    num_segments: int,
    reduce: ReduceOp,
    degrees: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Reduce per-edge contributions [nnz, F] into [num_segments, F].

    Returns (out, arg_edge) where arg_edge is the int32 winning-edge index per
    output element for MAX/MIN (sentinel = nnz for empty/never-won), else
    None. Empty segments yield 0.
    """
    nnz = contrib.shape[0]
    if reduce in (ReduceOp.SUM, ReduceOp.MEAN):
        out = jax.ops.segment_sum(contrib, seg_ids, num_segments=num_segments)
        if reduce == ReduceOp.MEAN:
            if degrees is None:
                degrees = jnp.bincount(seg_ids, length=num_segments)
            out = out / jnp.maximum(degrees, 1).astype(out.dtype)[:, None]
        return out, None

    if reduce == ReduceOp.MAX:
        out = jax.ops.segment_max(contrib, seg_ids, num_segments=num_segments)
    else:
        out = jax.ops.segment_min(contrib, seg_ids, num_segments=num_segments)

    # Winning edge: the first edge attaining the extremum (reference updates
    # the arg index only on strict improvement, so ties keep the earliest).
    is_win = contrib == out[seg_ids]
    eids = jnp.arange(nnz, dtype=jnp.int32)[:, None]
    arg_edge = jax.ops.segment_min(
        jnp.where(is_win, eids, jnp.int32(nnz)),
        seg_ids,
        num_segments=num_segments,
    )
    # Empty segments: ±inf identity -> 0, matching the reference.
    out = jnp.where(jnp.isfinite(out), out, jnp.zeros_like(out))
    return out, arg_edge


def spmm_forward(
    coo_row: jax.Array,
    col: jax.Array,
    values: Optional[jax.Array],
    dense: jax.Array,
    num_rows: int,
    reduce: ReduceOp,
    degrees: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """CSR SpMM: out[m] = reduce_{e=(m,c)} values[e] * dense[c].

    Reference: csrspmm_seqreduce_rowbalance_kernel
    (include/cuda/spmm_cuda.cuh:10-55).

    On very large graphs the edge axis is chunked so the [nnz, F]
    contribution buffer never materializes (115M edges at F=64 is 29 GB
    — the un-chunked form cannot allocate on a 16 GB chip; the lean-mode
    analog of the reference's grid-strided launches). SUM/MEAN chunks
    add partials; MAX/MIN merge chunk extrema with exact first-winner
    tie semantics (strict improvement takes the chunk's winner, an exact
    tie keeps the smaller edge id — identical to the one-shot form).
    """
    nnz = col.shape[0]
    f = dense.shape[-1]
    per = spmm_chunk_edges(f)
    if reduce in (ReduceOp.MAX, ReduceOp.MIN) and nnz > per:
        is_max = reduce == ReduceOp.MAX
        ident = -jnp.inf if is_max else jnp.inf
        out = jnp.full((num_rows, f), ident, dense.dtype)
        arg = jnp.full((num_rows, f), jnp.int32(nnz), jnp.int32)
        for e0 in range(0, nnz, per):
            e1 = min(e0 + per, nnz)
            c = jax.lax.slice(col, (e0,), (e1,))
            r = jax.lax.slice(coo_row, (e0,), (e1,))
            contrib = jnp.take(dense, c, axis=0)
            if values is not None:
                v = jax.lax.slice(values, (e0,), (e1,))
                contrib = contrib * v[:, None].astype(contrib.dtype)
            if is_max:
                part = jax.ops.segment_max(contrib, r,
                                           num_segments=num_rows,
                                           indices_are_sorted=True)
            else:
                part = jax.ops.segment_min(contrib, r,
                                           num_segments=num_rows,
                                           indices_are_sorted=True)
            is_win = contrib == part[r]
            eids = jnp.arange(e0, e1, dtype=jnp.int32)[:, None]
            argc = jax.ops.segment_min(
                jnp.where(is_win, eids, jnp.int32(nnz)), r,
                num_segments=num_rows, indices_are_sorted=True)
            better = part > out if is_max else part < out
            eq = part == out
            arg = jnp.where(better, argc,
                            jnp.where(eq, jnp.minimum(arg, argc), arg))
            out = jnp.maximum(out, part) if is_max \
                else jnp.minimum(out, part)
        out = jnp.where(jnp.isfinite(out), out, jnp.zeros_like(out))
        return out, arg
    if reduce in (ReduceOp.SUM, ReduceOp.MEAN) and nnz > per:
        out = jnp.zeros((num_rows, f), jnp.float32)
        for e0 in range(0, nnz, per):
            e1 = min(e0 + per, nnz)
            c = jax.lax.slice(col, (e0,), (e1,))
            r = jax.lax.slice(coo_row, (e0,), (e1,))
            contrib = jnp.take(dense, c, axis=0).astype(jnp.float32)
            if values is not None:
                v = jax.lax.slice(values, (e0,), (e1,))
                contrib = contrib * v[:, None].astype(jnp.float32)
            out = out + jax.ops.segment_sum(
                contrib, r, num_segments=num_rows,
                indices_are_sorted=True)
        if reduce == ReduceOp.MEAN:
            if degrees is None:
                degrees = jnp.bincount(coo_row, length=num_rows)
            out = out / jnp.maximum(degrees, 1).astype(out.dtype)[:, None]
        return out.astype(dense.dtype), None
    gathered = jnp.take(dense, col, axis=0)
    if values is not None:
        gathered = gathered * values[:, None].astype(gathered.dtype)
    return segment_reduce(gathered, coo_row, num_rows, reduce, degrees)


def sddmm(
    coo_row: jax.Array,
    col: jax.Array,
    d1: jax.Array,
    d2: jax.Array,
    reduce: ReduceOp = ReduceOp.SUM,
    degrees: Optional[jax.Array] = None,
    rowptr: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-edge dot products: out[e] = dot(d1[row_e], d2[col_e]).

    With reduce=MEAN the dot is divided by the row degree — the exact
    behaviour the SpMM-mean backward needs (src/cuda/spmm_cuda.cu:331-361).
    Reference: sddmmCSR2Scale/sddmmCSR1Scale
    (include/cuda/sddmm_cuda.cuh:222-401).

    When `rowptr` is given AND rows are short, the d1 side is expanded
    with `jnp.repeat` over the (monotonic) row segments instead of a
    random row gather — measured 2x on arxiv-scale F=64 (16.6 -> 8.5 ms;
    the repeat's monotone access pattern streams where the gather is
    issue-bound, benchmark/probe_sddmm.py). For LONG rows (reddit-scale
    avg degree ~500) the coo_row gather re-reads one cached row per
    segment and already streams — there the repeat lowering (cumsum +
    gather) measured 2x SLOWER on bf16 — so the expansion is gated on
    average degree.
    """
    if rowptr is not None and _repeat_wins(rowptr, col.shape[0]):
        deg = rowptr[1:] - rowptr[:-1]
        d1e = jnp.repeat(d1, deg, axis=0,
                         total_repeat_length=col.shape[0])
    else:
        d1e = jnp.take(d1, coo_row, axis=0)
    out = (d1e * jnp.take(d2, col, axis=0)).sum(axis=1)
    if reduce == ReduceOp.MEAN:
        if degrees is None:
            raise ValueError("degrees required for MEAN sddmm")
        deg = jnp.take(jnp.maximum(degrees, 1).astype(out.dtype), coo_row)
        out = out / deg
    return out


def _repeat_wins(rowptr, nnz: int) -> bool:
    """Static gate: repeat-expansion beats the d1 row gather only when
    rows are short (avg degree <= 64); see sddmm docstring."""
    m = rowptr.shape[0] - 1
    return nnz <= 64 * max(m, 1)


# Largest gathered [chunk, F] buffer the chunked SDDMM materializes at
# once; 115M-edge graphs at F=64 would need 29 GB un-chunked.
_SDDMM_CHUNK_BUDGET = 512 << 20
# Same budget for the XLA SpMM's [nnz, F] contribution buffer.
_SPMM_CHUNK_BUDGET = 512 << 20


def spmm_chunk_edges(f: int) -> int:
    """Edges per chunk for the [nnz, F] fp32 buffers of the XLA SpMM
    forward AND its maxmin backward — one formula so the two sides can
    never disagree about when chunking engages."""
    return max(_SPMM_CHUNK_BUDGET // (4 * max(f, 1)), 1)


def sddmm_chunked(
    coo_row: jax.Array,
    col: jax.Array,
    d1: jax.Array,
    d2: jax.Array,
    reduce: ReduceOp = ReduceOp.SUM,
    degrees: Optional[jax.Array] = None,
    rowptr: Optional[jax.Array] = None,
) -> jax.Array:
    """Edge-chunked SDDMM: identical semantics to `sddmm`, but the
    [nnz, F] gather buffers are materialized one static chunk at a time so
    graphs whose full contribution tensor exceeds HBM still run (the SpMM
    lean-mode analog for SDDMM; role parity with the reference's
    grid-strided launch, src/sddmm/sddmm.cu:8-41)."""
    nnz = coo_row.shape[0]
    f = d1.shape[-1]
    per = max(_SDDMM_CHUNK_BUDGET // (4 * max(f, 1)), 1)
    if nnz <= per:
        return sddmm(coo_row, col, d1, d2, reduce, degrees, rowptr)
    outs = []
    for e0 in range(0, nnz, per):
        e1 = min(e0 + per, nnz)
        c = jax.lax.slice(col, (e0,), (e1,))
        if rowptr is not None and _repeat_wins(rowptr, nnz):
            # expand the sorted d1 side by repeat over the chunk's slice
            # of the row segments (clipped rowptr): monotone streaming
            # access, measured 2x over the random row gather (see sddmm)
            rp_c = jnp.clip(rowptr, e0, e1)
            deg_c = rp_c[1:] - rp_c[:-1]
            a = jnp.repeat(d1, deg_c, axis=0, total_repeat_length=e1 - e0)
        else:
            r = jax.lax.slice(coo_row, (e0,), (e1,))
            a = jnp.take(d1, r, axis=0)
        outs.append(jnp.einsum("ef,ef->e", a, jnp.take(d2, c, axis=0)))
    out = jnp.concatenate(outs)
    if reduce == ReduceOp.MEAN:
        if degrees is None:
            raise ValueError("degrees required for MEAN sddmm")
        deg = jnp.take(jnp.maximum(degrees, 1).astype(out.dtype), coo_row)
        out = out / deg
    return out


def sddmm_bwd_chunked(
    seg_ids: jax.Array,      # [nnz] segment ids (coo_row or csc_col), sorted
    other_ids: jax.Array,    # [nnz] gather ids (col or row_csc)
    g: jax.Array,            # [nnz] cotangent (same edge order)
    other: jax.Array,        # [N_other, F] the gathered dense operand
    num_segments: int,
) -> jax.Array:
    """Chunked d_d1/d_d2 for SDDMM: segment_sum of g[e]*other[other_ids[e]]
    one edge chunk at a time (each chunk's partial covers all segments —
    absolute ids stay sorted within a chunk — and partials add)."""
    nnz = seg_ids.shape[0]
    f = other.shape[-1]
    per = max(_SDDMM_CHUNK_BUDGET // (4 * max(f, 1)), 1)
    if nnz <= per:
        return jax.ops.segment_sum(
            jnp.take(other, other_ids, axis=0) * g[:, None], seg_ids,
            num_segments=num_segments, indices_are_sorted=True)
    out = None
    for e0 in range(0, nnz, per):
        e1 = min(e0 + per, nnz)
        sid = jax.lax.slice(seg_ids, (e0,), (e1,))
        oid = jax.lax.slice(other_ids, (e0,), (e1,))
        gc = jax.lax.slice(g, (e0,), (e1,))
        part = jax.ops.segment_sum(
            jnp.take(other, oid, axis=0) * gc[:, None], sid,
            num_segments=num_segments, indices_are_sorted=True)
        out = part if out is None else out + part
    return out


def gspmm_forward(
    coo_row: jax.Array,
    col: jax.Array,
    values: Optional[jax.Array],
    dense: jax.Array,
    num_rows: int,
    reduce: ReduceOp,
    compute: ComputeOp,
    degrees: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Generalized semiring SpMM (reference: src/gspmm-fp/gspmm.cu).

    out[m] = reduce_{e=(m,c)} compute(values[e], dense[c]); values=None means
    copy_u (no combine).
    """
    gathered = jnp.take(dense, col, axis=0)
    if values is not None:
        gathered = combine(compute, values.astype(gathered.dtype), gathered)
    return segment_reduce(gathered, coo_row, num_rows, reduce, degrees)
