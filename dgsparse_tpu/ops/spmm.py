"""CSR SpMM with sum/max/min/mean reductions and full autodiff.

This is the TPU-native analog of the reference's torch autograd layer
(src/spmm.cpp:36-270) + CUDA dispatch (src/cuda/spmm_cuda.cu:14-303):

- forward: out[m] = reduce_{e=(m,c)} values[e] * dense[c]
- backward (SUM/MEAN), exactly the reference gradient structure:
    d_values = SDDMM(grad, dense)          (src/spmm.cpp:66)
    d_dense  = A^T · grad via the cached CSC view (src/spmm.cpp:72-74)
- backward (MAX/MIN): masked by the saved winning-edge residual — the TPU
  formulation of the reference's `E` argmax tensor + masked kernels
  (src/spmm.cpp:108-134, include/cuda/spmm_cuda.cuh:400-433). Instead of an
  [M,F] column-index tensor consumed by masked SDDMM/SpMM kernels, we save
  the winning *edge id* per output element and scatter gradients directly.

Algorithm selection (Algorithm enum) is static at trace time: it picks which
compiled implementation runs — the XLA segment-op path or a Pallas kernel.
"""

from functools import partial


import jax
import jax.numpy as jnp
import numpy as np

from dgsparse_tpu.core.formats import SparseTensor
from dgsparse_tpu.kernels import xla as kx
from dgsparse_tpu.ops.types import Algorithm, ReduceOp, as_algorithm, as_reduce

_FLOAT0 = jax.dtypes.float0


def _int_zero(x):
    return np.zeros(x.shape, dtype=_FLOAT0)


def _ell_maxmin_fits(ell, f: int) -> bool:
    """The ELL max/min BACKWARD materializes several [slots, F] winner
    buffers at once (they cannot row-chunk: the repeat expansion spans the
    whole plan) — gate the ELL max/min path on their size so 100M-edge
    single-K plans route to the edge-chunked XLA formulation instead.
    Forward and backward MUST agree on this (the argmax residual space
    differs: K-slot vs edge ids)."""
    from dgsparse_tpu.core.planner import BucketedEllPlan, EllPlan

    if isinstance(ell, BucketedEllPlan):
        slots = sum(rb * k for rb, k in zip(ell.rbs, ell.ks))
    elif isinstance(ell, EllPlan):
        slots = ell.cols.size
    else:
        return False
    return slots * f * 4 <= (1 << 30)


def _forward_impl(reduce: ReduceOp, algorithm: Algorithm, has_value: bool,
                  idx, values, dense):
    """Dispatch the forward kernel. idx = (rowptr, col, coo_row, colptr,
    row_csc, perm, plan_fwd, plan_bwd, bell_fwd, bell_bwd, ell_fwd,
    csc_col, vslot, mm_comp). vslot (dict or None) carries plan-slot-cached values
    (core/formats.py _build_vslot) — skips the per-call 1-D value gather."""
    (rowptr, col, coo_row, _, _, _, plan_fwd, _, bell_fwd, _,
     ell_fwd, _, vslot, _, _) = idx
    num_rows = rowptr.shape[0] - 1
    degrees = (rowptr[1:] - rowptr[:-1]) if reduce == ReduceOp.MEAN else None
    vals = values if has_value else None
    # vslot survives has_value=False: the ones-default build caches the
    # hybrid dense-cell materialization (all other entries are None there)

    algorithm = _resolve_algorithm(algorithm, plan_fwd, bell_fwd,
                                   col.shape[0], reduce, ell_fwd)
    from dgsparse_tpu.utils import metrics

    metrics.record("spmm", alg=algorithm.name, reduce=reduce.value,
                   nnz=col.shape[0], feat=dense.shape[-1],
                   cached_values=vslot is not None)
    if algorithm == Algorithm.PALLAS_ROW_TILE and ell_fwd is not None \
            and reduce in (ReduceOp.SUM, ReduceOp.MEAN):
        from dgsparse_tpu.core.planner import (BucketedEllPlan,
                                               ColChunkedEllPlan,
                                               HybridPlan)
        from dgsparse_tpu.kernels import pallas_spmm as kp

        w = vslot["ell"] if vslot is not None else None
        wp = vslot.get("ell_p") if isinstance(vslot, dict) else None
        if isinstance(ell_fwd, HybridPlan):
            # bf16 inputs run the whole hybrid in bf16 compute (single-
            # pass cell matmuls, cached bf16 cell blocks); accumulation
            # stays f32 inside every tier
            cd = jnp.bfloat16 if dense.dtype == jnp.bfloat16 \
                else jnp.float32
            out = kp.spmm_hybrid(ell_fwd, vals, dense, reduce, degrees,
                                 compute_dtype=cd, w_slot=w, wp_slot=wp)
        elif isinstance(ell_fwd, ColChunkedEllPlan):
            wc = vslot.get("ell_c") if isinstance(vslot, dict) else None
            out = kp.spmm_col_chunked_ell(ell_fwd, vals, dense, reduce,
                                          degrees, w_slot=wc)
        elif isinstance(ell_fwd, BucketedEllPlan):
            out = kp.spmm_bucketed_ell(ell_fwd, vals, dense, reduce,
                                       degrees, w_slot=w, wp_slot=wp)
        else:
            out = kp.spmm_ell(ell_fwd, vals, dense, reduce, degrees,
                              w_slot=w, wp_slot=wp)
        return out.astype(dense.dtype), None
    if algorithm == Algorithm.PALLAS_BELL and bell_fwd is not None \
            and reduce in (ReduceOp.SUM, ReduceOp.MEAN):
        from dgsparse_tpu.kernels import pallas_spmm as kp

        out = kp.spmm_bell(bell_fwd, vals, dense, reduce, degrees,
                           w_slot=vslot["bell"] if vslot else None)
        return out.astype(dense.dtype), None
    if algorithm in (Algorithm.PALLAS_ROW_TILE, Algorithm.PALLAS_EDGE_TILE,
                     Algorithm.PALLAS_BELL):
        if dense.shape[-1] > 2048:
            # single-F-block VMEM budget; wide features go to XLA
            return kx.spmm_forward(coo_row, col, vals, dense, num_rows,
                                   reduce, degrees)
        if plan_fwd is None:
            # No plan (structure built under jit): XLA segment path.
            return kx.spmm_forward(coo_row, col, vals, dense, num_rows,
                                   reduce, degrees)
        if reduce in (ReduceOp.MAX, ReduceOp.MIN):
            from dgsparse_tpu.core.planner import BucketedEllPlan, EllPlan

            if algorithm == Algorithm.PALLAS_ROW_TILE and \
                    isinstance(ell_fwd, (EllPlan, BucketedEllPlan)) and \
                    _ell_maxmin_fits(ell_fwd, dense.shape[-1]):
                from dgsparse_tpu.kernels.pallas_spmm import \
                    spmm_ell_maxmin

                w = (vslot["ell"] if vslot is not None
                     and not isinstance(vslot["ell"], (tuple, dict))
                     else None)
                return spmm_ell_maxmin(ell_fwd, vals, dense, reduce,
                                       w_slot=w)
            if plan_fwd.padded_edges >= 2 ** 24:
                # the ESC max/min kernel carries global slot ids in f32,
                # exact only below 2^24 — fall back to XLA beyond that
                return kx.spmm_forward(coo_row, col, vals, dense, num_rows,
                                       reduce, degrees)
            from dgsparse_tpu.kernels.pallas_spmm_maxmin import \
                spmm_maxmin_esc

            return spmm_maxmin_esc(plan_fwd, vals, dense, reduce)
        from dgsparse_tpu.kernels import pallas_spmm as kp

        return kp.spmm_esc(plan_fwd, vals, dense, reduce, degrees,
                           w_slot=vslot["esc"] if vslot else None), None
    return kx.spmm_forward(coo_row, col, vals, dense, num_rows, reduce,
                           degrees)


def _resolve_algorithm(algorithm: Algorithm, plan, bell, nnz: int,
                       reduce: ReduceOp, ell=None) -> Algorithm:
    """AUTO heuristic (≈ gespmmAlgSel, src/ge-spmm/gespmm.cc:13-24): the
    fully-MXU BELL kernel when the structure is dense enough to tile 2D,
    else the Pallas edge-tile kernel when a plan exists, else the XLA
    segment path (and always XLA for MAX/MIN, which need argmax residuals —
    like the reference GE-SpMM lib, the fast paths are sum-only)."""
    if algorithm != Algorithm.AUTO:
        return algorithm
    if jax.default_backend() == "tpu" and nnz >= 4096:
        from dgsparse_tpu.core.planner import (BucketedEllPlan,
                                               ColChunkedEllPlan, EllPlan,
                                               HybridPlan)

        # hybrid (dense cells -> BELL MXU + residue ELL) first: it only
        # exists when >= 30% of edges escaped the gather entirely
        if isinstance(ell, HybridPlan) and reduce in (ReduceOp.SUM,
                                                      ReduceOp.MEAN):
            return Algorithm.PALLAS_ROW_TILE
        # measured on v5e: single-K ELL 3.6x over ESC on regular graphs;
        # bucketed ELL 1.65x over ESC at pad 1.39 and at-parity-or-better
        # up to pad ~1.9 (two sessions) — gate at 2.0.
        if isinstance(ell, EllPlan) or (
                isinstance(ell, BucketedEllPlan)
                and ell.pad_ratio() <= 2.0) or (
                # chunked plans passed their own build-time pad guard
                # (<= max(2.5, 1.6x base)) — accept what the wrapper chose
                isinstance(ell, ColChunkedEllPlan)
                and ell.pad_ratio() <= 2.5):
            # SUM/MEAN: gather + K-sum; MAX/MIN: masked K-axis reduce with
            # K-slot argmax residuals (no scan, no segment) — both beat the
            # segment formulations whenever the ELL padding is bounded.
            return Algorithm.PALLAS_ROW_TILE
        if bell is not None and reduce in (ReduceOp.SUM, ReduceOp.MEAN):
            return Algorithm.PALLAS_BELL
        if plan is not None and plan.pad_ratio() <= 4.0:
            return Algorithm.PALLAS_EDGE_TILE
    return Algorithm.XLA_SEGMENT


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _spmm(reduce: ReduceOp, algorithm: Algorithm, has_value: bool, idx,
          values, dense):
    out, _ = _forward_impl(reduce, algorithm, has_value, idx, values, dense)
    return out


def _spmm_fwd(reduce, algorithm, has_value, idx, values, dense):
    out, arg_edge = _forward_impl(reduce, algorithm, has_value, idx, values,
                                  dense)
    return out, (idx, values, dense, arg_edge)


def _spmm_bwd(reduce, algorithm, has_value, residuals, g):
    idx, values, dense, arg_edge = residuals
    (rowptr, col, coo_row, colptr, row_csc, perm, plan_fwd, plan_bwd,
     bell_fwd, bell_bwd, ell_fwd, csc_col, vslot, mm_comp, mm_bwd) = idx
    num_rows = rowptr.shape[0] - 1
    nnz = col.shape[0]
    if reduce in (ReduceOp.SUM, ReduceOp.MEAN):
        if reduce == ReduceOp.MEAN:
            deg = jnp.maximum(rowptr[1:] - rowptr[:-1], 1).astype(g.dtype)
            g = g / deg[:, None]
        # d_values = SDDMM(grad, dense): per-edge dot (src/spmm.cpp:66).
        # Always the 2-row-gather XLA formulation — measured faster than
        # the Pallas sddmm kernel at every scale (see ops/sddmm.py);
        # edge-chunked so 100M+-edge graphs fit.
        if not has_value:
            d_values = jnp.zeros_like(values)
        else:
            d_values = kx.sddmm_chunked(coo_row, col, g, dense,
                                        rowptr=rowptr).astype(values.dtype)
        # d_dense = A^T · grad via cached CSC (src/spmm.cpp:72-74), on the
        # same kernel path as the forward (transpose plans for Pallas).
        from dgsparse_tpu.core.planner import HybridPlan

        # pass ell only for hybrid plans: the transpose of a plain ELL
        # forward still routes through the bwd plans below
        alg = _resolve_algorithm(
            algorithm, plan_bwd, bell_bwd, nnz, ReduceOp.SUM,
            ell_fwd if isinstance(ell_fwd, HybridPlan) else None)
        if alg == Algorithm.PALLAS_ROW_TILE \
                and isinstance(ell_fwd, HybridPlan) \
                and ell_fwd.ell_t is not None:
            # hybrid transpose: dense cells reuse the SAME materialized
            # blocks with swapped contraction dims; residue runs the
            # transpose bucketed-ELL plan
            from dgsparse_tpu.kernels import pallas_spmm as kp

            w = vslot["ell"] if vslot is not None else None
            cd = jnp.bfloat16 if g.dtype == jnp.bfloat16 \
                else jnp.float32
            d_dense = kp.spmm_hybrid_t(
                ell_fwd, values if has_value else None, g,
                compute_dtype=cd, w_slot=w).astype(dense.dtype)
        elif alg == Algorithm.PALLAS_BELL and bell_bwd is not None:
            from dgsparse_tpu.kernels import pallas_spmm as kp

            if vslot is not None:
                d_dense = kp.spmm_bell(
                    bell_bwd, None, g,
                    w_slot=vslot["bell_t"]).astype(dense.dtype)
            else:
                vals_t = jnp.take(values, perm) if has_value else None
                d_dense = kp.spmm_bell(bell_bwd, vals_t,
                                       g).astype(dense.dtype)
        elif alg in (Algorithm.PALLAS_ROW_TILE, Algorithm.PALLAS_EDGE_TILE,
                     Algorithm.PALLAS_BELL) and plan_bwd is not None:
            from dgsparse_tpu.kernels import pallas_spmm as kp

            if vslot is not None:
                d_dense = kp.spmm_esc(
                    plan_bwd, None, g,
                    w_slot=vslot["esc_t"]).astype(dense.dtype)
            else:
                vals_t = jnp.take(values, perm) if has_value else None
                d_dense = kp.spmm_esc(plan_bwd, vals_t,
                                      g).astype(dense.dtype)
        else:
            contrib = jnp.take(g, row_csc, axis=0)
            if has_value:
                vals_csc = (vslot["csc"] if vslot is not None
                            else jnp.take(values, perm))
                contrib = contrib * vals_csc[:, None].astype(g.dtype)
            d_dense = jax.ops.segment_sum(
                contrib, csc_col, num_segments=dense.shape[0],
                indices_are_sorted=True,
            ).astype(dense.dtype)
    else:
        # MAX/MIN: gradient flows only through the winning edge per output
        # element (masked variants, src/spmm.cpp:127-134,183-190).
        # A per-(output, feature) element scatter (.at[win_col, f].add) is
        # catastrophically serialized on TPU (measured 66 ms for p2p@F=32),
        # so both paths build winner MASKS via row gathers and finish with
        # a row-granular sorted segment reduction. The dispatch decision is
        # fully static, so recomputing it reproduces the forward's choice.
        alg_mm = _resolve_algorithm(algorithm, plan_fwd, bell_fwd, nnz,
                                    reduce, ell_fwd)
        from dgsparse_tpu.core.planner import BucketedEllPlan, EllPlan

        any_pallas = (alg_mm in (Algorithm.PALLAS_ROW_TILE,
                                 Algorithm.PALLAS_EDGE_TILE,
                                 Algorithm.PALLAS_BELL)
                      and g.shape[-1] <= 2048 and plan_fwd is not None)
        used_ell = (any_pallas and alg_mm == Algorithm.PALLAS_ROW_TILE
                    and isinstance(ell_fwd, (EllPlan, BucketedEllPlan))
                    and _ell_maxmin_fits(ell_fwd, g.shape[-1]))
        # mirror the forward's f32-slot-id guard on the ESC max/min kernel
        used_pallas = any_pallas and (
            used_ell or plan_fwd.padded_edges < 2 ** 24)
        g32 = g.astype(jnp.float32)
        if used_ell:
            # ELL forward → `arg_edge` is the winning K-SLOT per element, in
            # bucket-concat row order. Winner masks come from comparing
            # against a K iota — NO gather at all for the mask. FLAT
            # formulation: expand arg/g rows to slot space with jnp.repeat
            # over the static per-row K (monotone streaming access — the
            # same trick as the SDDMM d1 expansion) instead of a ~40-bucket
            # loop of [rb,K,F] intermediates + concat (measured: the bucket
            # loop's contrib build alone cost ~30 ms at arxiv-2.5M F=64,
            # benchmark/probe_maxmin_bwd.py).
            from dgsparse_tpu.core.planner import BucketedEllPlan

            if isinstance(ell_fwd, BucketedEllPlan):
                rbs, ks = ell_fwd.rbs, ell_fwd.ks
                g_cat = jnp.take(g32, ell_fwd.rows, axis=0)
            else:
                rbs, ks = (ell_fwd.num_rows,), (ell_fwd.k,)
                g_cat = g32
            if mm_bwd is not None and plan_bwd is not None:
                # BWD-SLOT-SPACE formulation (round 4): the flat fwd-space
                # path below materializes ~6 [slots, F] buffers (two
                # jnp.repeat expansions, the winner mask, the fwd-col
                # feats gather, contrib, and a random [slots, F]
                # permutation gather through mm_comp). All of it collapses
                # by evaluating the winner test directly at each bwd slot
                # via plan-time index compositions (Storage.mm_bwd):
                # rows/kidx give the fwd (bucket-concat row, K slot) of
                # every bwd slot, so win = arg[row] == kidx — and the
                # segment_matmul input is built in ONE pass. d_values'
                # feats gather keys on the bwd plan's own segment rows,
                # which are SORTED (CSC order) instead of random fwd cols.
                valid_b = plan_bwd.eperm >= 0
                rows_b = mm_bwd["rows"]
                # ONE fused gather for (g, arg): the row gather is
                # issue-bound (flat per-row cost through 512 B rows, §5
                # of BENCHMARKS), so gathering a [CR, 2F] concat costs
                # the same per row as either [CR, F] table alone — the
                # int32 argmax rides bitcast as f32 lanes.
                f_w = g_cat.shape[-1]
                comb = jnp.concatenate(
                    [g_cat,
                     jax.lax.bitcast_convert_type(
                         arg_edge.astype(jnp.int32), jnp.float32)], axis=1)
                comb_rows = jnp.take(comb, rows_b, axis=0)
                arg_rows = jax.lax.bitcast_convert_type(
                    comb_rows[:, f_w:], jnp.int32)
                win_b = jnp.logical_and(arg_rows == mm_bwd["kidx"][:, None],
                                        valid_b[:, None])
                g_win_b = jnp.where(win_b, comb_rows[:, :f_w], 0)
                if has_value:
                    rows_slot_b = (jnp.repeat(plan_bwd.tile_rb,
                                              plan_bwd.edge_tile)
                                   * plan_bwd.row_block + plan_bwd.lrow)
                    safe_rows_b = jnp.minimum(rows_slot_b,
                                              dense.shape[0] - 1)
                    feats_b = jnp.take(dense, safe_rows_b,
                                       axis=0).astype(jnp.float32)
                    dv_b = jnp.sum(g_win_b * feats_b, axis=-1)
                    d_values = jnp.take(dv_b, mm_bwd["epos"]).astype(
                        values.dtype)
                    v_b = (vslot["esc_t"] if isinstance(vslot, dict)
                           and vslot.get("esc_t") is not None else None)
                    if v_b is None:
                        v_csc = jnp.take(values, perm)
                        v_b = jnp.where(
                            valid_b,
                            jnp.take(v_csc,
                                     jnp.maximum(plan_bwd.eperm, 0)), 0)
                    csl = g_win_b * v_b[:, None].astype(jnp.float32)
                else:
                    d_values = jnp.zeros_like(values)
                    csl = g_win_b
                from dgsparse_tpu.kernels.pallas_spmm import segment_matmul

                d_dense = segment_matmul(
                    csl, plan_bwd.lrow, plan_bwd.tile_rb,
                    plan_bwd.num_tiles, plan_bwd.edge_tile,
                    plan_bwd.row_block,
                    plan_bwd.num_row_blocks * plan_bwd.row_block,
                )[:dense.shape[0]].astype(dense.dtype)
                d_idx = jax.tree.map(_int_zero, idx)
                return d_idx, d_values, d_dense
            flat_n = sum(rb * k for rb, k in zip(rbs, ks))
            adt = arg_edge.dtype
            reps = (jnp.full((rbs[0],), ks[0], jnp.int32)
                    if len(ks) == 1 else
                    jnp.concatenate([jnp.full((rb,), k, jnp.int32)
                                     for rb, k in zip(rbs, ks)]))
            slot_k = (jnp.tile(jnp.arange(ks[0], dtype=adt), rbs[0])
                      if len(ks) == 1 else
                      jnp.concatenate([jnp.tile(jnp.arange(k, dtype=adt),
                                                rb)
                                       for rb, k in zip(rbs, ks)]))
            arg_flat = jnp.repeat(arg_edge, reps, axis=0,
                                  total_repeat_length=flat_n)
            g_flat = jnp.repeat(g_cat, reps, axis=0,
                                total_repeat_length=flat_n)
            eperm_flat = ell_fwd.eperm.reshape(-1)
            win = jnp.logical_and(arg_flat == slot_k[:, None],
                                  (eperm_flat >= 0)[:, None])
            g_win = jnp.where(win, g_flat, 0)                # [slots, F]
            if has_value:
                feats = jnp.take(dense, ell_fwd.cols.reshape(-1),
                                 axis=0).astype(jnp.float32)
                dv_flat = jnp.sum(g_win * feats, axis=-1)
                d_values = jnp.take(dv_flat, ell_fwd.inv).astype(
                    values.dtype)
                v_flat = jnp.take(values,
                                  jnp.maximum(eperm_flat, 0)).astype(
                                      jnp.float32)
                contrib_flat = g_win * v_flat[:, None]
            else:
                d_values = jnp.zeros_like(values)
                contrib_flat = g_win
            if mm_comp is not None and plan_bwd is not None:
                # Feed winner contributions straight into the one-hot MXU
                # segment matmul over the transpose ESC plan via the
                # precomputed bwd-slot -> fwd-ELL-slot permutation
                # (Storage._mm_comp). Measured 57.8 vs 71.6 ms for the
                # CSC-gather + XLA segment_sum route (arxiv F=64,
                # benchmark/probe_maxmin_bwd.py).
                from dgsparse_tpu.kernels.pallas_spmm import segment_matmul

                csl = jnp.take(contrib_flat, mm_comp, axis=0) \
                    * (plan_bwd.eperm >= 0)[:, None].astype(jnp.float32)
                d_dense = segment_matmul(
                    csl, plan_bwd.lrow, plan_bwd.tile_rb,
                    plan_bwd.num_tiles, plan_bwd.edge_tile,
                    plan_bwd.row_block,
                    plan_bwd.num_row_blocks * plan_bwd.row_block,
                )[:dense.shape[0]].astype(dense.dtype)
                d_idx = jax.tree.map(_int_zero, idx)
                return d_idx, d_values, d_dense
            contrib_csc = jnp.take(contrib_flat,
                                   jnp.take(ell_fwd.inv, perm), axis=0)
        elif used_pallas:
            # Pallas forward → `arg_edge` is in PLAN-SLOT space. Stay there:
            # converting slot→edge costs an [M,F] ELEMENT gather
            # (eperm[arg_slot], ~5 ns/element ≈ 40 ms for p2p@F=128 — it
            # dominated the backward). In slot space the winner test is a
            # ROW gather of arg against each slot's owning row, compared to
            # a slot iota; fwd plans keep CSR edge order within each row
            # (sort_cols=False), so earliest-slot ties == earliest-edge.
            plan = plan_fwd
            rows_slot = (jnp.repeat(plan.tile_rb, plan.edge_tile)
                         * plan.row_block + plan.lrow)       # [slots]
            safe_rows = jnp.minimum(rows_slot, plan.num_rows - 1)
            valid = plan.eperm >= 0                          # padding slots
            arg_rows = jnp.take(arg_edge, safe_rows, axis=0)  # [slots, F]
            sid = jnp.arange(plan.padded_edges,
                             dtype=arg_rows.dtype)[:, None]
            win = jnp.logical_and(arg_rows == sid, valid[:, None])
            g_rows = jnp.where(win, jnp.take(g32, safe_rows, axis=0), 0)
            if has_value:
                feats = jnp.take(dense, plan.cols,
                                 axis=0).astype(jnp.float32)
                d_values = jnp.take(jnp.sum(g_rows * feats, axis=-1),
                                    plan.inv_eperm).astype(values.dtype)
                v_slot = jnp.take(values, jnp.maximum(plan.eperm, 0))
                contrib = g_rows * v_slot[:, None].astype(jnp.float32)
            else:
                d_values = jnp.zeros_like(values)
                contrib = g_rows
            # slot → CSC edge order in one row gather via the composed
            # permutation (slot position of each CSC-ordered edge).
            contrib_csc = jnp.take(contrib, jnp.take(plan.inv_eperm, perm),
                                   axis=0)
        else:
            # XLA forward → `arg_edge` holds winning EDGE ids per element.
            from dgsparse_tpu.kernels import xla as _kx

            per = _kx.spmm_chunk_edges(g32.shape[-1])
            if nnz > per:
                # edge-chunked mirror of the chunked forward: the [nnz,F]
                # winner masks cannot materialize at 100M+ edges. d_dense
                # accumulates per chunk (unsorted col segment — correct;
                # reached for no-plan storages, F > 2048, and ESC plans
                # past the 2^24 f32-slot-id exactness bound).
                dd32 = jnp.zeros((dense.shape[0], g32.shape[-1]),
                                 jnp.float32)
                dv_parts = []
                for e0 in range(0, nnz, per):
                    e1 = min(e0 + per, nnz)
                    r = jax.lax.slice(coo_row, (e0,), (e1,))
                    c = jax.lax.slice(col, (e0,), (e1,))
                    arg_rows = jnp.take(arg_edge, r, axis=0)
                    eids = jnp.arange(e0, e1,
                                      dtype=arg_rows.dtype)[:, None]
                    win = arg_rows == eids
                    g_rows = jnp.where(win, jnp.take(g32, r, axis=0), 0)
                    if has_value:
                        dv_parts.append(jnp.sum(
                            g_rows * jnp.take(dense, c,
                                              axis=0).astype(jnp.float32),
                            axis=-1).astype(values.dtype))
                        v = jax.lax.slice(values, (e0,), (e1,))
                        g_rows = g_rows * v[:, None].astype(jnp.float32)
                    dd32 = dd32 + jax.ops.segment_sum(
                        g_rows, c, num_segments=dense.shape[0])
                d_values = (jnp.concatenate(dv_parts) if has_value
                            else jnp.zeros_like(values))
                d_dense = dd32.astype(dense.dtype)
                d_idx = jax.tree.map(_int_zero, idx)
                return d_idx, d_values, d_dense
            arg_rows = jnp.take(arg_edge, coo_row, axis=0)   # [nnz, F]
            eids = jnp.arange(nnz, dtype=arg_rows.dtype)[:, None]
            win = arg_rows == eids                           # [nnz, F]
            g_rows = jnp.where(win, jnp.take(g32, coo_row, axis=0), 0)
            if has_value:
                d_values = jnp.sum(
                    g_rows * jnp.take(dense, col,
                                      axis=0).astype(jnp.float32),
                    axis=-1).astype(values.dtype)
                contrib = g_rows * values[:, None].astype(jnp.float32)
            else:
                d_values = jnp.zeros_like(values)
                contrib = g_rows
            contrib_csc = jnp.take(contrib, perm, axis=0)
        # d_dense[c] = sum over edges (.,c) of contrib — transpose segment.
        # Measured (ablation, p2p@F=128): XLA sorted segment ~17 ms here vs
        # ~53 ms for the ESC segment-matmul route in this already-gather-
        # heavy backward — keep the sorted segment.
        d_dense = jax.ops.segment_sum(
            contrib_csc, csc_col, num_segments=dense.shape[0],
            indices_are_sorted=True).astype(dense.dtype)
        d_idx = jax.tree.map(_int_zero, idx)
        return d_idx, d_values, d_dense

    d_idx = jax.tree.map(_int_zero, idx)
    return d_idx, d_values, d_dense


_spmm.defvjp(_spmm_fwd, _spmm_bwd)


def effective_ell_plan(st, dense: jax.Array, reduce: ReduceOp,
                       algorithm: Algorithm):
    """The ELL/hybrid plan a SUM/MEAN row-tile execution should ride:
    the column-chunked variant (planner.ColChunkedEllPlan) when the
    storage built one for this gather-table size (the >16 MB slow-gather
    regime, docs/BENCHMARKS.md §2e), else the flat plan. Called BEFORE
    capturing vslot — a granularity rebuild refreshes the slot caches.
    MAX/MIN always get the flat plan (argmax residuals live in the
    unchunked slot space)."""
    ell = st.ell_plan()
    if reduce in (ReduceOp.SUM, ReduceOp.MEAN) and ell is not None \
            and algorithm in (Algorithm.AUTO, Algorithm.PALLAS_ROW_TILE):
        ce = st.ell_chunked(int(dense.shape[-1]),
                            jnp.dtype(dense.dtype).itemsize)
        if ce is not None:
            return ce
    return ell


def spmm(sparse: SparseTensor, dense: jax.Array, reduce="sum",
         algorithm=Algorithm.AUTO) -> jax.Array:
    """SpMM with a selectable reduction. Returns [M, F]."""
    reduce = as_reduce(reduce)
    algorithm = as_algorithm(algorithm)
    from dgsparse_tpu.utils.debug import maybe_validate

    maybe_validate(sparse)
    if dense.ndim != 2:
        raise ValueError(f"dense must be [N, F], got shape {dense.shape}")
    if dense.shape[0] != sparse.sparse_sizes()[1]:
        raise ValueError(
            f"dense rows {dense.shape[0]} != sparse num_cols "
            f"{sparse.sparse_sizes()[1]}")
    st = sparse.storage
    if algorithm == Algorithm.AUTO:
        # consult the persistent tuner cache (utils/tune.py) — a dict
        # lookup on the structure hash Storage precomputed; trace-time
        # static, zero device work
        from dgsparse_tpu.utils import tune as _tune

        tuned = _tune.lookup_key(getattr(st, "_tune_key", None),
                                 int(dense.shape[-1]), reduce)
        if tuned is not None:
            algorithm = tuned
    ell_eff = effective_ell_plan(st, dense, reduce, algorithm)
    values = sparse.values_or_ones()
    # slot caches are only valid for the exact values array the Storage was
    # built with (identity check — set_values/tracers rebuild or clear them)
    vslot = st.vslot() if (not sparse.has_value
                           or values is st.values()) else None
    if vslot is not None and reduce in (ReduceOp.SUM, ReduceOp.MEAN):
        # pre-expanded packed K-sum weights (see Storage.wp_slot): built
        # eagerly here, where the Python Storage object is reachable —
        # inside the custom_vjp everything is a tracer and the expansion
        # would be staged per call
        from dgsparse_tpu.kernels.pallas_spmm import (_lane_pack_on,
                                                      _pack_pad_width)

        f = int(dense.shape[-1])
        pw = _pack_pad_width(f)
        f_eff = pw if pw is not None else f
        if _lane_pack_on(f_eff):
            wp = st.wp_slot(f_eff, dense.dtype)
            if wp is not None:
                vslot = dict(vslot, ell_p=wp)
    idx = (st.rowptr(), st.col(), st.coo_row(), st.colptr(), st.row(),
           st.csr2csc(), st.plan(), st.plan(transpose=True),
           st.bell_plan(), st.bell_plan(transpose=True), ell_eff,
           st.csc_col(), vslot, st.mm_comp(), st.mm_bwd())
    return _spmm(reduce, algorithm, sparse.has_value, idx, values, dense)


def spmm_sum(sparse: SparseTensor, dense: jax.Array,
             algorithm=Algorithm.AUTO) -> jax.Array:
    """Reference parity: dgsparse/spmm.py:5-28 (spmm_sum)."""
    return spmm(sparse, dense, ReduceOp.SUM, algorithm)


def spmm_mean(sparse: SparseTensor, dense: jax.Array,
              algorithm=Algorithm.AUTO) -> jax.Array:
    """Reference parity: dgsparse/spmm.py:31-54 (spmm_mean)."""
    return spmm(sparse, dense, ReduceOp.MEAN, algorithm)


def spmm_max(sparse: SparseTensor, dense: jax.Array,
             algorithm=Algorithm.AUTO) -> jax.Array:
    """Reference parity: dgsparse/spmm.py:57-80 (spmm_max)."""
    return spmm(sparse, dense, ReduceOp.MAX, algorithm)


def spmm_min(sparse: SparseTensor, dense: jax.Array,
             algorithm=Algorithm.AUTO) -> jax.Array:
    """Reference parity: dgsparse/spmm.py:83-106 (spmm_min)."""
    return spmm(sparse, dense, ReduceOp.MIN, algorithm)
