"""Pallas TPU SpMM kernels.

Two schedules (SURVEY.md §7 step 4), selected by the Algorithm enum:

- **ESC (edge-tile segment-matmul)**, `Algorithm.PALLAS_EDGE_TILE`: the
  gather `B[col]` runs as an XLA gather fused with the value scaling (on
  current TPUs XLA's gather loop is the fastest general row-gather; measured
  here ~5 ns/row vs ~85 ns/row for per-row kernel DMA and ~30 cycles/row for
  in-kernel dynamic loads). The scatter — where XLA's scatter-add is
  catastrophically slow (~1.8 ms for 150K×32 on v5e) — is replaced by this
  kernel: per edge tile, a one-hot [R, E] matrix built from local row ids via
  iota-compare multiplies the [E, F] contributions on the MXU and accumulates
  into the owning output row block, which stays resident in VMEM across the
  tiles of that block (TPU grid steps execute in order, so revisiting
  replaces the reference's atomicAdd, include/cuda/spmm_cuda.cuh:87-99).
- Plan-time binning/padding (core/planner.py) replaces the reference's
  runtime load-balancing algorithm zoo (src/cuda/spmm_cuda.cu:36-165).

Like the reference's standalone GE-SpMM library (sum-only kernels,
src/ge-spmm/csrspmm_seqreduce.cu), the Pallas fast path covers SUM and MEAN
(mean pre-scales values by 1/degree); MAX/MIN route to the XLA segment path
which carries argmax residuals.
"""

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgsparse_tpu.core.planner import EdgeTilePlan
from dgsparse_tpu.ops.types import Algorithm, ReduceOp

_INTERPRET = False  # flipped by tests/conftest on CPU
# Largest gathered [slots, F] buffer one bucket may materialize before the
# row loop chunks it (see spmm_bucketed_ell); patchable for tests.
_GATHER_BUDGET_BYTES = 256 << 20


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = bool(value)


def _split_onehot_dot(onehot_bf16, x):
    """onehot @ x in ~fp32 with TWO bf16 MXU passes.

    The one-hot is exact in bf16, so splitting x into bf16 hi/lo halves
    (x = hi + lo with |lo| <= ulp(hi)/2) makes onehot@hi + onehot@lo an
    fp32-accurate sum at 1/3 the cost of Precision.HIGHEST (6 passes):
    measured 1123 -> ~400 ns/tile on v5e.

    INTERPRET mode takes the plain exact dot instead: interpreted kernels
    lower to regular XLA (not Mosaic), whose algebraic simplifier
    reassociates dot(s,hi)+dot(s,lo) -> dot(s,hi+lo) with the add in
    bf16 — which silently deletes the lo half (measured 0.19 max-abs on
    the p2p ESC backward under interpret-on-TPU, 2026-08-20, vs 3.2e-4
    compiled). Interpret is the testing/debug mode; exactness > speed."""
    if _INTERPRET:
        return jnp.dot(onehot_bf16.astype(jnp.float32),
                       x.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    x = x.astype(jnp.float32)
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = jnp.dot(onehot_bf16, hi, preferred_element_type=jnp.float32)
    return out + jnp.dot(onehot_bf16, lo, preferred_element_type=jnp.float32)


def _segment_matmul_kernel(row_block: int, edge_tile: int,
                           tile_rb_ref, lrow_ref, contrib_ref, out_ref):
    """out[rb] += onehot(lrow) @ contrib, accumulated across the consecutive
    tiles of each row block."""
    t = pl.program_id(0)
    lr = lrow_ref[0, 0, :]                                # [E]
    rows = jax.lax.broadcasted_iota(jnp.int32, (row_block, edge_tile), 0)
    s = (rows == lr[None, :]).astype(jnp.bfloat16)        # [R, E] exact 0/1
    if contrib_ref.dtype == jnp.bfloat16:
        # already-rounded inputs: one MXU pass loses nothing
        partial = jnp.dot(s, contrib_ref[:],
                          preferred_element_type=jnp.float32)
    else:
        partial = _split_onehot_dot(s, contrib_ref[:])

    prev = tile_rb_ref[jnp.maximum(t - 1, 0)]
    is_first = jnp.logical_or(t == 0, prev != tile_rb_ref[t])

    @pl.when(is_first)
    def _():
        out_ref[:] = partial.astype(out_ref.dtype)

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[:] = (out_ref[:].astype(jnp.float32) + partial).astype(
            out_ref.dtype)


def segment_matmul(
    contrib: jax.Array,        # [T*E, F_pad] tile-ordered contributions
    lrow: jax.Array,           # [T*E] local row ids (padding -> any, with 0 contrib)
    tile_rb: jax.Array,        # [T] owning row block per tile (nondecreasing)
    num_tiles: int,
    edge_tile: int,
    row_block: int,
    num_rows: int,
) -> jax.Array:
    """Sorted segment-sum as a Pallas one-hot MXU matmul. Returns [num_rows, F]."""
    f = contrib.shape[-1]
    kernel = functools.partial(_segment_matmul_kernel, row_block, edge_tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            # [T, 1, E] so the last-two block dims (1, E) match the array's
            # trailing dims (TPU block divisibility rule).
            pl.BlockSpec((1, 1, edge_tile), lambda t, rb: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((edge_tile, f), lambda t, rb: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_block, f), lambda t, rb: (rb[t], 0),
                               memory_space=pltpu.VMEM),
    )
    flops = 2 * num_tiles * row_block * edge_tile * f
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((num_rows, f), contrib.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=contrib.size * 4 + num_rows * f * 4,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(tile_rb, lrow.reshape(num_tiles, 1, edge_tile), contrib)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Lane-packing for F < 128 ELL pipelines: fold g = 128/F adjacent K-slots
# of one row into a single 128-lane group so the w-multiply + K-sum passes
# run on full vector lanes ([slots, F<128] buffers pad the minor dim to
# 128 lanes on TPU, taxing every elementwise pass by 128/F — measured
# ~360 us of the 772 us p2p F=32 headline, BENCHMARKS.md §1b).
# True/False force; None = auto: compiled TPU AND fold factor g >= 4.
# On-TPU A/B (benchmark/probe_lanepack2.py, 2026-08-18 session): F=32
# packed 553 us vs 702 unpacked (1.27x, 17.1 GF/s headline); F=64 (g=2)
# packed LOSES (788 vs 696) — the relayout outweighs a 2x lane fold.
_LANE_PACK = [None]


def set_lane_pack(value) -> None:
    _LANE_PACK[0] = value


# Persisted lane-pack default (the regression tripwire,
# tests/test_lanepack_guard.py): the flag flip rests on noisy within-
# session A/Bs (±5 % wins against ±10-20 % session spread), so a TPU-
# suite guard re-measures the interleaved A/B and records the sign here;
# auto mode honours the recorded sign over the built-in default.
_LANE_PACK_FLAG_PATH = os.environ.get(
    "DGSPARSE_LANEPACK_FLAG",
    os.path.expanduser("~/.cache/dgsparse_tpu/lanepack.json"))
_LANE_PACK_FILE = [0]  # 0 = unread, None = absent/invalid, else bool


def _lane_pack_file_flag():
    if _LANE_PACK_FILE[0] == 0:
        flag = None
        try:
            import json
            with open(_LANE_PACK_FLAG_PATH) as fh:
                flag = bool(json.load(fh)["pack_default"])
        except Exception:
            flag = None
        _LANE_PACK_FILE[0] = flag
    return _LANE_PACK_FILE[0]


def record_lane_pack_default(pack_default: bool, meta: dict) -> None:
    """Persist the measured lane-pack sign (guard test writes this)."""
    import json
    path = _LANE_PACK_FLAG_PATH
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump({"pack_default": bool(pack_default), **meta}, fh)
    _LANE_PACK_FILE[0] = bool(pack_default)


def _lane_pack_on(f: int) -> bool:
    v = _LANE_PACK[0]
    if f >= 128 or 128 % f != 0:
        return False
    if 128 // f < 4 and jax.default_backend() == "tpu" and not _INTERPRET:
        # g=2 fold (F=64) miscompiles on real TPU (relerr 2.4e-1 observed
        # on a reddit-scale hybrid plan, 2026-08-19; correct under
        # interpret) and measured a perf LOSS anyway — refuse even when
        # forced so set_lane_pack(True) can't silently corrupt results.
        return False
    if v is None:
        ok = (128 // f >= 4 and jax.default_backend() == "tpu"
              and not _INTERPRET)
        if ok:
            flag = _lane_pack_file_flag()
            if flag is not None:
                return flag
        return ok
    return bool(v)


def _pack_pad_width(f: int):
    """Tiny/odd F (not a divisor of 128): the next divisor-of-128 width
    the feature axis pads to so the lane-packed K-sum applies. Only
    widths <= 32 (fold >= 4) pay for themselves (PERF_GUIDE rule 11 —
    the g=2 fold at F=64 measured a LOSS); F in 33..127 non-divisors run
    unpacked (their [slots, F] tiles already occupy the 128-lane minor
    physically, so padding wouldn't shrink anything). Replaces the
    reference's dedicated N in {1..32} kernel matrix
    (src/ge-spmm/gespmm_v2.cu:7-56) with one pad + the packed pipeline.
    Returns None when no pad applies."""
    if f >= 32 or 128 % f == 0:
        return None
    if not _lane_pack_on(32):   # same backend/flag gate as packing itself
        return None
    for w in (4, 8, 16, 32):
        if w >= f:
            return w
    return None


def _pad_feat(dense: jax.Array, w: int) -> jax.Array:
    return jnp.pad(dense, ((0, 0), (0, w - dense.shape[-1])))


def _gather_ksum_packed(dense, cols, w, rb: int, k: int, out_dtype,
                        wp=None):
    """Packed gather + (w * gather).sum(K): cols/w [rb, k]. Returns
    [rb, f] with fp32 accumulation, or None when F doesn't pack (>= 128
    or not a divisor of 128). K is padded up to a multiple of the fold
    factor g = 128/F with zero-weight slots — the merged K ladder is not
    pow2 (p2p's big bucket is k=10), so without the pad 96 % of headline
    slots would fall back to the unpacked form. Pad slots gather row
    cols[,-1] again (clip-mode take); w = 0 cancels them.

    wp: optional PRE-EXPANDED packed weights [rb, k2/g, 128] (see
    build_wp_np), a plan-time constant. Default-OFF (DGSPARSE_WP_CACHE):
    the isolated probe showed 478 -> 345 us, but end-to-end through
    spmm() it is a consistent 1.45x LOSS (964 vs 672 us) — the expanded
    table is 128/g x wider than the raw weights, and XLA broadcasts the
    in-graph repeat for free inside the gather-consumer fusion
    (docs/BENCHMARKS.md §1c, 2026-08-19)."""
    f = dense.shape[-1]
    if f >= 128 or 128 % f != 0 or k == 0:
        return None
    g = 128 // f
    k2 = _round_up(k, g)
    if k2 != k:
        cols = jnp.pad(cols.reshape(rb, k), ((0, 0), (0, k2 - k)),
                       mode="edge")
        if wp is None:
            w = jnp.pad(w, ((0, 0), (0, k2 - k)))
    # Flat gather, then reshape to packed 128-lane rows. (A batched-index
    # gather — cols.reshape(-1, g) producing [*, g, f] = native 128-lane
    # rows — measured FASTER in isolation (261 vs 332 us with the weight
    # multiply) but SLOWER end-to-end in this pipeline (931 vs 665 us on
    # the p2p headline): with the K-axis reduce downstream, XLA fuses the
    # flat form better. Keep the flat form; see benchmark/probe_lanepack2.)
    gathered = jnp.take(dense, cols.reshape(-1), axis=0)
    # [rb*k2, f] -> [rb, k2/g, g*f]: flat element order is unchanged, so
    # slot j of row r lands in group j//g at lanes (j%g)*f..(j%g+1)*f.
    gp = gathered.reshape(rb, k2 // g, g * f)
    if wp is None:
        wp = jnp.repeat(w.reshape(rb, k2 // g, g), f, axis=2)
    acc = (wp.astype(gp.dtype) * gp).sum(axis=1, dtype=jnp.float32)
    # fold the g sub-blocks of f lanes: a [rb, 128] pass (rows, not slots)
    return acc.reshape(rb, g, f).sum(axis=1).astype(out_dtype)


def build_wp_np(w_flat: "np.ndarray", rb: int, k: int, f: int):
    """Host-side pre-expansion of packed K-sum weights for one bucket:
    [rb*k] flat slot weights -> [rb, k2/g, 128] with the exact pad/layout
    contract of _gather_ksum_packed (K zero-padded to a multiple of
    g = 128/f; lane l of group c holds w[row, c*g + l//f])."""
    g = 128 // f
    k2 = _round_up(k, g)
    w2 = np.zeros((rb, k2), w_flat.dtype)
    w2[:, :k] = w_flat.reshape(rb, k)
    return np.repeat(w2.reshape(rb, k2 // g, g), f, axis=2)


def _ell_recombine(plan, concat: jax.Array) -> jax.Array:
    """[concat_rows, F] bucket-order outputs -> [M, F] original order.
    Empty rows (excluded from the plan layout) read as fill-value zeros:
    their inv_row entries point past the concat and the out-of-range
    gather fills 0 — measured 22 us cheaper than materializing + gathering
    a zeros block on p2p (62.6K rows)."""
    if concat.shape[0] == 0:     # all rows empty (e.g. hybrid's residue)
        return jnp.zeros((plan.num_rows, concat.shape[-1]), concat.dtype)
    return jnp.take(concat, plan.inv_row, axis=0, mode="fill", fill_value=0)


def spmm_ell(
    plan,                       # core.planner.EllPlan
    values: Optional[jax.Array],
    dense: jax.Array,
    reduce: ReduceOp = ReduceOp.SUM,
    degrees: Optional[jax.Array] = None,
    w_slot: Optional[jax.Array] = None,
    wp_slot: Optional[jax.Array] = None,
) -> jax.Array:
    """Row-balance ELL SpMM (Algorithm.PALLAS_ROW_TILE): gather + masked
    K-step weighted sum — no segment reduction at all. XLA formulation (the
    gather dominates; the sum fuses into its consumer loop). For
    degree-regular graphs this beats the ESC one-hot path by skipping the
    MXU segment matmul; the reference's seqreduce row-balance analog
    (include/cuda/spmm_cuda.cuh:10-55).

    w_slot: plan-slot-ordered values (padding 0), precomputed on Storage —
    skips the [nnz_padded] 1-D value gather (measured ~200 us of the p2p
    headline time; the analog of the reference caching CSC values at
    construction, dgsparse/storage.py:100)."""
    if reduce not in (ReduceOp.SUM, ReduceOp.MEAN):
        raise ValueError("spmm_ell handles SUM/MEAN only")
    w_pad = _pack_pad_width(dense.shape[-1])
    if w_pad is not None:
        return spmm_ell(plan, values, _pad_feat(dense, w_pad), reduce,
                        degrees, w_slot, wp_slot)[:, :dense.shape[-1]]
    m, k = plan.cols.shape
    f = dense.shape[-1]
    if w_slot is not None:
        w = w_slot.reshape(m, k)
    else:
        w = plan.vals_mask
        if values is not None:
            safe = jnp.maximum(plan.eperm, 0).reshape(-1)
            w = w * jnp.take(values, safe).reshape(m, k).astype(w.dtype)

    # broadcast-multiply + K-sum (NOT einsum: the dot lowering forces a
    # materialized [m,K,F] relayout — measured +195 us on p2p@F=32; the
    # elementwise form fuses with the gather). fp32 accumulation even for
    # bf16 inputs (K can reach 64K on hub rows).
    def rows_out(cols, w, rb, wp=None):
        if _lane_pack_on(f):
            packed = _gather_ksum_packed(dense, cols, w, rb, k,
                                         dense.dtype, wp=wp)
            if packed is not None:
                return packed
        gathered = jnp.take(dense, cols.reshape(-1), axis=0)
        gathered = gathered.reshape(rb, k, f)
        return (w.astype(gathered.dtype)[:, :, None] * gathered).sum(
            axis=1, dtype=jnp.float32).astype(dense.dtype)

    # Row-chunk so the gathered [rows, k, F] buffer stays under the gather
    # budget — degree-regular 100M-edge graphs land on this single-K plan
    # via AUTO and would otherwise materialize ~30 GB at F=64 (the same
    # guard spmm_bucketed_ell has; chunk boundaries are static).
    max_slots = max(_GATHER_BUDGET_BYTES // (4 * f), 1)
    if m * k <= max_slots:
        out = rows_out(plan.cols, w, m, wp_slot)
    else:
        rows_per = max(max_slots // k, 1)
        out = jnp.concatenate(
            [rows_out(plan.cols[r0:min(r0 + rows_per, m)],
                      w[r0:min(r0 + rows_per, m)],
                      min(r0 + rows_per, m) - r0,
                      None if wp_slot is None
                      else wp_slot[r0:min(r0 + rows_per, m)])
             for r0 in range(0, m, rows_per)], axis=0)
    if reduce == ReduceOp.MEAN:
        if degrees is None:
            raise ValueError("degrees required for MEAN")
        out = out / jnp.maximum(degrees, 1).astype(out.dtype)[:, None]
    return out


def gspmm_ell(
    plan,                       # EllPlan or BucketedEllPlan
    values: Optional[jax.Array],
    dense: jax.Array,
    reduce: ReduceOp = ReduceOp.SUM,
    compute=None,
    degrees: Optional[jax.Array] = None,
) -> jax.Array:
    """Semiring generalization of the ELL row-balance schedule: per bucket,
    contrib = compute(edge, feat[col]) masked, then a K-axis sum."""
    from dgsparse_tpu.core.planner import BucketedEllPlan
    from dgsparse_tpu.kernels.xla import combine
    from dgsparse_tpu.ops.types import ComputeOp

    compute = ComputeOp.MUL if compute is None else compute
    if reduce not in (ReduceOp.SUM, ReduceOp.MEAN):
        raise ValueError("gspmm_ell handles SUM/MEAN only")
    w_pad = _pack_pad_width(dense.shape[-1])
    if w_pad is not None:
        return gspmm_ell(plan, values, _pad_feat(dense, w_pad), reduce,
                         compute, degrees)[:, :dense.shape[-1]]

    if isinstance(plan, BucketedEllPlan):
        buckets = [(c, m_, e) for c, m_, e, _, _ in plan.bucket_views()]
        inv_row = plan.inv_row
    else:
        buckets = [(plan.cols, plan.vals_mask, plan.eperm)]
        inv_row = None

    outs = []
    f = dense.shape[-1]
    # gather-budget row-chunking (see spmm_ell): split any bucket whose
    # gathered [rb*k, F] buffer would exceed the budget
    max_slots = max(_GATHER_BUDGET_BYTES // (4 * f), 1)
    split = []
    for cols, mask, eperm in buckets:
        rb, k = cols.shape
        if rb * k <= max_slots or k == 0:
            split.append((cols, mask, eperm))
        else:
            rows_per = max(max_slots // k, 1)
            for r0 in range(0, rb, rows_per):
                r1 = min(r0 + rows_per, rb)
                split.append((cols[r0:r1], mask[r0:r1], eperm[r0:r1]))
    buckets = split
    for cols, mask, eperm in buckets:
        rb, k = cols.shape
        g = 128 // f if (f < 128 and 128 % f == 0) else 0
        if _lane_pack_on(f) and g and k:
            # lane-packed combine+mask+K-sum: see _gather_ksum_packed.
            # K pads to a multiple of g; pad slots repeat the bucket's
            # last column/edge (edge mode keeps values real so DIV etc.
            # stay finite) and mask 0 cancels them.
            k2 = _round_up(k, g)
            if k2 != k:
                cols = jnp.pad(cols.reshape(rb, k),
                               ((0, 0), (0, k2 - k)), mode="edge")
                mask = jnp.pad(mask.reshape(rb, k),
                               ((0, 0), (0, k2 - k)))
                eperm = jnp.pad(eperm.reshape(rb, k),
                                ((0, 0), (0, k2 - k)), mode="edge")
            gathered = jnp.take(dense, cols.reshape(-1), axis=0)
            if values is not None:
                safe = jnp.maximum(eperm, 0).reshape(-1)
                v = jnp.take(values, safe).astype(gathered.dtype)
                contrib = combine(compute, v, gathered)
            else:
                contrib = gathered
            mp = jnp.repeat(mask.reshape(rb, k2 // g, g), f, axis=2)
            acc = (contrib.reshape(rb, k2 // g, g * f)
                   * mp.astype(contrib.dtype)).sum(axis=1,
                                                   dtype=jnp.float32)
            outs.append(acc.reshape(rb, g, f).sum(axis=1)
                        .astype(dense.dtype))
            continue
        gathered = jnp.take(dense, cols.reshape(-1), axis=0)   # [rb*k, F]
        if values is not None:
            safe = jnp.maximum(eperm, 0).reshape(-1)
            v = jnp.take(values, safe).astype(gathered.dtype)
            contrib = combine(compute, v, gathered)
        else:
            contrib = gathered
        contrib = contrib.reshape(rb, k, f) * mask[:, :, None].astype(
            contrib.dtype)
        outs.append(contrib.sum(axis=1, dtype=jnp.float32)
                    .astype(dense.dtype))
    cat = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    out = cat if inv_row is None else _ell_recombine(plan, cat)
    if reduce == ReduceOp.MEAN:
        if degrees is None:
            raise ValueError("degrees required for MEAN")
        out = out / jnp.maximum(degrees, 1).astype(out.dtype)[:, None]
    return out


def spmm_bucketed_ell(
    plan,                       # core.planner.BucketedEllPlan
    values: Optional[jax.Array],
    dense: jax.Array,
    reduce: ReduceOp = ReduceOp.SUM,
    degrees: Optional[jax.Array] = None,
    w_slot: Optional[jax.Array] = None,
    wp_slot: Optional[tuple] = None,
) -> jax.Array:
    """Degree-bucketed row-balance SpMM: per pow2-degree bucket, gather +
    masked K-step sum (no segment reduction); bucket outputs concatenate in
    bucket order and one row gather restores the original order. w_slot:
    see spmm_ell. wp_slot: per-bucket tuple of pre-expanded packed weights
    (build_wp_np), bucket_views order."""
    if reduce not in (ReduceOp.SUM, ReduceOp.MEAN):
        raise ValueError("spmm_bucketed_ell handles SUM/MEAN only")
    w_pad = _pack_pad_width(dense.shape[-1])
    if w_pad is not None:
        return spmm_bucketed_ell(
            plan, values, _pad_feat(dense, w_pad), reduce, degrees,
            w_slot, wp_slot)[:, :dense.shape[-1]]
    f = dense.shape[-1]
    # Memory bound: the gather materializes [rb*k, F]; at Reddit scale
    # (115M edges, F=64) that is ~30 GB. Chunk each bucket's rows so one
    # gathered buffer stays under the budget — chunk boundaries are static
    # (plan shapes are), so this is just more XLA ops, not dynamism.
    max_slots = max(_GATHER_BUDGET_BYTES // (4 * f), 1)
    outs = []
    o2 = 0
    for bi, (cols, mask, eperm, _rows, _k) in \
            enumerate(plan.bucket_views()):
        rb, k = cols.shape
        wp_b = wp_slot[bi] if wp_slot is not None else None

        def bucket_out(cols, mask, eperm, w_off, rb=rb, k=k, wp=None):
            if w_slot is not None:
                w = jax.lax.slice(w_slot, (w_off,),
                                  (w_off + rb * k,)).reshape(rb, k)
            else:
                w = mask
                if values is not None:
                    safe = jnp.maximum(eperm, 0).reshape(-1)
                    w = w * jnp.take(values, safe).reshape(rb, k).astype(
                        w.dtype)
            if _lane_pack_on(f):
                packed = _gather_ksum_packed(dense, cols, w, rb, k,
                                             dense.dtype, wp=wp)
                if packed is not None:
                    return packed
            # mul+sum, not einsum — see spmm_ell
            gathered = jnp.take(dense, cols.reshape(-1), axis=0)
            gathered = gathered.reshape(rb, k, f)
            return (w.astype(gathered.dtype)[:, :, None] * gathered).sum(
                axis=1, dtype=jnp.float32).astype(dense.dtype)

        if rb * k <= max_slots:
            outs.append(bucket_out(cols, mask, eperm, o2, wp=wp_b))
        else:
            rows_per = max(max_slots // k, 1)
            for r0 in range(0, rb, rows_per):
                r1 = min(r0 + rows_per, rb)
                outs.append(bucket_out(
                    cols[r0:r1], mask[r0:r1], eperm[r0:r1],
                    o2 + r0 * k, rb=r1 - r0, k=k,
                    wp=None if wp_b is None else wp_b[r0:r1]))
        o2 += rb * k
    out = _ell_recombine(plan, jnp.concatenate(outs, axis=0))
    if reduce == ReduceOp.MEAN:
        if degrees is None:
            raise ValueError("degrees required for MEAN")
        out = out / jnp.maximum(degrees, 1).astype(out.dtype)[:, None]
    return out


def spmm_col_chunked_ell(
    plan,                       # core.planner.ColChunkedEllPlan
    values: Optional[jax.Array],
    dense: jax.Array,
    reduce: ReduceOp = ReduceOp.SUM,
    degrees: Optional[jax.Array] = None,
    w_slot: Optional[tuple] = None,
) -> jax.Array:
    """Column-chunked row-balance SpMM: each chunk gathers from a static
    `lax.slice` of the dense table (keeping every gather's table ≲4 MB —
    the v5e fast-gather regime, see ColChunkedEllPlan) and contributes a
    [M, F] partial sum. w_slot: per-chunk tuple of flat slot-ordered value
    arrays (Storage vslot 'ell_c' entries)."""
    if reduce not in (ReduceOp.SUM, ReduceOp.MEAN):
        raise ValueError("spmm_col_chunked_ell handles SUM/MEAN only")
    f = dense.shape[-1]
    cs = plan.chunk_size
    out = None
    for c, sub in enumerate(plan.subs):
        if sub.nnz == 0:
            continue
        lo = c * cs
        hi = min(lo + cs, plan.num_cols)
        dsl = jax.lax.slice(dense, (lo, 0), (hi, f))
        wc = w_slot[c] if w_slot is not None else None
        # accumulate partials in f32 (bf16 chunk sums would round per
        # chunk; XLA fuses the cast into the add chain)
        part = spmm_bucketed_ell(sub, values, dsl, ReduceOp.SUM,
                                 w_slot=wc).astype(jnp.float32)
        out = part if out is None else out + part
    if out is None:
        return jnp.zeros((plan.num_rows, f), dense.dtype)
    if reduce == ReduceOp.MEAN:
        if degrees is None:
            raise ValueError("degrees required for MEAN")
        out = out / jnp.maximum(degrees, 1).astype(out.dtype)[:, None]
    return out.astype(dense.dtype)


def materialize_cells(plan, values: Optional[jax.Array]) -> jax.Array:
    """In-graph dense-cell materialization (traced-values path): one sorted
    1-D segment-sum of the dense-tier edge values into the flat cell slots.
    For concrete values, Storage caches the host-built equivalent
    (core/planner.materialize_cells_np)."""
    # slot/eperm are host-resident (planner.HostBuf, pytree aux); they
    # enter the graph as constants here — acceptable at the traced-values
    # scales this path serves (concrete values use the host cache)
    slot = jnp.asarray(getattr(plan.slot, "np", plan.slot))
    if values is None:
        v = jnp.ones(slot.shape, jnp.float32)
    else:
        eperm = jnp.asarray(getattr(plan.eperm, "np", plan.eperm))
        v = jnp.take(values, eperm).astype(jnp.float32)
    flat = jax.ops.segment_sum(v, slot, num_segments=plan.cell_slots,
                               indices_are_sorted=True)
    return flat.reshape(plan.num_cells, plan.row_block, plan.col_window)


def _cell_matmul_kernel(transpose: bool, compute_dtype,
                        order_ref, seg_ref, win_ref,
                        cells_ref, b_ref, out_ref):
    """out[seg[t]] += cells[order[t]] @ b[win[t]] (or cellᵀ @ b when
    transpose) — plain block-sparse GEMM over materialized dense cells.
    seg is nondecreasing; consecutive equal segments accumulate in VMEM.
    fp32 mode: Mosaic's Precision.HIGHEST multi-pass f32 matmul (unlike
    the one-hot kernels, NEITHER operand is exact in bf16 here, so a
    hi/lo split would lose ~2^-16 relative)."""
    t = pl.program_id(0)
    a = cells_ref[0]                                   # [R, C]
    dims = (((0,), (0,)), ((), ())) if transpose else \
        (((1,), (0,)), ((), ()))
    if compute_dtype == jnp.float32:
        partial = jax.lax.dot_general(
            a, b_ref[:], dims, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    else:
        partial = jax.lax.dot_general(
            a.astype(jnp.bfloat16), b_ref[:].astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32)

    prev = seg_ref[jnp.maximum(t - 1, 0)]
    is_first = jnp.logical_or(t == 0, prev != seg_ref[t])

    @pl.when(is_first)
    def _():
        out_ref[:] = partial.astype(out_ref.dtype)

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[:] = (out_ref[:].astype(jnp.float32) + partial).astype(
            out_ref.dtype)


def spmm_dense_cells(
    plan,                      # core.planner.DenseCellPlan
    cells: jax.Array,          # [ncells, R, C] materialized blocks (f32)
    dense: jax.Array,          # [N, F] (fwd) / [M, F] grad (transpose)
    transpose: bool = False,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Block-sparse GEMM tier: one [R,C]x[C,F] MXU pass per cell. Forward
    computes row-block partials (out [M, F]); transpose computes
    column-window partials of Aᵀ·dense (out [N, F]) reusing the SAME cell
    array with swapped contraction dims — no transpose materialization."""
    r, c = plan.row_block, plan.col_window
    f = dense.shape[-1]
    f_pad = _round_up(max(f, 128), 128)
    if f_pad != f:
        dense = jnp.pad(dense, ((0, 0), (0, f_pad - f)))
    if transpose:
        order, seg, win = plan.t_order, plan.t_cw, plan.t_rb
        in_rows, in_blk = _round_up(plan.num_rows, r), r
        out_rows, out_blk = plan.num_cols, c
    else:
        order = jnp.arange(plan.num_cells, dtype=jnp.int32)
        seg, win = plan.cell_rb, plan.cell_cw
        in_rows, in_blk = _round_up(plan.num_cols, c), c
        out_rows, out_blk = plan.num_rows, r
    if in_rows != dense.shape[0]:
        dense = jnp.pad(dense, ((0, in_rows - dense.shape[0]), (0, 0)))
    if compute_dtype != jnp.float32:
        cells = cells.astype(jnp.bfloat16)
        dense = dense.astype(jnp.bfloat16)

    kernel = functools.partial(_cell_matmul_kernel, transpose,
                               compute_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(plan.num_cells,),
        in_specs=[
            pl.BlockSpec((1, r, c), lambda t, o, s, w: (o[t], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_blk, f_pad), lambda t, o, s, w: (w[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((out_blk, f_pad),
                               lambda t, o, s, w: (s[t], 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, f_pad), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * plan.num_cells * r * c * f_pad,
            bytes_accessed=plan.num_cells * (r * c + in_blk * f_pad) * 4
            + out_rows * f_pad * 4,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(order, seg, win, cells, dense)
    return out[:, :f] if f_pad != f else out


def spmm_hybrid_t(
    plan,                      # core.planner.HybridPlan
    values: Optional[jax.Array],
    g: jax.Array,              # [M, F] cotangent rows
    compute_dtype=jnp.float32,
    w_slot=None,               # dict {"cells","ell_t"} or None
) -> jax.Array:
    """d_dense = Aᵀ·g for a hybrid-planned A: the dense-cell tier reuses
    the SAME materialized blocks with swapped contraction dims (zero extra
    plan state); the non-cells edges run on the transpose bucketed-ELL
    plan. Returns [N, F] float32."""
    w = w_slot if isinstance(w_slot, dict) else {}
    out = None
    if plan.cells is not None:
        cells = (w.get("cells_bf16")
                 if compute_dtype == jnp.bfloat16 else None)
        if cells is None:
            cells = w.get("cells")
        if cells is None:
            cells = materialize_cells(plan.cells, values)
        out = spmm_dense_cells(plan.cells, cells, g, transpose=True,
                               compute_dtype=compute_dtype)
    if plan.ell_t is not None:
        from dgsparse_tpu.core.planner import ColChunkedEllPlan

        g_res = g.astype(jnp.bfloat16) \
            if compute_dtype == jnp.bfloat16 else g
        if isinstance(plan.ell_t, ColChunkedEllPlan):
            e = spmm_col_chunked_ell(
                plan.ell_t, values, g_res,
                w_slot=w.get("ell_t_c")).astype(jnp.float32)
        else:
            e = spmm_bucketed_ell(
                plan.ell_t, values, g_res,
                w_slot=w.get("ell_t")).astype(jnp.float32)
        out = e if out is None else out + e
    return out


def spmm_hybrid(
    plan,                      # core.planner.HybridPlan
    values: Optional[jax.Array],
    dense: jax.Array,
    reduce: ReduceOp = ReduceOp.SUM,
    degrees: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    w_slot=None,               # dict {"bell","ell","cells"} or None
    wp_slot: Optional[tuple] = None,  # residue pre-expanded weights
) -> jax.Array:
    """Three-tier SpMM: materialized dense cells (block GEMM) + BELL
    one-hot MXU tiles + bucketed-ELL residue; all tiers are row-partitioned
    partial sums, so out = cells + bell + ell. MEAN divides once at the end
    (every tier runs as SUM)."""
    if reduce not in (ReduceOp.SUM, ReduceOp.MEAN):
        raise ValueError("spmm_hybrid handles SUM/MEAN only")
    w = w_slot if isinstance(w_slot, dict) else {}
    out = None
    if plan.cells is not None:
        cells = (w.get("cells_bf16")
                 if compute_dtype == jnp.bfloat16 else None)
        if cells is None:
            cells = w.get("cells")
        if cells is None:
            cells = materialize_cells(plan.cells, values)
        out = spmm_dense_cells(plan.cells, cells, dense,
                               compute_dtype=compute_dtype)
    if plan.bell is not None:
        b = spmm_bell(plan.bell, values, dense, ReduceOp.SUM,
                      compute_dtype=compute_dtype,
                      w_slot=w.get("bell")).astype(jnp.float32)
        out = b if out is None else out + b
    # bf16 mode: the residue gathers from a bf16 copy of dense — random
    # row gathers are issue/byte-bound and 128-byte bf16 rows at F=64 are
    # ~2x the fp32 gather rate (accumulation stays fp32 in the K-sum)
    dense_res = dense.astype(jnp.bfloat16) \
        if compute_dtype == jnp.bfloat16 else dense
    from dgsparse_tpu.core.planner import ColChunkedEllPlan

    if isinstance(plan.ell, ColChunkedEllPlan):
        e = spmm_col_chunked_ell(
            plan.ell, values, dense_res, ReduceOp.SUM,
            w_slot=w.get("ell_c")).astype(jnp.float32)
    else:
        e = spmm_bucketed_ell(plan.ell, values, dense_res, ReduceOp.SUM,
                              w_slot=w.get("ell"),
                              wp_slot=wp_slot).astype(jnp.float32)
    out = e if out is None else out + e
    if reduce == ReduceOp.MEAN:
        if degrees is None:
            raise ValueError("degrees required for MEAN")
        out = out / jnp.maximum(degrees, 1).astype(out.dtype)[:, None]
    return out.astype(dense.dtype)


def _bell_kernel(row_block: int, edge_tile: int, col_window: int,
                 compute_dtype,
                 tile_rb_ref, tile_cw_ref, lcol_ref, lrow_ref, vals_ref,
                 b_ref, out_ref):
    """Fully in-MXU SpMM tile: gather one-hot x B window, then scatter
    one-hot x contributions — zero random memory access (the blocked-ELL
    formulation from BASELINE.json's north star)."""
    t = pl.program_id(0)
    lc = lcol_ref[0, 0, :]                                  # [E]
    lr = lrow_ref[0, 0, :]                                  # [E]
    v = vals_ref[0, 0, :]                                   # [E]

    # f32 mode: exact via hi/lo split (2 bf16 passes per matmul); bf16 mode:
    # single pass, accepts input rounding (the one-hots are exact either way).
    cols = jax.lax.broadcasted_iota(jnp.int32, (edge_tile, col_window), 1)
    g = (cols == lc[:, None]).astype(jnp.bfloat16)          # [E, C]
    if compute_dtype == jnp.float32:
        gathered = _split_onehot_dot(g, b_ref[:])           # [E, F]
    else:
        gathered = jnp.dot(g, b_ref[:].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
    contrib = gathered * v[:, None]

    rows = jax.lax.broadcasted_iota(jnp.int32, (row_block, edge_tile), 0)
    s = (rows == lr[None, :]).astype(jnp.bfloat16)          # [R, E]
    if compute_dtype == jnp.float32:
        partial = _split_onehot_dot(s, contrib)
    else:
        partial = jnp.dot(s, contrib.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    prev = tile_rb_ref[jnp.maximum(t - 1, 0)]
    is_first = jnp.logical_or(t == 0, prev != tile_rb_ref[t])

    @pl.when(is_first)
    def _():
        out_ref[:] = partial.astype(out_ref.dtype)

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[:] = (out_ref[:].astype(jnp.float32) + partial).astype(
            out_ref.dtype)


def spmm_bell(
    plan,                      # core.planner.BellPlan
    values: Optional[jax.Array],
    dense: jax.Array,          # [N, F]
    reduce: ReduceOp = ReduceOp.SUM,
    degrees: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    w_slot: Optional[jax.Array] = None,
) -> jax.Array:
    """BELL SpMM: no gather/scatter anywhere — both sides are one-hot MXU
    matmuls over (row-block x column-window) tiles. compute_dtype=bfloat16
    halves the MXU time (one-hots are exact in bf16; accumulation stays
    fp32). w_slot: see spmm_ell."""
    if reduce not in (ReduceOp.SUM, ReduceOp.MEAN):
        raise ValueError("spmm_bell handles SUM/MEAN only")
    f = dense.shape[-1]
    f_pad = _round_up(max(f, 128), 128)
    if f_pad != f:
        dense = jnp.pad(dense, ((0, 0), (0, f_pad - f)))
    n_pad = plan.num_col_windows * plan.col_window
    if n_pad != dense.shape[0]:
        dense = jnp.pad(dense, ((0, n_pad - dense.shape[0]), (0, 0)))

    valid = plan.eperm >= 0
    if w_slot is not None:
        v = w_slot
    elif values is not None:
        v = jnp.take(values, jnp.maximum(plan.eperm, 0))
    else:
        v = jnp.ones_like(plan.eperm, dtype=jnp.float32)
    if reduce == ReduceOp.MEAN:
        if degrees is None:
            raise ValueError("degrees required for MEAN")
        rb = jnp.repeat(plan.tile_rb, plan.edge_tile)
        rows = rb * plan.row_block + plan.lrow
        deg = jnp.take(jnp.maximum(degrees, 1),
                       jnp.minimum(rows, plan.num_rows - 1))
        v = v / deg.astype(v.dtype)
    if w_slot is None or reduce == ReduceOp.MEAN:
        v = jnp.where(valid, v, 0)
    v = v.astype(jnp.float32)

    kernel = functools.partial(_bell_kernel, plan.row_block, plan.edge_tile,
                               plan.col_window, compute_dtype)
    e = plan.edge_tile

    def run(tile_rb, tile_cw, lcol, lrow, vv, n_rows_out):
        te = tile_rb.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(te,),
            in_specs=[
                pl.BlockSpec((1, 1, e), lambda t, rb, cw: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, e), lambda t, rb, cw: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, e), lambda t, rb, cw: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((plan.col_window, f_pad),
                             lambda t, rb, cw: (cw[t], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((plan.row_block, f_pad),
                                   lambda t, rb, cw: (rb[t], 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_rows_out, f_pad),
                                           jnp.float32),
            grid_spec=grid_spec,
            cost_estimate=pl.CostEstimate(
                flops=2 * te * e * f_pad
                * (plan.col_window + plan.row_block),
                bytes_accessed=te * plan.col_window * f_pad * 4
                + n_rows_out * f_pad * 4,
                transcendentals=0,
            ),
            interpret=_INTERPRET,
        )(tile_rb, tile_cw, lcol.reshape(te, 1, e), lrow.reshape(te, 1, e),
          vv.reshape(te, 1, e), dense)

    if not plan.chunks:
        te = plan.num_tiles
        out = run(plan.tile_rb, plan.tile_cw, plan.lcol, plan.lrow, v,
                  plan.num_rows)
        return out[:, :f] if f_pad != f else out

    # Chunked execution (> _BELL_CHUNK_TILES tiles): each chunk's kernel
    # indexes output blocks by the chunk-local block id (tile_lb) so its
    # output is dense; block_inv restores global block order at the end.
    parts = []
    for t0, t1, nb in plan.chunks:
        sl = lambda a: jax.lax.slice(a, (t0,), (t1,))
        sl_e = lambda a: jax.lax.slice(a, (t0 * e,), (t1 * e,))
        out_c = run(sl(plan.tile_lb), sl(plan.tile_cw), sl_e(plan.lcol),
                    sl_e(plan.lrow), sl_e(v),
                    nb * plan.row_block)
        parts.append(out_c.reshape(nb, plan.row_block, f_pad))
    blocks = jnp.concatenate(parts, axis=0)       # [num_rb, R, f_pad]
    out = jnp.take(blocks, plan.block_inv, axis=0).reshape(
        plan.num_row_blocks * plan.row_block, f_pad)[:plan.num_rows]
    return out[:, :f] if f_pad != f else out


def spmm_esc(
    plan: EdgeTilePlan,
    values: Optional[jax.Array],   # [nnz] in original CSR edge order, or None
    dense: jax.Array,              # [N, F]
    reduce: ReduceOp = ReduceOp.SUM,
    degrees: Optional[jax.Array] = None,
    w_slot: Optional[jax.Array] = None,
) -> jax.Array:
    """ESC SpMM forward: XLA fused gather+scale, Pallas segment matmul.
    w_slot: see spmm_ell."""
    from dgsparse_tpu.ops.types import ComputeOp

    return gspmm_esc(plan, values, dense, reduce, ComputeOp.MUL, degrees,
                     w_slot=w_slot)


def gspmm_esc(
    plan: EdgeTilePlan,
    values: Optional[jax.Array],
    dense: jax.Array,
    reduce: ReduceOp = ReduceOp.SUM,
    compute=None,
    degrees: Optional[jax.Array] = None,
    w_slot: Optional[jax.Array] = None,
) -> jax.Array:
    """Generalized-semiring ESC: contrib = compute(edge, feat[col]) computed
    in one fused XLA pass over the plan slots (padding slots forced to 0),
    then the Pallas one-hot segment matmul (the reference gspmm-fp analog,
    src/gspmm-fp/gspmm.cu, for SUM/MEAN)."""
    from dgsparse_tpu.kernels.xla import combine
    from dgsparse_tpu.ops.types import ComputeOp

    compute = ComputeOp.MUL if compute is None else compute
    if reduce not in (ReduceOp.SUM, ReduceOp.MEAN):
        raise ValueError("gspmm_esc handles SUM/MEAN only")
    f = dense.shape[-1]
    f_pad = _round_up(max(f, 128), 128)
    if f_pad > 2048:
        raise ValueError(
            f"feature width {f} exceeds the single-F-block VMEM budget; "
            "split features or use Algorithm.XLA_SEGMENT")
    if f_pad != f:
        dense = jnp.pad(dense, ((0, 0), (0, f_pad - f)))

    feats = jnp.take(dense, plan.cols, axis=0)           # [T*E, F]
    if w_slot is not None and compute == ComputeOp.MUL:
        # plan-slot-cached values (padding 0): no value gather, no
        # validity mask needed for the multiplicative semiring
        contrib = feats * w_slot[:, None].astype(feats.dtype)
        mask_needed = False
    elif values is None:
        contrib = feats
        mask_needed = True
        if compute != ComputeOp.MUL:
            raise ValueError("copy_u requires compute == MUL semantics")
    else:
        v = jnp.take(values, jnp.maximum(plan.eperm, 0)).astype(feats.dtype)
        contrib = combine(compute, v, feats)
        mask_needed = True
    if reduce == ReduceOp.MEAN:
        if degrees is None:
            raise ValueError("degrees required for MEAN")
        rb = jnp.repeat(plan.tile_rb, plan.edge_tile)
        rows = rb * plan.row_block + plan.lrow
        deg = jnp.take(jnp.maximum(degrees, 1),
                       jnp.minimum(rows, plan.num_rows - 1))
        contrib = contrib / deg.astype(contrib.dtype)[:, None]
    if mask_needed:
        contrib = jnp.where((plan.eperm >= 0)[:, None], contrib, 0)

    out = segment_matmul(
        contrib, plan.lrow, plan.tile_rb,
        plan.num_tiles, plan.edge_tile, plan.row_block, plan.num_rows,
    )
    return out[:, :f] if f_pad != f else out


def spmm_esc_mh(
    plan: EdgeTilePlan,
    values: Optional[jax.Array],   # [nnz, H] in CSR edge order, or None
    dense: jax.Array,              # [N, H, F]
    reduce: ReduceOp = ReduceOp.SUM,
    degrees: Optional[jax.Array] = None,
) -> jax.Array:
    """Multi-head ESC SpMM: per-head edge values, shared structure.

    Heads fold into the feature axis so ONE segment matmul serves all
    heads — the batched analog of launching the reference SpMM once per
    head (no multi-head kernel exists in the reference; GAT-style models
    there would loop). Returns [num_rows, H, F]; SUM/MEAN only.
    """
    n, h, f = dense.shape
    hf = h * f
    hf_pad = _round_up(max(hf, 128), 128)
    if hf_pad > 2048:
        raise ValueError(
            f"H*F = {hf} exceeds the single-F-block VMEM budget; "
            "split heads or use Algorithm.XLA_SEGMENT")
    valid = plan.eperm >= 0
    safe_perm = jnp.maximum(plan.eperm, 0)
    feats = jnp.take(dense.reshape(n, hf), plan.cols, axis=0)    # [T*E, H*F]
    if values is None:
        contrib = feats
    else:
        v = jnp.take(values, safe_perm, axis=0).astype(feats.dtype)
        contrib = (feats.reshape(-1, h, f) * v[:, :, None]).reshape(-1, hf)
    if reduce == ReduceOp.MEAN:
        if degrees is None:
            raise ValueError("degrees required for MEAN")
        rb = jnp.repeat(plan.tile_rb, plan.edge_tile)
        rows = rb * plan.row_block + plan.lrow
        deg = jnp.take(jnp.maximum(degrees, 1),
                       jnp.minimum(rows, plan.num_rows - 1))
        contrib = contrib / deg.astype(contrib.dtype)[:, None]
    elif reduce != ReduceOp.SUM:
        raise ValueError("spmm_esc_mh handles SUM/MEAN only")
    contrib = jnp.where(valid[:, None], contrib, 0)
    if hf_pad != hf:
        contrib = jnp.pad(contrib, ((0, 0), (0, hf_pad - hf)))
    out = segment_matmul(
        contrib, plan.lrow, plan.tile_rb,
        plan.num_tiles, plan.edge_tile, plan.row_block, plan.num_rows,
    )
    return out[:, :hf].reshape(plan.num_rows, h, f)


def _ell_buckets(plan):
    """Normalize EllPlan / BucketedEllPlan to a bucket list
    [(cols, mask, eperm, rows_or_None, K)], plus inv_row (None = identity)."""
    from dgsparse_tpu.core.planner import BucketedEllPlan

    if isinstance(plan, BucketedEllPlan):
        return plan.bucket_views(), plan.inv_row
    return [(plan.cols, plan.vals_mask, plan.eperm, None, plan.k)], None


def spmm_ell_maxmin(plan, values, dense, reduce, compute=None, w_slot=None):
    """MAX/MIN SpMM on the ELL row-balance layout: masked K-axis reduce —
    no segmented scan, no segment reduction (the winner search is a plain
    vectorized argmax per row). Replaces the reference's masked max/min
    kernels (src/cuda/spmm_cuda.cu:169-233) for graphs with an ELL plan;
    `compute` generalizes to the gspmm-fp semiring grid (include/gspmm.h).

    Returns (out [M, F] in ORIGINAL row order, arg_k [M_concat, F] int32
    argmax K-slot per element, in BUCKET-CONCAT row order — the backward
    rebuilds winner masks by comparing against a K iota, gather-free).
    """
    from dgsparse_tpu.kernels.xla import combine
    from dgsparse_tpu.ops.types import ComputeOp

    compute = ComputeOp.MUL if compute is None else compute
    is_max = reduce == ReduceOp.MAX
    big = jnp.float32(3.0e38)
    fill = -big if is_max else big
    buckets, inv_row = _ell_buckets(plan)
    outs, args = [], []
    o2 = 0
    # same gather-budget row-chunking as the SUM/MEAN paths: the gathered
    # [rows, k, F] fp32 buffer must never exceed the budget (single-K
    # 100M-edge plans would otherwise materialize ~30 GB at F=64)
    max_slots = max(_GATHER_BUDGET_BYTES // (4 * dense.shape[-1]), 1)
    for cols, mask, eperm, _rows, k in buckets:
        rb = cols.shape[0]

        def chunk_out(cols, mask, eperm, w_off, rb, k=k):
            feats = jnp.take(dense, cols.reshape(-1),
                             axis=0).astype(jnp.float32)
            feats = feats.reshape(rb, k, -1)
            if w_slot is not None:
                # cached slot values (invalid slots are overridden by
                # `fill` below, so their 0 placeholder is harmless)
                v = jax.lax.slice(w_slot, (w_off,), (w_off + rb * k,))
                contrib = combine(compute, v.reshape(rb, k, 1).astype(
                    jnp.float32), feats)
            elif values is not None:
                v = jnp.take(values, jnp.maximum(eperm, 0).reshape(-1))
                contrib = combine(compute, v.reshape(rb, k, 1).astype(
                    jnp.float32), feats)
            else:
                contrib = feats
            valid = (mask > 0)[:, :, None]
            contrib = jnp.where(valid, contrib, fill)
            out_b = contrib.max(axis=1) if is_max else contrib.min(axis=1)
            arg_b = (jnp.argmax(contrib, axis=1) if is_max
                     else jnp.argmin(contrib, axis=1)).astype(jnp.int32)
            any_valid = mask.max(axis=1) > 0
            # empty rows -> 0
            return jnp.where(any_valid[:, None], out_b, 0), arg_b

        if rb * k <= max_slots:
            out_b, arg_b = chunk_out(cols, mask, eperm, o2, rb)
            outs.append(out_b)
            args.append(arg_b)
        else:
            rows_per = max(max_slots // k, 1)
            for r0 in range(0, rb, rows_per):
                r1 = min(r0 + rows_per, rb)
                out_b, arg_b = chunk_out(cols[r0:r1], mask[r0:r1],
                                         eperm[r0:r1], o2 + r0 * k, r1 - r0)
                outs.append(out_b)
                args.append(arg_b)
        o2 += rb * k
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    arg = args[0] if len(args) == 1 else jnp.concatenate(args, axis=0)
    if inv_row is not None:
        out = _ell_recombine(plan, out)
    return out.astype(dense.dtype), arg
