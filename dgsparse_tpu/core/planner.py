"""Host-side edge-tile planner for the Pallas SpMM/SDDMM kernels.

TPU design stance (SURVEY.md §7): load balance is solved at PLAN time, not
run time. Where the reference picks between row-balance / nnz-balance CUDA
kernels with atomics (src/cuda/spmm_cuda.cu:36-165), we bin the CSR structure
once on the host into fixed-size edge tiles aligned to output row blocks —
the same role the reference's 128-quantized `qkpos` scan plays for spconv
(include/cuda/sparse_mapping.cuh:272-290). Every device step is then
static-shape: DMA row gathers + one-hot MXU segment matmuls, no atomics.

Plan layout for a CSR matrix (M rows, nnz edges), row block size R, edge
tile size E:
- every row block's edges are padded to a multiple of E (empty blocks get
  one all-padding tile so their output block is still zero-initialized),
- within a row block, edges are sorted by column (gather locality; the
  one-hot scatter matmul is order-independent),
- arrays (length T*E): `cols` (gather indices, padding -> 0), `eperm`
  (position of each plan slot in the original CSR edge order, padding -> -1;
  used to gather values and to scatter per-edge results back), `lrow`
  (row - block_base, padding -> 0),
- per tile (length T): `tile_rb` (owning row block, nondecreasing).

A C++ implementation of the same planner (for large graphs) lives in
native/planner.cpp; this numpy version is the reference and fallback.
"""

import dataclasses
import os
import time


import jax
import jax.numpy as jnp
import numpy as np


_TRACE_BUILD = os.environ.get("DGSPARSE_TPU_TRACE_BUILD", "") not in ("", "0")


class _BuildTimer:
    """Stage logger for plan construction, on when
    DGSPARSE_TPU_TRACE_BUILD=1 (perf triage of 100M-edge builds)."""

    def __init__(self, tag):
        self.tag = tag
        self.t0 = time.perf_counter()

    def lap(self, label):
        if _TRACE_BUILD:
            t = time.perf_counter()
            print(f"[build:{self.tag}] {label:36s} {t - self.t0:8.2f}s",
                  flush=True)
            self.t0 = t


class HostBuf:
    """Host-resident numpy array carried in pytree AUX data (identity
    hash/eq): plan-construction byproducts that no device kernel reads.
    Keeping them out of the pytree leaves keeps 100M-edge plans from
    pushing ~GBs through the host->device tunnel at construction (the
    DenseCellPlan slot/eperm pair alone is ~740 MB at Reddit scale)."""

    __slots__ = ("np",)

    def __init__(self, arr):
        self.np = np.asarray(arr)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EdgeTilePlan:
    cols: jax.Array       # [T*E] int32 gather index (0 for padding)
    eperm: jax.Array      # [T*E] int32 original edge position (-1 padding)
    lrow: jax.Array       # [T*E] int32 local row within block (0 padding)
    tile_rb: jax.Array    # [T] int32 owning row block per tile
    inv_eperm: jax.Array  # [nnz] int32 plan slot of each original edge
    num_tiles: int
    edge_tile: int        # E
    row_block: int        # R
    num_row_blocks: int
    num_rows: int
    num_cols: int
    nnz: int

    def tree_flatten(self):
        return (self.cols, self.eperm, self.lrow, self.tile_rb,
                self.inv_eperm), (
            self.num_tiles, self.edge_tile, self.row_block,
            self.num_row_blocks, self.num_rows, self.num_cols, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def padded_edges(self) -> int:
        return self.num_tiles * self.edge_tile

    def pad_ratio(self) -> float:
        return self.padded_edges / max(self.nnz, 1)


def _invert_eperm(eperm: np.ndarray, nnz: int) -> np.ndarray:
    inv = np.zeros(max(nnz, 1), np.int32)
    slots = np.nonzero(np.asarray(eperm) >= 0)[0]
    inv[np.asarray(eperm)[slots]] = slots
    return inv


def build_edge_tile_plan(
    rowptr: np.ndarray,
    col: np.ndarray,
    num_cols: int,
    edge_tile: int = 256,
    row_block: int = 128,
    sort_cols: bool = True,
) -> EdgeTilePlan:
    """Build the tile plan on the host (numpy) and upload it."""
    arrs = edge_tile_arrays_host(rowptr, col, edge_tile, row_block,
                                 sort_cols)
    cols, eperm, lrow, tile_rb = arrs
    m = len(np.asarray(jax.device_get(rowptr))) - 1
    nnz = len(col)
    return EdgeTilePlan(
        cols=jnp.asarray(cols),
        eperm=jnp.asarray(eperm),
        lrow=jnp.asarray(lrow),
        tile_rb=jnp.asarray(tile_rb),
        inv_eperm=jnp.asarray(_invert_eperm(eperm, nnz)),
        num_tiles=len(tile_rb),
        edge_tile=edge_tile,
        row_block=row_block,
        num_row_blocks=max(-(-m // row_block), 1),
        num_rows=m,
        num_cols=num_cols,
        nnz=nnz,
    )


def edge_tile_arrays_host(
    rowptr: np.ndarray,
    col: np.ndarray,
    edge_tile: int = 256,
    row_block: int = 128,
    sort_cols: bool = True,
) -> tuple:
    """Host-side (numpy) ESC tile layout: (cols, eperm, lrow, tile_rb).
    Split out from build_edge_tile_plan so callers that post-process the
    layout (ops/spconv._finalize_plan slot composition) never round-trip
    the arrays through the device."""
    rowptr = np.asarray(jax.device_get(rowptr))
    col = np.asarray(jax.device_get(col))
    m = len(rowptr) - 1
    nnz = len(col)
    num_rb = max(-(-m // row_block), 1)

    if nnz >= 4096:
        from dgsparse_tpu import native

        nat = native.plan_edge_tiles(rowptr, col, edge_tile, row_block,
                                     sort_cols)
        if nat is not None:
            return tuple(np.asarray(a) for a in nat)

    cols_l, perm_l, lrow_l, tile_rb_l = [], [], [], []
    coo_row = np.repeat(np.arange(m, dtype=np.int32), np.diff(rowptr))
    for rb in range(num_rb):
        lo = int(rowptr[min(rb * row_block, m)])
        hi = int(rowptr[min((rb + 1) * row_block, m)])
        e = hi - lo
        n_tiles = max(-(-e // edge_tile), 1)
        padded = n_tiles * edge_tile
        c = np.zeros(padded, np.int32)
        p = np.full(padded, -1, np.int32)
        # padding slots get an out-of-range local row: they match no row of
        # the one-hot (sum) and form their own segment (max/min)
        lr = np.full(padded, row_block, np.int32)
        if e:
            seg_cols = col[lo:hi]
            order = np.argsort(seg_cols, kind="stable") if sort_cols \
                else np.arange(e)
            c[:e] = seg_cols[order]
            p[:e] = lo + order
            lr[:e] = coo_row[lo:hi][order] - rb * row_block
        cols_l.append(c)
        perm_l.append(p)
        lrow_l.append(lr)
        tile_rb_l.append(np.full(n_tiles, rb, np.int32))

    del num_rb
    return (np.concatenate(cols_l), np.concatenate(perm_l),
            np.concatenate(lrow_l), np.concatenate(tile_rb_l))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EllPlan:
    """Row-major padded ELL: every row padded to the max degree K. For
    degree-regular graphs this is the reference's row-balance schedule
    re-thought for TPU: out = sum_k vals[:, k] * B[cols[:, k]] — gather +
    K-step weighted sum, NO segment reduction at all. Only built when
    padding stays small (max_deg * M / nnz <= threshold)."""

    cols: jax.Array       # [M, K] int32 (0 padding)
    vals_mask: jax.Array  # [M, K] f32 0/1 validity (edge values are applied
                          # separately so traced values stay traced)
    eperm: jax.Array      # [M, K] int32 original edge position (-1 padding)
    inv: jax.Array        # [nnz] int32 flat ELL slot (m*K + k) of each edge
    k: int
    num_rows: int
    num_cols: int
    nnz: int

    def tree_flatten(self):
        return (self.cols, self.vals_mask, self.eperm, self.inv), (
            self.k, self.num_rows, self.num_cols, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def pad_ratio(self) -> float:
        return self.k * self.num_rows / max(self.nnz, 1)


def build_ell_plan(rowptr: np.ndarray, col: np.ndarray,
                   num_cols: int) -> EllPlan:
    rowptr = np.asarray(jax.device_get(rowptr))
    col = np.asarray(jax.device_get(col))
    m = len(rowptr) - 1
    nnz = len(col)
    deg = np.diff(rowptr)
    k = max(int(deg.max()) if m else 0, 1)
    cols = np.zeros((m, k), np.int32)
    mask = np.zeros((m, k), np.float32)
    eperm = np.full((m, k), -1, np.int32)
    # vectorized fill: position within row
    row = np.repeat(np.arange(m, dtype=np.int64), deg)
    pos = np.arange(nnz, dtype=np.int64) - np.repeat(rowptr[:-1], deg)
    cols[row, pos] = col
    mask[row, pos] = 1.0
    eperm[row, pos] = np.arange(nnz, dtype=np.int32)
    inv = (row * k + pos).astype(np.int32)      # flat slot of edge e
    return EllPlan(cols=jnp.asarray(cols), vals_mask=jnp.asarray(mask),
                   eperm=jnp.asarray(eperm), inv=jnp.asarray(inv), k=k,
                   num_rows=m, num_cols=num_cols, nnz=nnz)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BucketedEllPlan:
    """Degree-bucketed ELL: rows grouped by ladder-degree buckets, each
    bucket a rectangular [rows_b, K_b] padded block (bounded padding even on
    power-law graphs), outputs assembled in bucket order and inverse-
    permuted once. Generalizes EllPlan to irregular degree distributions —
    the row-balance schedule without any segment reduction.

    Device layout is FLAT (3 arrays total, reshaped per bucket by static
    slices inside jit): under the axon tunnel every unique host->device
    array shape pays a ~30-50 ms transfer setup, so ~20 buckets x 4 arrays
    made construction pathological (BENCH_r01: 135 s)."""

    cols: jax.Array       # [sum rb_i*K_i] int32 flat gather ids (0 padding)
    eperm: jax.Array      # [sum rb_i*K_i] int32 original edge pos (-1 pad);
                          # the validity mask is derived as eperm >= 0
    rows: jax.Array       # [sum rb_i] int32 original row ids, bucket order
    inv_row: jax.Array    # [M] int32: position of original row in
                          # [bucket-sorted nonempty rows ++ zeros block];
                          # consumers append a (M - concat_rows) zeros
                          # block before gathering — a true permutation
    inv: jax.Array        # [nnz] int32 position of edge e in the concat of
                          # the buckets' flattened [rows_b*K_b] slot arrays
    ks: tuple             # static K_b per bucket
    rbs: tuple            # static rows_b per bucket
    num_rows: int
    num_cols: int
    nnz: int

    def tree_flatten(self):
        return (self.cols, self.eperm, self.rows, self.inv_row, self.inv), (
            self.ks, self.rbs, self.num_rows, self.num_cols, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def concat_rows(self) -> int:
        """Rows in the bucket-concatenated output (nonempty rows only)."""
        return sum(self.rbs)

    def pad_ratio(self) -> float:
        total = sum(rb * k for rb, k in zip(self.rbs, self.ks))
        return total / max(self.nnz, 1)

    def bucket_views(self):
        """Static-sliced per-bucket views: list of
        (cols [rb,K], mask f32 [rb,K], eperm [rb,K], rows [rb], K).
        Slicing happens inside jit (static offsets — fused, free)."""
        out = []
        o2, o1 = 0, 0
        for rb, k in zip(self.rbs, self.ks):
            ep = jax.lax.slice(self.eperm, (o2,), (o2 + rb * k,)).reshape(
                rb, k)
            c = jax.lax.slice(self.cols, (o2,), (o2 + rb * k,)).reshape(
                rb, k)
            r = jax.lax.slice(self.rows, (o1,), (o1 + rb,))
            out.append((c, (ep >= 0).astype(jnp.float32), ep, r, k))
            o2 += rb * k
            o1 += rb
        return out


# Bucket K ladder: exact K for small degrees, then ~1.19x steps — keeps
# padding ~1.15 on power-law graphs (the flat plan layout makes many
# buckets cheap; round 1's 1.41x ladder cost pad 1.43 on p2p).
_K_LADDER = np.array(
    list(range(1, 17)) + [20, 24, 29, 34, 41, 49, 58, 69, 83, 99, 118,
                          141, 168, 200, 256, 362, 512, 724, 1024, 1448,
                          2048, 2896, 4096, 5793, 8192, 11585, 16384,
                          23170, 32768, 46341, 65536], np.int64)


def build_bucketed_ell_plan(rowptr: np.ndarray, col: np.ndarray,
                            num_cols: int) -> BucketedEllPlan:
    rowptr = np.asarray(jax.device_get(rowptr))
    col = np.asarray(jax.device_get(col))
    m = len(rowptr) - 1
    nnz = len(col)
    deg = np.diff(rowptr).astype(np.int64)
    # Empty rows are EXCLUDED from the layout entirely (p2p-Gnutella31 has
    # 46K degree-0 rows of 62.6K — bucketing them at K=1 was 30% pure
    # padding). Their outputs are zero; recombination writes only the
    # nonempty rows (scatter) or gathers a sentinel zero row (inv_row =
    # concat_rows for empty rows).
    nonempty = np.nonzero(deg > 0)[0]
    # bucket = index of the smallest ladder K >= degree; extend the ladder
    # by pow2 steps when a hub row exceeds its top rung
    kb = deg[nonempty]
    lad = _K_LADDER
    maxdeg = int(kb.max()) if len(kb) else 1
    if maxdeg > lad[-1]:
        extra, v = [], int(lad[-1])
        while v < maxdeg:
            v *= 2
            extra.append(v)
        lad = np.concatenate([lad, np.asarray(extra, np.int64)])
    bucket_ne = np.searchsorted(lad, kb, side="left").astype(np.int64)
    # Merge slot-poor buckets upward: every bucket is a separate jit
    # subgraph (gather + einsum, and [rb,K,F] winner masks in the max/min
    # backward), so dozens of tiny buckets cost compile time and gather
    # dispatch for no padding win. A bucket smaller than ~2K slots joins the
    # next one up unless that would more than quadruple its slot count.
    counts = np.bincount(bucket_ne, minlength=len(lad))
    remap = np.arange(len(lad), dtype=np.int64)
    nz = np.nonzero(counts)[0]
    for pos in range(len(nz) - 1):
        i, j = nz[pos], nz[pos + 1]
        if counts[i] * lad[i] < 2048 and \
                counts[i] * lad[j] < 8192:
            remap[i] = j
            counts[j] += counts[i]
            counts[i] = 0
    for i in range(len(lad) - 2, -1, -1):
        remap[i] = remap[remap[i]]
    bucket_ne = remap[bucket_ne]
    order = nonempty[np.argsort(bucket_ne, kind="stable")]  # bucket order
    n_ne = len(order)
    # inv_row[original_row] = its position in [bucket-sorted concat ++
    # zeros block]. Empty rows get DISTINCT zeros-block positions so the
    # recombination gather is a true permutation (gathering one sentinel
    # row 46K times measured 2x slower than a permutation gather — HBM
    # row-repeat conflicts).
    inv_row = np.empty(m, np.int32)
    inv_row[order] = np.arange(n_ne, dtype=np.int32)
    empty_rows = np.nonzero(deg == 0)[0]
    inv_row[empty_rows] = n_ne + np.arange(len(empty_rows), dtype=np.int32)

    if n_ne == 0:
        # Degenerate (no edges — e.g. the residue of a fully-dense hybrid
        # split): one empty K=1 bucket keeps every consumer's concat/einsum
        # well-formed; the recombination zeros block covers all rows.
        plan = BucketedEllPlan(
            cols=jnp.zeros((0,), jnp.int32),
            eperm=jnp.full((0,), -1, jnp.int32),
            rows=jnp.zeros((0,), jnp.int32),
            inv_row=jnp.asarray(inv_row),
            inv=jnp.zeros((nnz,), jnp.int32), ks=(1,), rbs=(0,),
            num_rows=m, num_cols=num_cols, nnz=nnz)
        plan._eperm_host = np.full((0,), -1, np.int32)
        plan._inv_host = np.zeros(nnz, np.int32)
        return plan

    cols_l, eperms_l, ks, rbs = [], [], [], []
    inv = np.zeros(nnz, np.int32)
    flat_off = 0
    sorted_bucket = np.sort(bucket_ne, kind="stable")
    boundaries = np.nonzero(np.diff(sorted_bucket))[0] + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [n_ne]])
    for s, t in zip(starts, ends):
        rows = order[s:t]
        k = int(lad[int(sorted_bucket[s])])
        rb = len(rows)
        c = np.zeros((rb, k), np.int32)
        ep = np.full((rb, k), -1, np.int32)
        deg_b = deg[rows]
        e_b = int(deg_b.sum())
        if e_b:
            rep_row = np.repeat(np.arange(rb, dtype=np.int64), deg_b)
            csum = np.concatenate([[0], np.cumsum(deg_b)[:-1]])
            rep_pos = np.arange(e_b, dtype=np.int64) - np.repeat(csum, deg_b)
            src = np.repeat(rowptr[rows].astype(np.int64), deg_b) + rep_pos
            c[rep_row, rep_pos] = col[src]
            ep[rep_row, rep_pos] = src.astype(np.int32)
            inv[src] = (flat_off + rep_row * k + rep_pos).astype(np.int32)
        flat_off += rb * k
        cols_l.append(c.reshape(-1))
        eperms_l.append(ep.reshape(-1))
        ks.append(k)
        rbs.append(rb)
    eperm_np = np.concatenate(eperms_l)
    plan = BucketedEllPlan(
        cols=jnp.asarray(np.concatenate(cols_l)),
        eperm=jnp.asarray(eperm_np),
        rows=jnp.asarray(order.astype(np.int32)),
        inv_row=jnp.asarray(inv_row),
        inv=jnp.asarray(inv), ks=tuple(ks), rbs=tuple(rbs), num_rows=m,
        num_cols=num_cols, nnz=nnz)
    # host copies for set_values()/remaps — save device round-trips later
    plan._eperm_host = eperm_np
    plan._inv_host = inv
    return plan


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ColChunkedEllPlan:
    """Column-chunked bucketed ELL: the dense gather table (B in the
    forward, the cotangent g in the transpose) is split into row ranges of
    `chunk_size`, and each chunk's edges get their own BucketedEllPlan
    with chunk-LOCAL column ids. Each chunk gathers from a `lax.slice` of
    the table and produces a [M, F] partial that accumulates into the
    output — sums are order-invariant, so no cross-chunk permutation is
    ever materialized.

    Why (measured, benchmark/probe_gather_tablesize.py, TPU v5e): the XLA
    random row gather issues at ~2.1–2.7 ns/row while the gathered table
    is ≲16 MB but ~10.6 ns/row beyond; slicing a 64 MB table into 4 MB
    chunks restores the fast regime (2.09 ns/row measured INCLUDING the
    extra assembly). Reference analog: the row-caching staging trick of
    `src/ge-spmm/csrspmm_rowcaching.cu:50-71` — restructure the dense-
    operand access for locality; here it happens at plan time because TPU
    has no per-warp scratchpad to stage into at run time."""

    subs: tuple        # one BucketedEllPlan per chunk (pytree children);
                       # eperm entries are ORIGINAL (global) edge ids
    chunk_size: int    # table rows per chunk (last chunk may be short)
    num_rows: int
    num_cols: int      # total table rows = sum of chunk extents
    nnz: int

    def tree_flatten(self):
        return (self.subs,), (self.chunk_size, self.num_rows,
                              self.num_cols, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    @property
    def nchunks(self) -> int:
        return len(self.subs)

    def pad_ratio(self) -> float:
        tot = sum(sum(rb * k for rb, k in zip(s.rbs, s.ks))
                  for s in self.subs)
        return tot / max(self.nnz, 1)


def build_col_chunked_ell_plan(rowptr: np.ndarray, col: np.ndarray,
                               num_cols: int, nchunks: int,
                               gids: "np.ndarray | None" = None
                               ) -> ColChunkedEllPlan:
    """Partition the CSR's edges by `col // chunk_size` (a stable counting
    sort, so row-major order is preserved inside each chunk) and build a
    BucketedEllPlan per chunk over chunk-local column ids. `gids` maps
    this sub-CSR's edge positions to original edge ids (identity if None)
    — the per-chunk eperm is remapped so `values` gathers stay global."""
    rowptr = np.asarray(rowptr)
    col = np.asarray(col)
    m = len(rowptr) - 1
    nnz = len(col)
    cs = max(-(-num_cols // max(nchunks, 1)), 1)
    nchunks = -(-num_cols // cs)
    chunk_of = col.astype(np.int64) // cs
    order = np.argsort(chunk_of, kind="stable")
    bounds = np.searchsorted(chunk_of[order], np.arange(nchunks + 1))
    deg = np.diff(rowptr).astype(np.int64)
    row_of = np.repeat(np.arange(m, dtype=np.int32), deg)
    subs = []
    for c in range(nchunks):
        sel = order[bounds[c]:bounds[c + 1]]
        sub_col = (col[sel] - c * cs).astype(np.int32)
        counts = np.bincount(row_of[sel], minlength=m)
        sub_rowptr = np.zeros(m + 1, np.int64)
        np.cumsum(counts, out=sub_rowptr[1:])
        sub = build_bucketed_ell_plan(
            sub_rowptr, sub_col, min(cs, num_cols - c * cs))
        ep = sub._eperm_host
        if len(sel):
            loc = sel.astype(np.int32) if gids is None \
                else np.asarray(gids)[sel].astype(np.int32)
            ep = np.where(ep >= 0, loc[np.maximum(ep, 0)],
                          -1).astype(np.int32)
            sub.eperm = jnp.asarray(ep)
            sub._eperm_host = ep
        # the chunk-local `inv` (edge -> slot) has no consumer here (the
        # max/min argmax machinery never runs on chunked plans) — drop the
        # device copy to save nnz*4 bytes of HBM + tunnel transfer
        sub.inv = jnp.zeros((0,), jnp.int32)
        sub._inv_host = None
        subs.append(sub)
    return ColChunkedEllPlan(subs=tuple(subs), chunk_size=cs,
                             num_rows=m, num_cols=num_cols, nnz=nnz)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DenseCellPlan:
    """Truly dense (128-row x 128-col) cells MATERIALIZED as dense blocks:
    SpMM over them is a plain block-sparse matmul out[rb] += cell @ B[cw] —
    one [R,C]x[C,F] MXU pass per cell instead of ceil(e/E) one-hot tile
    pairs. At cell fill >= ~5% this is both fewer FLOPs (2·R·C·F vs
    2·e·F·(C+R)) and ~e/E fewer grid steps than the one-hot BELL kernel.
    The role analog of the reference's center-tap dense cuBLAS GEMM
    (src/cuda/spconv_cuda.cu:44-83): route the dense part of the problem
    to a plain GEMM and keep kernels for the irregular rest.

    Structure-only: the [ncells, R, C] block array is values-dependent and
    is materialized by `materialize_cells` (cached on Storage for concrete
    values, rebuilt in-graph for traced values)."""

    slot: object          # HostBuf [nnz_d] int32 flat slot (cell*R*C +
                          # lr*C + lc), sorted ascending (duplicates sum).
                          # HOST-side: only the host materializer and the
                          # (small-scale) traced-values path read it.
    eperm: object         # HostBuf [nnz_d] int32 original edge id per slot
    cell_rb: jax.Array    # [ncells] int32 row block (nondecreasing)
    cell_cw: jax.Array    # [ncells] int32 column window
    t_order: jax.Array    # [ncells] int32 cell visit order for the
                          # transpose pass (sorted by (cw, rb))
    t_rb: jax.Array       # [ncells] int32 = cell_rb[t_order]
    t_cw: jax.Array       # [ncells] int32 = cell_cw[t_order] (nondecr.)
    num_cells: int
    row_block: int
    col_window: int
    num_rows: int
    num_cols: int
    nnz: int              # dense-tier edges only

    def tree_flatten(self):
        # slot/eperm ride in AUX (HostBuf, identity-hashed): they are
        # construction/materialization inputs, not kernel operands
        return (self.cell_rb, self.cell_cw,
                self.t_order, self.t_rb, self.t_cw), (
            self.slot, self.eperm,
            self.num_cells, self.row_block, self.col_window,
            self.num_rows, self.num_cols, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], *children, *aux[2:])

    @property
    def cell_slots(self) -> int:
        return self.num_cells * self.row_block * self.col_window

    def fill_ratio(self) -> float:
        return self.nnz / max(self.cell_slots, 1)


def materialize_cells_np(plan: DenseCellPlan, values) -> np.ndarray:
    """Host-side cell materialization (construction-time cache path).
    values: [nnz_global] numpy or None (ones)."""
    slot = plan.slot.np if isinstance(plan.slot, HostBuf) \
        else np.asarray(jax.device_get(plan.slot))
    n = plan.cell_slots
    if not len(slot):
        return np.zeros((plan.num_cells, plan.row_block, plan.col_window),
                        np.float32)
    if values is None:
        # unweighted: the cell entry is the (row, col) multiplicity
        flat = np.bincount(slot, minlength=n).astype(np.float32)
    else:
        ep = plan.eperm.np if isinstance(plan.eperm, HostBuf) \
            else np.asarray(jax.device_get(plan.eperm))
        v = np.asarray(values)[ep].astype(np.float64)
        # bincount-with-weights is a single C pass (np.add.at and
        # per-segment reduceat both measured 100x slower at 92M edges)
        flat = np.bincount(slot, weights=v, minlength=n).astype(np.float32)
    return flat.reshape(plan.num_cells, plan.row_block, plan.col_window)


def build_dense_cell_plan(coo_row, col, edge_ids, sel_cells, num_cw,
                          row_block, col_window, num_rows, num_cols,
                          nnz_total) -> DenseCellPlan:
    """Build from the dense-tier edges (original-id arrays) + the sorted
    unique cell ids selected for materialization."""
    ncells = len(sel_cells)
    coo_row = np.asarray(coo_row, np.int64)
    cell_of_edge = (coo_row // row_block) * num_cw + \
        col.astype(np.int64) // col_window
    cidx = np.searchsorted(sel_cells, cell_of_edge)
    lr = (coo_row % row_block).astype(np.int64)
    lc = (col.astype(np.int64) % col_window)
    slot = cidx * (row_block * col_window) + lr * col_window + lc
    order = np.argsort(slot, kind="stable")
    cell_rb = (sel_cells // num_cw).astype(np.int32)
    cell_cw = (sel_cells % num_cw).astype(np.int32)
    t_order = np.lexsort((cell_rb, cell_cw)).astype(np.int32)
    return DenseCellPlan(
        slot=HostBuf(slot[order].astype(np.int32)),
        eperm=HostBuf(edge_ids[order].astype(np.int32)),
        cell_rb=jnp.asarray(cell_rb),
        cell_cw=jnp.asarray(cell_cw),
        t_order=jnp.asarray(t_order),
        t_rb=jnp.asarray(cell_rb[t_order]),
        t_cw=jnp.asarray(cell_cw[t_order]),
        num_cells=ncells, row_block=row_block, col_window=col_window,
        num_rows=num_rows, num_cols=num_cols, nnz=len(coo_row))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class HybridPlan:
    """Three-tier plan-time structure split:
    - truly dense cells -> DenseCellPlan (materialized block-sparse GEMM),
    - moderately filled cells -> BELL (one-hot MXU, zero random access),
    - sparse residue -> bucketed ELL (gather + K-sum).
    The decomposition that makes clustered graphs (communities, hub
    columns) fast: only leftover edges pay the issue-bound gather.

    No reference counterpart — the reference's answer to structure is its
    runtime algorithm zoo (src/ge-spmm/gespmm.cc); here structure is
    exploited at plan time. `bell` / `cells` may be None when their tier
    is empty; all eperm/inv arrays are in ORIGINAL edge-id space."""

    bell: object              # BellPlan or None
    ell: "BucketedEllPlan"    # residue
    cells: object             # DenseCellPlan or None
    # transpose plan for the backward's d_dense = Aᵀ·g: the cells tier
    # transposes for FREE (same materialized blocks, swapped contraction
    # dims + t_order), so only the non-cells edges need this transpose
    # bucketed-ELL plan (None when not built).
    ell_t: object
    # SDDMM assembly permutation: per original edge, its position in the
    # concatenated per-slot value stream [cells flat ++ bell slots ++ ell
    # slots] (None when not built). One 1-D gather turns tier-local SDDMM
    # results into CSR edge order.
    edge_src: object
    num_rows: int
    num_cols: int
    nnz: int

    def tree_flatten(self):
        return (self.bell, self.ell, self.cells, self.ell_t,
                self.edge_src), (self.num_rows, self.num_cols, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def dense_fraction(self) -> float:
        d = (self.bell.nnz if self.bell is not None else 0) + \
            (self.cells.nnz if self.cells is not None else 0)
        return d / max(self.nnz, 1)

    def pad_ratio(self) -> float:
        """One-hot-tier slots per edge (the cells tier has no padding in
        the gather sense; its cost is flat per cell)."""
        padded = (self.bell.padded_edges if self.bell is not None else 0) \
            + sum(rb * k for rb, k in zip(self.ell.rbs, self.ell.ks)) \
            + (self.cells.nnz if self.cells is not None else 0)
        return padded / max(self.nnz, 1)


def build_hybrid_plan(
    rowptr: np.ndarray,
    col: np.ndarray,
    num_cols: int,
    edge_tile: int = 256,
    row_block: int = 128,
    col_window: int = 128,
    min_cell_edges: int = 96,
    dense_min_edges: int = 768,
    cells_budget_bytes: int = 4 << 30,
):
    """Three-way split of the edge set by (128-row x 128-col) cell fill:
    >= dense_min_edges -> materialized dense cells (block-sparse GEMM),
    >= min_cell_edges -> one-hot BELL tiles, else -> bucketed-ELL residue.

    Returns a HybridPlan, or None when fewer than 25% of edges live in
    cells above min_cell_edges (plain bucketed ELL wins then). All
    sub-plans carry eperm/inv in ORIGINAL edge-id space, so values/
    gradients route without extra remapping."""
    rowptr = np.asarray(jax.device_get(rowptr))
    col = np.asarray(jax.device_get(col))
    m = len(rowptr) - 1
    nnz = len(col)
    if nnz == 0:
        return None
    _bt = _BuildTimer("hybrid")

    # lazy [nnz] row-id expansion: the native split path never needs it
    # (sub-CSR degrees come from searchsorted below) — skipping the
    # 115M-element np.repeat saves ~14 s at Reddit scale
    _coo = [None]

    def coo_row_arr():
        if _coo[0] is None:
            _coo[0] = np.repeat(np.arange(m, dtype=np.int32),
                                np.diff(rowptr))
        return _coo[0]
    num_cw = max(-(-num_cols // col_window), 1)
    max_cells = min(int(cells_budget_bytes) // (4 * row_block * col_window),
                    65536)

    cells = None
    bell_edges = res_ids = None
    nat = None
    if nnz >= (1 << 20):
        from dgsparse_tpu import native

        nat = native.cell_split(rowptr, col, m, num_cols, row_block,
                                col_window, int(min_cell_edges),
                                int(dense_min_edges), max_cells)
    _bt.lap("native cell_split")
    if nat is not None:
        d_slot, d_eperm, cell_rb, cell_cw, bell_edges, res_ids = nat
        if nnz - len(res_ids) < 0.25 * nnz:
            return None
        if len(d_slot):
            t_order = np.lexsort((cell_rb, cell_cw)).astype(np.int32)
            cells = DenseCellPlan(
                slot=HostBuf(d_slot), eperm=HostBuf(d_eperm),
                cell_rb=jnp.asarray(cell_rb), cell_cw=jnp.asarray(cell_cw),
                t_order=jnp.asarray(t_order),
                t_rb=jnp.asarray(cell_rb[t_order]),
                t_cw=jnp.asarray(cell_cw[t_order]),
                num_cells=len(cell_rb), row_block=row_block,
                col_window=col_window, num_rows=m, num_cols=num_cols,
                nnz=len(d_slot))
            _bt.lap("DenseCellPlan device arrays")
    else:
        coo_row = coo_row_arr()
        cell = (coo_row.astype(np.int64) // row_block) * num_cw \
            + col.astype(np.int64) // col_window
        # count edges per touched cell via sort (cells of one row block are
        # contiguous in edge order already; full sort keeps it simple)
        order = np.argsort(cell, kind="stable")
        cs = cell[order]
        uniq_mask = np.empty(nnz, bool)
        uniq_mask[0] = True
        np.not_equal(cs[1:], cs[:-1], out=uniq_mask[1:])
        starts = np.nonzero(uniq_mask)[0]
        counts = np.diff(np.append(starts, nnz))
        uniq_cells = cs[starts]
        min_edges = int(min_cell_edges)
        nonsparse_cells = counts >= min_edges
        dense_mask_sorted = np.repeat(nonsparse_cells, counts)
        dense_edges = order[dense_mask_sorted]          # original edge ids
        if len(dense_edges) < 0.25 * nnz:
            return None

        # cells tier: the densest cells, capped by the materialization
        # budget (and the scalar-prefetch SMEM budget on cell count)
        mat_cells = counts >= int(dense_min_edges)
        if int(mat_cells.sum()) > max_cells:
            cand = np.nonzero(mat_cells)[0]
            keep = cand[np.argsort(counts[cand], kind="stable")[::-1]
                        [:max_cells]]
            mat_cells = np.zeros(len(counts), bool)
            mat_cells[keep] = True
        bell_cells = nonsparse_cells & ~mat_cells

        mat_edges = order[np.repeat(mat_cells, counts)]
        bell_edges = np.sort(order[np.repeat(bell_cells, counts)])
        dense_edge_mask = np.zeros(nnz, bool)
        dense_edge_mask[dense_edges] = True
        res_ids = np.nonzero(~dense_edge_mask)[0]

        if len(mat_edges):
            sel = uniq_cells[mat_cells]                # sorted unique cells
            cells = build_dense_cell_plan(
                coo_row[mat_edges], col[mat_edges], mat_edges, sel, num_cw,
                row_block, col_window, m, num_cols, nnz)

    def sub_csr(ids):
        ids = np.asarray(ids)                        # CSR order (sorted),
        sub_col = col[ids]                           # int32 indexing is fine
        # per-row counts of the sorted edge-id subset without touching a
        # [nnz] coo_row table: one searchsorted over rowptr
        sub_rowptr = np.searchsorted(ids, rowptr).astype(np.int32)
        return sub_rowptr, sub_col, ids.astype(np.int32, copy=False)

    _bt.lap("cell tier done")
    bell = None
    if len(bell_edges):
        b_rowptr, b_col, b_ids = sub_csr(bell_edges)
        bell = build_bell_plan(b_rowptr, b_col, num_cols,
                               edge_tile=edge_tile, row_block=row_block,
                               col_window=col_window)
        bp = bell._eperm_host
        bp = np.where(bp >= 0, b_ids[np.maximum(bp, 0)], -1).astype(np.int32)
        bell.eperm = jnp.asarray(bp)
        bell._eperm_host = bp
    _bt.lap("bell tier")
    e_rowptr, e_col, e_ids = sub_csr(res_ids)
    _bt.lap("residue sub_csr")
    ell = build_bucketed_ell_plan(e_rowptr, e_col, num_cols)
    _bt.lap("residue bucketed ELL")
    ep = ell._eperm_host
    ep = np.where(ep >= 0, e_ids[np.maximum(ep, 0)], -1).astype(np.int32)
    ell.eperm = jnp.asarray(ep)
    ell._eperm_host = ep
    # sub-CSR host twin: lets Storage build the column-chunked residue
    # variant (ColChunkedEllPlan) without re-deriving the residue edge set
    ell._sub_csr_host = (e_rowptr, e_col, e_ids)
    # residual inv maps original edge -> flat ELL slot; only meaningful
    # for residue edges (dense edges keep 0 — never read)
    inv = np.zeros(nnz, np.int32)
    inv[e_ids] = ell._inv_host
    ell.inv = jnp.asarray(inv)
    ell._inv_host = inv
    _bt.lap("residue eperm/inv remap")

    # transpose plan over the NON-cells edges for the backward's d_dense
    # (the cells tier transposes via the same materialized blocks)
    nd_ids = np.sort(np.concatenate([
        np.asarray(bell_edges, np.int32), np.asarray(res_ids, np.int32)]))
    nd_rowptr, nd_col, nd_ids = sub_csr(nd_ids)
    from dgsparse_tpu import native as _native

    _bt.lap("nd_ids + sub_csr")
    t = _native.csr2csc(nd_rowptr, nd_col, m, num_cols)
    if t is not None:
        colptr_t, row_t, perm_t = t
    else:
        order_t = np.argsort(nd_col, kind="stable")
        colptr_t = np.zeros(num_cols + 1, np.int64)
        colptr_t[1:] = np.cumsum(np.bincount(nd_col, minlength=num_cols))
        colptr_t = colptr_t.astype(np.int32)
        coo_nd = coo_row_arr()[nd_ids.astype(np.int64)]
        row_t = coo_nd[order_t].astype(np.int32)
        perm_t = order_t.astype(np.int32)
    _bt.lap("csr2csc transpose")
    ell_t = build_bucketed_ell_plan(colptr_t, row_t, m)
    tp = ell_t._eperm_host
    tp = np.where(tp >= 0, nd_ids[perm_t[np.maximum(tp, 0)]],
                  -1).astype(np.int32)
    ell_t.eperm = jnp.asarray(tp)
    ell_t._eperm_host = tp
    ell_t._sub_csr_host = (colptr_t, row_t,
                           nd_ids[perm_t].astype(np.int32))
    _bt.lap("transpose bucketed ELL")

    # SDDMM assembly permutation (see HybridPlan.edge_src)
    src = np.empty(nnz, np.int32)
    off = 0
    if cells is not None:
        src[cells.eperm.np] = cells.slot.np
        off += cells.cell_slots
    if bell is not None:
        bp = bell._eperm_host
        valid = np.nonzero(bp >= 0)[0]
        src[bp[valid]] = off + valid.astype(np.int32)
        off += bell.padded_edges
    ep_flat = ell._eperm_host
    valid = np.nonzero(ep_flat >= 0)[0]
    src[ep_flat[valid]] = off + valid.astype(np.int32)
    _bt.lap("edge_src assembly")
    hp = HybridPlan(bell=bell, ell=ell, cells=cells, ell_t=ell_t,
                    edge_src=jnp.asarray(src), num_rows=m,
                    num_cols=num_cols, nnz=nnz)
    # host twin: Storage composes slot_gmap from this at construction —
    # a device_get of the 115M-element device copy through the axon
    # tunnel costs minutes (observed: 431 s vs 26.5 s from_csr)
    hp._edge_src_host = src
    return hp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BellPlan:
    """Blocked-ELL plan: 2D (row-block x column-window) tiles for the fully
    in-MXU BELL kernel. Every tile's edges live inside one 128-row output
    block AND one column window, so both the gather (one-hot [E, C] x
    B_window) and the scatter (one-hot [R, E] x contrib) run on the MXU
    with no random memory access at all. Only viable when cells fill —
    pad_ratio() gates the AUTO heuristic."""

    lcol: jax.Array       # [T*E] col - window_base (0 padding)
    lrow: jax.Array       # [T*E] row - block_base (0 padding)
    eperm: jax.Array      # [T*E] original edge position (-1 padding)
    tile_rb: jax.Array    # [T] row block per tile (nondecreasing)
    tile_cw: jax.Array    # [T] column window per tile
    # Chunked execution (Reddit scale): the scalar-prefetch arrays live in
    # SMEM (~1 MB), so a plan with > ~100K tiles must run as several
    # pallas_calls over tile ranges cut at block boundaries. tile_lb is
    # the CHUNK-LOCAL block index per tile; block_inv maps row block ->
    # its position in the chunk-concatenated output. Empty (None/()) for
    # small plans.
    tile_lb: object       # [T] int32 or None
    block_inv: object     # [num_row_blocks] int32 or None
    num_tiles: int
    edge_tile: int
    row_block: int
    col_window: int
    num_row_blocks: int
    num_col_windows: int
    num_rows: int
    num_cols: int
    nnz: int
    chunks: tuple = ()    # ((t0, t1, n_blocks), ...) static

    def tree_flatten(self):
        return (self.lcol, self.lrow, self.eperm, self.tile_rb,
                self.tile_cw, self.tile_lb, self.block_inv), (
            self.num_tiles, self.edge_tile, self.row_block, self.col_window,
            self.num_row_blocks, self.num_col_windows, self.num_rows,
            self.num_cols, self.nnz, self.chunks)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def padded_edges(self) -> int:
        return self.num_tiles * self.edge_tile

    def pad_ratio(self) -> float:
        return self.padded_edges / max(self.nnz, 1)


# max tiles per pallas_call: 2 int32 scalar-prefetch arrays of this length
# stay ~0.5 MB, under the ~1 MB SMEM budget
_BELL_CHUNK_TILES = 65536


def build_bell_plan(
    rowptr: np.ndarray,
    col: np.ndarray,
    num_cols: int,
    edge_tile: int = 128,
    row_block: int = 128,
    col_window: int = 128,
) -> BellPlan:
    """2D-tile the CSR structure: per row block, edges sorted by column and
    split at column-window boundaries; each (block, window) cell padded to a
    multiple of edge_tile. Empty row blocks get one all-padding tile so
    their output block still zero-initializes (appended last; the kernel
    only needs a block's tiles to be consecutive, not globally sorted).

    Fully vectorized numpy (the round-1 per-block Python loop took 2.8 s
    at 148K edges — unusable at Reddit scale)."""
    rowptr = np.asarray(jax.device_get(rowptr))
    col = np.asarray(jax.device_get(col))
    m = len(rowptr) - 1
    nnz = len(col)
    num_rb = max(-(-m // row_block), 1)
    num_cw = max(-(-num_cols // col_window), 1)
    deg = np.diff(rowptr)
    coo_row = np.repeat(np.arange(m, dtype=np.int64), deg)

    if nnz:
        erb = coo_row // row_block                    # per-edge row block
        ew = col.astype(np.int64) // col_window       # per-edge window
        order = np.lexsort((np.arange(nnz), ew, erb))  # stable (rb, w)
        sc = col[order].astype(np.int64)
        srb = erb[order]
        sw = ew[order]
        lr_all = (coo_row[order] - srb * row_block).astype(np.int32)
        lc_all = (sc - sw * col_window).astype(np.int32)
        cell = srb * num_cw + sw
        # cell boundaries in the sorted edge stream
        uniq_mask = np.empty(nnz, bool)
        uniq_mask[0] = True
        np.not_equal(cell[1:], cell[:-1], out=uniq_mask[1:])
        cell_start = np.nonzero(uniq_mask)[0]          # [C]
        counts = np.diff(np.append(cell_start, nnz))   # [C]
        cell_rb = srb[cell_start].astype(np.int32)
        cell_cw = sw[cell_start].astype(np.int32)
        n_tiles_c = -(-counts // edge_tile)            # [C]
        padded_c = n_tiles_c * edge_tile
        pad_off = np.concatenate([[0], np.cumsum(padded_c)[:-1]])
        total = int(padded_c.sum())
        # slot of each sorted edge = its cell's padded offset + rank in cell
        within = np.arange(nnz, dtype=np.int64) - np.repeat(
            cell_start, counts)
        slot = np.repeat(pad_off, counts) + within
        lcol = np.zeros(total, np.int32)
        lrow = np.zeros(total, np.int32)
        eperm = np.full(total, -1, np.int32)
        lcol[slot] = lc_all
        lrow[slot] = lr_all
        eperm[slot] = order.astype(np.int32)
        tile_rb = np.repeat(cell_rb, n_tiles_c)
        tile_cw = np.repeat(cell_cw, n_tiles_c)
        # all-padding singleton tiles for row blocks with no edges
        blk_deg = np.zeros(num_rb, np.int64)
        np.add.at(blk_deg, np.arange(m) // row_block, deg)
        empty_rb = np.nonzero(blk_deg == 0)[0].astype(np.int32)
    else:
        lcol = lrow = np.zeros(0, np.int32)
        eperm = np.zeros(0, np.int32)
        tile_rb = tile_cw = np.zeros(0, np.int32)
        empty_rb = np.arange(num_rb, dtype=np.int32)
    if len(empty_rb):
        pad_n = len(empty_rb) * edge_tile
        lcol = np.concatenate([lcol, np.zeros(pad_n, np.int32)])
        lrow = np.concatenate([lrow, np.zeros(pad_n, np.int32)])
        eperm = np.concatenate([eperm, np.full(pad_n, -1, np.int32)])
        tile_rb = np.concatenate([tile_rb, empty_rb])
        tile_cw = np.concatenate([tile_cw,
                                  np.zeros(len(empty_rb), np.int32)])

    # Chunking for huge plans: scalar-prefetch arrays must fit SMEM
    # (observed hard failure at 720K tiles: "prefetched SMEM operand"
    # 2.8 MB > 1 MB). Cut the tile stream at block-run boundaries into
    # <= _BELL_CHUNK_TILES ranges; each chunk's kernel writes its visited
    # blocks contiguously (tile_lb), and block_inv restores block order.
    t_total = len(tile_rb)
    chunks = ()
    tile_lb = block_inv = None
    if t_total > _BELL_CHUNK_TILES:
        change = np.empty(t_total, bool)
        change[0] = True
        np.not_equal(tile_rb[1:], tile_rb[:-1], out=change[1:])
        runs = np.nonzero(change)[0]
        gb = np.cumsum(change) - 1                  # visitation block idx
        vis_rb = tile_rb[runs]
        binv = np.empty(num_rb, np.int64)
        binv[vis_rb] = np.arange(len(vis_rb))
        # cut at the LAST run boundary that keeps the chunk within the
        # limit (cutting at the first boundary past it could overflow the
        # SMEM budget by a long block run); a single run longer than the
        # limit becomes its own over-budget chunk — assert against it.
        bounds = [0]
        prev = None
        for r in runs[1:]:
            r = int(r)
            if r - bounds[-1] > _BELL_CHUNK_TILES:
                bounds.append(prev if (prev is not None
                                       and prev > bounds[-1]) else r)
            prev = r
        if t_total - bounds[-1] > _BELL_CHUNK_TILES and prev is not None \
                and prev > bounds[-1]:
            bounds.append(prev)
        bounds.append(t_total)
        run_set = set(int(r) for r in runs)
        for i in range(len(bounds) - 1):
            # a chunk may exceed the budget only when it is ONE
            # unsplittable block run (no interior run boundary)
            if bounds[i + 1] - bounds[i] > _BELL_CHUNK_TILES:
                interior = [r for r in run_set
                            if bounds[i] < r < bounds[i + 1]]
                assert not interior, (
                    "BELL chunking left a splittable over-budget chunk "
                    f"({bounds[i + 1] - bounds[i]} tiles)")
        lb = gb.copy()
        ch = []
        for i in range(len(bounds) - 1):
            t0, t1 = bounds[i], bounds[i + 1]
            lb[t0:t1] -= gb[t0]
            ch.append((t0, t1, int(gb[t1 - 1] - gb[t0] + 1)))
        chunks = tuple(ch)
        tile_lb = jnp.asarray(lb.astype(np.int32))
        block_inv = jnp.asarray(binv.astype(np.int32))

    plan = BellPlan(
        lcol=jnp.asarray(lcol),
        lrow=jnp.asarray(lrow),
        eperm=jnp.asarray(eperm),
        tile_rb=jnp.asarray(tile_rb),
        tile_cw=jnp.asarray(tile_cw),
        tile_lb=tile_lb,
        block_inv=block_inv,
        num_tiles=t_total,
        edge_tile=edge_tile,
        row_block=row_block,
        col_window=col_window,
        num_row_blocks=num_rb,
        num_col_windows=num_cw,
        num_rows=m,
        num_cols=num_cols,
        nnz=nnz,
        chunks=chunks,
    )
    plan._eperm_host = np.asarray(eperm)
    return plan
