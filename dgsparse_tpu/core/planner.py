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


import jax
import jax.numpy as jnp
import numpy as np


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
    """Build the tile plan on the host (numpy)."""
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
            cols, eperm, lrow, tile_rb = nat
            return EdgeTilePlan(
                cols=jnp.asarray(cols), eperm=jnp.asarray(eperm),
                lrow=jnp.asarray(lrow), tile_rb=jnp.asarray(tile_rb),
                inv_eperm=jnp.asarray(_invert_eperm(eperm, nnz)),
                num_tiles=len(tile_rb), edge_tile=edge_tile,
                row_block=row_block, num_row_blocks=num_rb, num_rows=m,
                num_cols=num_cols, nnz=nnz)

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

    cols = np.concatenate(cols_l)
    eperm = np.concatenate(perm_l)
    lrow = np.concatenate(lrow_l)
    tile_rb = np.concatenate(tile_rb_l)
    return EdgeTilePlan(
        cols=jnp.asarray(cols),
        eperm=jnp.asarray(eperm),
        lrow=jnp.asarray(lrow),
        tile_rb=jnp.asarray(tile_rb),
        inv_eperm=jnp.asarray(_invert_eperm(eperm, nnz)),
        num_tiles=len(tile_rb),
        edge_tile=edge_tile,
        row_block=row_block,
        num_row_blocks=num_rb,
        num_rows=m,
        num_cols=num_cols,
        nnz=nnz,
    )


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
    """Degree-bucketed ELL: rows grouped by next-pow2(degree) buckets, each
    bucket a rectangular [rows_b, K_b] padded block (bounded padding even on
    power-law graphs), outputs assembled in bucket order and inverse-
    permuted once. Generalizes EllPlan to irregular degree distributions —
    the row-balance schedule without any segment reduction."""

    cols: tuple           # per bucket: [rows_b, K_b] int32 jax arrays
    masks: tuple          # per bucket: [rows_b, K_b] f32 0/1
    eperms: tuple         # per bucket: [rows_b, K_b] int32 (-1 padding)
    rows: tuple           # per bucket: [rows_b] int32 original row ids
    inv_row: jax.Array    # [M] int32: position of original row in the
                          # bucket-sorted concatenation
    inv: jax.Array        # [nnz] int32 position of edge e in the concat of
                          # the buckets' flattened [rows_b*K_b] slot arrays
    ks: tuple             # static K_b per bucket
    num_rows: int
    num_cols: int
    nnz: int

    def tree_flatten(self):
        return (self.cols, self.masks, self.eperms, self.rows,
                self.inv_row, self.inv), (
            self.ks, self.num_rows, self.num_cols, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def pad_ratio(self) -> float:
        total = sum(c.shape[0] * c.shape[1] for c in self.cols)
        return total / max(self.nnz, 1)


# Bucket K ladder: ~1.4x steps keep padding under ~1.35 (pow2 steps allow
# up to 2x within a bucket).
_K_LADDER = np.array([1, 2, 3, 4, 6, 8, 11, 16, 22, 32, 45, 64, 91, 128,
                      181, 256, 362, 512, 724, 1024, 1448, 2048, 2896,
                      4096, 5793, 8192, 11585, 16384, 23170, 32768,
                      46341, 65536], np.int64)


def build_bucketed_ell_plan(rowptr: np.ndarray, col: np.ndarray,
                            num_cols: int) -> BucketedEllPlan:
    rowptr = np.asarray(jax.device_get(rowptr))
    col = np.asarray(jax.device_get(col))
    m = len(rowptr) - 1
    nnz = len(col)
    deg = np.diff(rowptr).astype(np.int64)
    # bucket = index of the smallest ladder K >= degree; empty rows bucket 0
    kb = np.maximum(deg, 1)
    bucket = np.searchsorted(_K_LADDER, kb, side="left").astype(np.int64)
    order = np.argsort(bucket, kind="stable")  # rows in bucket order
    # inv_row[original_row] = its position in the bucket-sorted concat
    inv_row = np.empty(m, np.int32)
    inv_row[order] = np.arange(m, dtype=np.int32)

    cols_l, masks_l, eperms_l, rows_l, ks = [], [], [], [], []
    inv = np.zeros(nnz, np.int32)
    flat_off = 0
    sorted_bucket = bucket[order]
    boundaries = np.nonzero(np.diff(sorted_bucket))[0] + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [m]])
    for s, t in zip(starts, ends):
        rows = order[s:t]
        k = int(_K_LADDER[int(sorted_bucket[s])])
        rb = len(rows)
        c = np.zeros((rb, k), np.int32)
        msk = np.zeros((rb, k), np.float32)
        ep = np.full((rb, k), -1, np.int32)
        deg_b = deg[rows]
        e_b = int(deg_b.sum())
        if e_b:
            rep_row = np.repeat(np.arange(rb, dtype=np.int64), deg_b)
            csum = np.concatenate([[0], np.cumsum(deg_b)[:-1]])
            rep_pos = np.arange(e_b, dtype=np.int64) - np.repeat(csum, deg_b)
            src = np.repeat(rowptr[rows].astype(np.int64), deg_b) + rep_pos
            c[rep_row, rep_pos] = col[src]
            msk[rep_row, rep_pos] = 1.0
            ep[rep_row, rep_pos] = src.astype(np.int32)
            inv[src] = (flat_off + rep_row * k + rep_pos).astype(np.int32)
        flat_off += rb * k
        cols_l.append(jnp.asarray(c))
        masks_l.append(jnp.asarray(msk))
        eperms_l.append(jnp.asarray(ep))
        rows_l.append(jnp.asarray(rows.astype(np.int32)))
        ks.append(k)
    return BucketedEllPlan(
        cols=tuple(cols_l), masks=tuple(masks_l), eperms=tuple(eperms_l),
        rows=tuple(rows_l), inv_row=jnp.asarray(inv_row),
        inv=jnp.asarray(inv), ks=tuple(ks), num_rows=m,
        num_cols=num_cols, nnz=nnz)


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
    num_tiles: int
    edge_tile: int
    row_block: int
    col_window: int
    num_row_blocks: int
    num_col_windows: int
    num_rows: int
    num_cols: int
    nnz: int

    def tree_flatten(self):
        return (self.lcol, self.lrow, self.eperm, self.tile_rb,
                self.tile_cw), (
            self.num_tiles, self.edge_tile, self.row_block, self.col_window,
            self.num_row_blocks, self.num_col_windows, self.num_rows,
            self.num_cols, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def padded_edges(self) -> int:
        return self.num_tiles * self.edge_tile

    def pad_ratio(self) -> float:
        return self.padded_edges / max(self.nnz, 1)


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
    their output block still zero-initializes."""
    rowptr = np.asarray(jax.device_get(rowptr))
    col = np.asarray(jax.device_get(col))
    m = len(rowptr) - 1
    nnz = len(col)
    num_rb = max(-(-m // row_block), 1)
    num_cw = max(-(-num_cols // col_window), 1)
    coo_row = np.repeat(np.arange(m, dtype=np.int32), np.diff(rowptr))

    lcol_l, lrow_l, perm_l, trb_l, tcw_l = [], [], [], [], []
    for rb in range(num_rb):
        lo = int(rowptr[min(rb * row_block, m)])
        hi = int(rowptr[min((rb + 1) * row_block, m)])
        e = hi - lo
        if e == 0:
            lcol_l.append(np.zeros(edge_tile, np.int32))
            lrow_l.append(np.zeros(edge_tile, np.int32))
            perm_l.append(np.full(edge_tile, -1, np.int32))
            trb_l.append(np.array([rb], np.int32))
            tcw_l.append(np.array([0], np.int32))
            continue
        seg_cols = col[lo:hi]
        order = np.argsort(seg_cols, kind="stable")
        sc = seg_cols[order]
        sr = coo_row[lo:hi][order] - rb * row_block
        sp = (lo + order).astype(np.int32)
        windows = sc // col_window
        # split indices at window boundaries
        bounds = np.nonzero(np.diff(windows))[0] + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [e]])
        for s, t in zip(starts, ends):
            cnt = t - s
            n_tiles = -(-cnt // edge_tile)
            padded = n_tiles * edge_tile
            lc = np.zeros(padded, np.int32)
            lr = np.zeros(padded, np.int32)
            p = np.full(padded, -1, np.int32)
            lc[:cnt] = sc[s:t] - windows[s] * col_window
            lr[:cnt] = sr[s:t]
            p[:cnt] = sp[s:t]
            lcol_l.append(lc)
            lrow_l.append(lr)
            perm_l.append(p)
            trb_l.append(np.full(n_tiles, rb, np.int32))
            tcw_l.append(np.full(n_tiles, windows[s], np.int32))

    return BellPlan(
        lcol=jnp.asarray(np.concatenate(lcol_l)),
        lrow=jnp.asarray(np.concatenate(lrow_l)),
        eperm=jnp.asarray(np.concatenate(perm_l)),
        tile_rb=jnp.asarray(np.concatenate(trb_l)),
        tile_cw=jnp.asarray(np.concatenate(tcw_l)),
        num_tiles=int(sum(len(x) for x in trb_l)),
        edge_tile=edge_tile,
        row_block=row_block,
        col_window=col_window,
        num_row_blocks=num_rb,
        num_col_windows=num_cw,
        num_rows=m,
        num_cols=num_cols,
        nnz=nnz,
    )
