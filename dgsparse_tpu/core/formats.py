"""CSR sparse containers: `Storage` and `SparseTensor`.

Reference parity: dgsparse/storage.py and dgsparse/tensor.py — a thin CSR
wrapper (int32 indices, fp32 values defaulting to "all ones" when
`has_value=False`) that **eagerly caches the CSC view at construction**
(storage.py:100,159-174) so that the SpMM backward (A^T · grad) never has to
re-transpose. We keep that design: the CSC view (colptr, row, csr2csc
permutation) is computed once with an argsort-based transpose
(core/transform.py) instead of cusparseCsr2cscEx2.

Both classes are registered JAX pytrees, so a SparseTensor can be passed
straight through `jax.jit` / `shard_map` / `jax.grad` boundaries. The matrix
shape (M, N), nnz, and `has_value` are static aux data — sparsity *structure*
is compile-time constant; only values/features are traced.
"""

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dgsparse_tpu.core import transform as T

# Pre-expanded packed-weight cache (wp_slot): OFF by default — the
# end-to-end A/B through the public spmm() measured a consistent 1.45x
# LOSS (964 vs 672 us on the p2p headline, docs/BENCHMARKS.md §1c): the
# expanded table is 128/g x wider than the raw weights, so the extra HBM
# read exceeds the jnp.repeat it removes (XLA broadcasts the repeat for
# free inside the gather-consumer fusion). Kept behind DGSPARSE_WP_CACHE=1
# as the checked-in refutation.
_WP_CACHE_BUDGET_BYTES = 256 << 20
_WP_CACHE_ENABLED = os.environ.get("DGSPARSE_WP_CACHE", "0") == "1"


def _wp_to_device(val):
    """Host wp structure (array / tuple-of-arrays, None entries) -> device."""
    if val is None:
        return None
    if isinstance(val, tuple):
        return tuple(None if p is None else jnp.asarray(p) for p in val)
    return jnp.asarray(val)


def _as_i32(x) -> jax.Array:
    """To int32 jax array without any eager device op (host cast if
    concrete; on TPU every eager primitive pays an XLA compile)."""
    if x is None or isinstance(x, jax.core.Tracer):
        if x is not None and x.dtype != jnp.int32:
            x = x.astype(jnp.int32)
        return x
    arr = np.asarray(jax.device_get(x))
    if not np.issubdtype(arr.dtype, np.integer):
        raise TypeError(f"index arrays must be integer, got {arr.dtype}")
    return jnp.asarray(arr.astype(np.int32, copy=False))


@jax.tree_util.register_pytree_node_class
class Storage:
    """CSR arrays + eagerly cached CSC view.

    Children: rowptr, col, values?, colptr, row_csc, csr2csc perm, coo row.
    Aux (static): (num_rows, num_cols, nnz, has_value).
    """

    def __init__(
        self,
        rowptr: Optional[jax.Array] = None,
        col: Optional[jax.Array] = None,
        values: Optional[jax.Array] = None,
        row: Optional[jax.Array] = None,
        sparse_sizes: Optional[Tuple[int, int]] = None,
        build_plans: bool = True,
        _cached: Optional[tuple] = None,
    ):
        if col is None:
            raise ValueError("col is required")
        concrete = not (isinstance(col, jax.core.Tracer)
                        or isinstance(rowptr, jax.core.Tracer)
                        or isinstance(row, jax.core.Tracer))
        col = _as_i32(col)
        nnz = int(col.shape[0])

        if rowptr is None:
            if row is None:
                raise ValueError("either rowptr or row must be given")
            row = _as_i32(row)
            if sparse_sizes is None:
                num_rows = int(np.asarray(jax.device_get(row)).max()) + 1 if nnz else 0
            else:
                num_rows = sparse_sizes[0]
            if concrete:
                # Host-side numpy sort (eager jnp ops pay per-op compiles).
                row_np = np.asarray(jax.device_get(row))
                col_np = np.asarray(jax.device_get(col))
                perm_np = np.argsort(row_np, kind="stable")
                rowptr_np = np.zeros(num_rows + 1, np.int64)
                np.add.at(rowptr_np, row_np + 1, 1)
                rowptr = jnp.asarray(np.cumsum(rowptr_np).astype(np.int32))
                col = jnp.asarray(col_np[perm_np])
                if values is not None:
                    if isinstance(values, jax.core.Tracer):
                        values = values[jnp.asarray(perm_np.astype(np.int32))]
                    else:
                        values = jnp.asarray(
                            np.asarray(jax.device_get(values))[perm_np])
            else:
                rowptr, col, values, _ = T.coo2csr(row, col, values, num_rows)
        else:
            rowptr = _as_i32(rowptr)

        num_rows = int(rowptr.shape[0]) - 1
        if sparse_sizes is not None:
            if sparse_sizes[0] != num_rows:
                raise ValueError(
                    f"sparse_sizes[0]={sparse_sizes[0]} != rowptr rows {num_rows}"
                )
            num_cols = int(sparse_sizes[1])
        else:
            # Reference derives N = col.max()+1 (storage.py:33-41). This is
            # data-dependent, so it only works outside jit; pass sparse_sizes
            # when constructing under a trace.
            num_cols = int(np.asarray(jax.device_get(col)).max()) + 1 if nnz else 0

        if values is not None:
            values = jnp.asarray(values)
            if values.shape[0] != nnz:
                raise ValueError("values/col length mismatch")

        self._rowptr = rowptr
        self._col = col
        self._values = values
        self._num_rows = num_rows
        self._num_cols = num_cols
        self._nnz = nnz

        rowptr_np = col_np = None
        self._tune_key = None
        if concrete:
            rowptr_np = np.asarray(jax.device_get(self._rowptr))
            col_np = np.asarray(jax.device_get(self._col))
            if nnz and int(col_np.max()) >= num_cols:
                raise ValueError(
                    f"col index {int(col_np.max())} out of range "
                    f"[0, {num_cols}) — wrong sparse_sizes?")
            # sampled structure hash: keys the persistent tuner cache
            # (utils/tune.py); consulted by spmm's AUTO at trace time
            import hashlib

            h = hashlib.blake2b(digest_size=12)
            h.update(f"{num_rows},{num_cols},{nnz}".encode())
            for a in (rowptr_np, col_np):
                step = max(len(a) // 65536, 1)
                h.update(np.ascontiguousarray(a[::step]).tobytes())
            self._tune_key = h.hexdigest()

        if _cached is not None:
            (self._colptr, self._row_csc, self._csr2csc, self._coo_row,
             self._csc_col) = _cached
        elif concrete:
            # Eager CSC cache, mirroring reference storage.py:100 — computed
            # host-side (numpy / native C++), never as eager device ops.
            colptr, row_csc, perm = T.csr2csc_np(rowptr_np, col_np, num_cols)
            self._colptr = jnp.asarray(colptr)
            self._row_csc = jnp.asarray(row_csc)
            self._csr2csc = jnp.asarray(perm)
            self._coo_row = jnp.asarray(T.expand_rowptr_np(rowptr_np))
            # per-edge col ids in CSC order: the backward's segment ids.
            # Precomputed because the jittable expand_rowptr (searchsorted)
            # costs ~17 binary-search element-gather passes per backward on
            # TPU (~12 ms at p2p scale) when traced inline.
            self._csc_col = jnp.asarray(T.expand_rowptr_np(colptr))
        else:
            colptr, row_csc, _, perm = T.csr2csc(rowptr, col, None, num_cols)
            self._colptr = colptr
            self._row_csc = row_csc
            self._csr2csc = perm
            self._coo_row = T.expand_rowptr(rowptr, nnz)
            self._csc_col = T.expand_rowptr(colptr, nnz)

        # Eager edge-tile plans (forward + transpose) for the Pallas kernels,
        # the same construction-time amortization as the CSC cache. Skipped
        # when built from tracers (structure unknown at trace time) — the
        # XLA fallback kernels are used then.
        self._plan_fwd = None
        self._plan_bwd = None
        self._bell_fwd = None
        self._bell_bwd = None
        self._ell_fwd = None
        self._ell_chunked = None
        # build_plans=False skips all Pallas plan construction: ops run on
        # the XLA segment paths with only CSR+CSC resident (~half the device
        # memory per edge — the Reddit-scale lever; plans cost ~21 B/edge).
        # build_plans="ell" keeps only the ELL/bucketed/hybrid forward plan
        # (~9 B/edge): the scale path for 100M-edge graphs where the ESC
        # plans (fwd+bwd, ~24 B/edge) would crowd out HBM.
        # build_plans="esc" keeps only the ESC edge-tile plans (fwd+bwd,
        # ~24 B/edge, ~60 % of full plan memory): the middle tier for
        # graphs that train (need the transpose plan for backward) but
        # can't afford the ELL/hybrid/BELL family on top.
        if build_plans and concrete and nnz > 0:
            from dgsparse_tpu.core.planner import (build_bell_plan,
                                                   build_edge_tile_plan,
                                                   build_ell_plan)

            ell_only = build_plans == "ell"
            esc_only = build_plans == "esc"
            colptr_np = np.asarray(jax.device_get(self._colptr))
            row_csc_np = np.asarray(jax.device_get(self._row_csc))
            # ELL row-balance / hybrid plans FIRST (they decide whether the
            # ESC/BELL plans are worth building at all): single-K for
            # degree-regular structures, degree-bucketed otherwise, 3-tier
            # hybrid for clustered structure.
            from dgsparse_tpu.core.planner import HybridPlan as _HP

            if nnz >= 4096 and not esc_only:
                from dgsparse_tpu.core.planner import (
                    build_bucketed_ell_plan, build_hybrid_plan)

                deg_np = np.diff(rowptr_np)
                max_deg = int(deg_np.max()) if len(deg_np) else 0
                # Try the hybrid split FIRST on dense-enough graphs:
                # community-clustered structures are usually also
                # degree-regular, so a regular-ELL-first order captured
                # reddit-like graphs before the hybrid was ever tried —
                # AUTO never reached the MXU dense-cell tier (4.1x at
                # 115M edges, BENCHMARKS.md §2). build_hybrid_plan
                # rejects cheaply (one O(nnz) native counting pass) when
                # < 25 % of edges live in filled cells.
                if nnz / max(num_rows, 1) >= 16:
                    hyb = build_hybrid_plan(rowptr_np, col_np, num_cols)
                    if hyb is not None and hyb.dense_fraction >= 0.3:
                        self._ell_fwd = hyb
                if self._ell_fwd is None and max_deg \
                        and max_deg * num_rows / nnz <= 1.5:
                    self._ell_fwd = build_ell_plan(rowptr_np, col_np,
                                                   num_cols)
                    self._ell_fwd._sub_csr_host = (rowptr_np, col_np,
                                                   None)
                if self._ell_fwd is None:
                    bek = build_bucketed_ell_plan(rowptr_np, col_np,
                                                  num_cols)
                    # flat plan layout: many buckets are cheap (3
                    # device arrays regardless of bucket count)
                    if bek.pad_ratio() <= 2.0 and len(bek.ks) <= 64:
                        bek._sub_csr_host = (rowptr_np, col_np, None)
                        self._ell_fwd = bek
            # sort_cols=False keeps plan slots in CSR (row-major) order so
            # one plan serves sum/mean (order-independent one-hot) AND
            # max/min (segmented scan needs contiguous row segments);
            # measured: XLA row-gather cost is index-order-agnostic.
            # Skipped for 16M+-edge hybrid graphs: the fwd+bwd ESC plans
            # cost ~24 B/edge of HBM and every hybrid path (forward,
            # transpose backward, SDDMM) has its own plan; explicit
            # PALLAS_EDGE_TILE requests fall back to XLA then.
            esc_redundant = (isinstance(self._ell_fwd, _HP)
                             and nnz >= (1 << 24))
            if not ell_only and not esc_redundant:
                self._plan_fwd = build_edge_tile_plan(
                    rowptr_np, col_np, num_cols, sort_cols=False)
                self._plan_bwd = build_edge_tile_plan(
                    colptr_np, row_csc_np, num_rows, sort_cols=False)
            # BELL 2D plans only pay off when cells genuinely fill (measured:
            # at pad 2.4 the ESC take-path still wins on v5e); gate hard.
            # A hybrid plan supersedes the full-graph BELL on both the
            # forward (AUTO prefers it) and the backward (transpose-hybrid
            # path), so skip the two full-graph lexsorts then. Also capped
            # at 8M edges: the two lexsorts cost ~45 s each at 30M edges
            # BEFORE the pad gate can reject, and above the cap the hybrid
            # was already tried (avg deg >= 32 implies >= 16) — if ITS
            # cell classification rejected, cells don't fill and the pad
            # gate here would reject too, after minutes of wasted sorting.
            if 4096 <= nnz <= (1 << 23) and nnz / max(num_rows, 1) >= 32 \
                    and not ell_only and not esc_only \
                    and not isinstance(self._ell_fwd, _HP):
                bell = build_bell_plan(rowptr_np, col_np, num_cols)
                if bell.pad_ratio() <= 1.5:
                    self._bell_fwd = bell
                bell_t = build_bell_plan(colptr_np, row_csc_np, num_rows)
                if bell_t.pad_ratio() <= 1.5:
                    self._bell_bwd = bell_t
        # Composed bwd-ESC-slot -> fwd-ELL-slot permutation for the MAX/MIN
        # backward's d_dense: lets it feed winner contributions straight
        # into the one-hot MXU segment matmul over the transpose plan
        # instead of a CSC gather + XLA segment_sum (measured 57.8 vs
        # 71.6 ms on arxiv-scale F=64, benchmark/probe_maxmin_bwd.py).
        self._mm_comp = None
        from dgsparse_tpu.core.planner import BucketedEllPlan as _BEP
        from dgsparse_tpu.core.planner import EllPlan as _EP

        self._mm_bwd = None
        if isinstance(self._ell_fwd, (_EP, _BEP)) \
                and self._plan_bwd is not None:
            inv_h = self._host_perm("_ell_inv", self._ell_fwd.inv)
            ep_h = self._host_perm("_bwd_eperm", self._plan_bwd.eperm)
            perm_h = self._host_perm("_csr2csc", self._csr2csc)
            csr_edge_of_slot = perm_h[np.maximum(ep_h, 0)]
            comp = inv_h[csr_edge_of_slot]
            self._mm_comp = jnp.asarray(comp.astype(np.int32))
            # Decompose the composed fwd-slot ids into (bucket-concat row,
            # K index) + the CSR-edge -> bwd-slot positions, so the MAX/MIN
            # backward can run entirely in bwd-slot space (no [slots, F]
            # repeat expansions, no extra permutation row-gather — see
            # ops/spmm.py _spmm_bwd). Structural gate: skip at huge slot
            # counts (the ELL max/min path itself is size-gated away there).
            if len(comp) * 4 <= (256 << 20):
                if isinstance(self._ell_fwd, _BEP):
                    rbs, ks = self._ell_fwd.rbs, self._ell_fwd.ks
                else:
                    rbs, ks = ((self._ell_fwd.num_rows,),
                               (self._ell_fwd.k,))
                # fwd flat slot -> (bucket-concat row, k) without
                # materializing [total_slots] tables when avoidable: do it
                # per bucket with searchsorted on the slot offsets
                offs = np.cumsum([0] + [rb * k for rb, k in zip(rbs, ks)])
                roffs = np.cumsum([0] + list(rbs))
                b_of = np.searchsorted(offs, comp, side="right") - 1
                b_of = np.clip(b_of, 0, len(rbs) - 1)
                ks_arr = np.asarray(ks, np.int64)[b_of]
                local = comp - offs[b_of]
                safe_k = np.maximum(ks_arr, 1)
                rows_b = roffs[b_of] + local // safe_k
                k_b = local % safe_k
                valid = ep_h >= 0
                epos = np.zeros(self._col.shape[0], np.int64)
                slot_ids = np.arange(len(ep_h), dtype=np.int64)
                epos[csr_edge_of_slot[valid]] = slot_ids[valid]
                self._mm_bwd = {
                    "rows": jnp.asarray(rows_b.astype(np.int32)),
                    "kidx": jnp.asarray(k_b.astype(np.int32)),
                    "epos": jnp.asarray(epos.astype(np.int32)),
                }
        # slot-API transpose gather map (ops/slot._ell_t_gather_map):
        # composed from _eperm_host, which is a HOST attribute that does
        # not survive pytree flatten/unflatten — so build it eagerly here
        # and carry it as a pytree child, or jitted slot chains crash on
        # the reconstructed plan (AttributeError observed at reddit scale).
        self._slot_gmap = None
        from dgsparse_tpu.core.planner import HybridPlan as _HP

        if isinstance(self._ell_fwd, _HP) \
                and self._ell_fwd.ell_t is not None:
            hp = self._ell_fwd
            ep_t = getattr(hp.ell_t, "_eperm_host", None)
            if ep_t is not None:
                src = getattr(hp, "_edge_src_host", None)
                if src is None:
                    src = self._host_perm("_hybrid_edge_src", hp.edge_src)
                cell_slots = (hp.cells.cell_slots
                              if hp.cells is not None else 0)
                pos = src[np.maximum(ep_t, 0)] - cell_slots
                valid = ep_t >= 0
                self._slot_gmap = (
                    jnp.asarray(np.where(valid, pos, 0).astype(np.int32)),
                    jnp.asarray(valid),
                )
        # Column-chunked gather variant (see planner.ColChunkedEllPlan):
        # built EAGERLY (with an F=64/fp32 table-size guess) so it is a
        # pytree CHILD — jitted training steps that take the SparseTensor
        # as an ARGUMENT reconstruct the Storage via tree_unflatten, where
        # host-side attributes (and thus lazy building) are gone.
        self._maybe_build_chunked()
        self._vslot = self._build_vslot(values)

    # table-size guess for the eager chunked build: F=64 fp32 rows
    _CHUNK_F_GUESS_BYTES = 256
    _CHUNK_SLICE_TARGET = 4 << 20    # fast-regime slice size (measured)
    _CHUNK_TABLE_MIN = 24 << 20      # below this the flat gather is fast
    _CHUNK_MIN_EDGES = 1 << 20

    @staticmethod
    def _chunk_count(table_rows: int, row_bytes: int, nnz_part: int,
                     forced: "int | None",
                     out_rows: "int | None" = None) -> "int | None":
        """nchunks for a gather table of table_rows x row_bytes, or None
        when chunking isn't worth it. Three measured gates:
        small tables gather fast flat (probe_gather_tablesize: the
        >16 MB cliff); few edges can't amortize anything; and the
        per-chunk [out_rows, F] partial accumulation costs ~row_bytes *
        out_rows at ~150 GB/s effective per chunk (probe_chunked, arxiv:
        +275 us/chunk) while the gather saving is at most ~8 ns/edge —
        power-law locality often makes the flat gather faster than the
        uniform-random cliff, so require edges >= nchunks * out_rows
        (saving >= ~2x worst-case partial cost at F=64)."""
        if forced is not None:
            return forced if forced > 1 else None
        table = table_rows * row_bytes
        if table <= Storage._CHUNK_TABLE_MIN \
                or nnz_part < Storage._CHUNK_MIN_EDGES:
            return None
        n = -(-table // Storage._CHUNK_SLICE_TARGET)
        p = 1
        while p < n:
            p *= 2
        p = max(2, min(p, 64))
        if out_rows is not None and nnz_part < p * out_rows:
            return None
        return p

    def _maybe_build_chunked(self, row_bytes: "int | None" = None) -> None:
        """Build (or rebuild at a different granularity) the column-
        chunked variant of the ELL/hybrid-residue plan. Requires the
        host-side sub-CSR twins stashed at plan construction — silently a
        no-op when they are absent (e.g. inside tree_unflatten'd copies)."""
        import dataclasses as _dc

        env = os.environ.get("DGSPARSE_CHUNKED_GATHER", "")
        if env == "0":
            self._ell_chunked = None
            return
        forced = int(env) if env not in ("", "auto") else None
        if row_bytes is None:
            row_bytes = self._CHUNK_F_GUESS_BYTES
        ell = self._ell_fwd
        if ell is None:
            return
        from dgsparse_tpu.core.planner import (BucketedEllPlan, EllPlan,
                                               HybridPlan,
                                               build_col_chunked_ell_plan)

        if isinstance(ell, HybridPlan):
            host = getattr(ell.ell, "_sub_csr_host", None)
            if host is None:
                return
            n1 = self._chunk_count(self._num_cols, row_bytes, ell.ell.nnz,
                                   forced, out_rows=self._num_rows)
            if n1 is None:
                return
            cur = self._ell_chunked
            # within-2x granularity is close enough — don't thrash plans
            if cur is not None and n1 // 2 <= cur.ell.nchunks <= n1 * 2:
                return
            rp, cc, ids = host
            ce = build_col_chunked_ell_plan(rp, cc, self._num_cols, n1,
                                            gids=ids)
            if ce.pad_ratio() > max(2.5, 1.6 * ell.ell.pad_ratio()):
                return
            ct = None
            hostt = (getattr(ell.ell_t, "_sub_csr_host", None)
                     if ell.ell_t is not None else None)
            if hostt is not None:
                n2 = self._chunk_count(self._num_rows, row_bytes,
                                       ell.ell_t.nnz, forced,
                                       out_rows=self._num_cols)
                if n2 is not None:
                    rp_t, cc_t, ids_t = hostt
                    c2 = build_col_chunked_ell_plan(
                        rp_t, cc_t, self._num_rows, n2, gids=ids_t)
                    if c2.pad_ratio() <= max(2.5,
                                             1.6 * ell.ell_t.pad_ratio()):
                        ct = c2
            self._ell_chunked = _dc.replace(
                ell, ell=ce, ell_t=(ct if ct is not None else ell.ell_t))
            self._refresh_vslot_after_chunk_rebuild()
        elif isinstance(ell, (BucketedEllPlan, EllPlan)):
            host = getattr(ell, "_sub_csr_host", None)
            if host is None:
                return
            n1 = self._chunk_count(self._num_cols, row_bytes, ell.nnz,
                                   forced, out_rows=self._num_rows)
            if n1 is None:
                return
            cur = self._ell_chunked
            if cur is not None and n1 // 2 <= cur.nchunks <= n1 * 2:
                return
            rp, cc, ids = host
            ce = build_col_chunked_ell_plan(rp, cc, self._num_cols, n1,
                                            gids=ids)
            base_pad = ell.pad_ratio() if isinstance(ell, BucketedEllPlan) \
                else 1.0
            if ce.pad_ratio() > max(2.5, 1.6 * base_pad):
                return
            self._ell_chunked = ce
            self._refresh_vslot_after_chunk_rebuild()

    def _refresh_vslot_after_chunk_rebuild(self) -> None:
        """A chunked-plan rebuild (granularity change) invalidates the
        chunked slot-value caches — rebuild the whole vslot dict. No-op
        during __init__ (vslot not built yet) or for traced values."""
        if getattr(self, "_vslot", None) is not None:
            self._vslot = self._build_vslot(self._values)

    def ell_chunked(self, f: "int | None" = None,
                    itemsize: "int | None" = None):
        """The column-chunked ELL/hybrid variant for a gather table of
        [num_cols, f] x itemsize, or None. Rebuilds at a better
        granularity when the host twins are available and the built
        nchunks is >2x off; inside jit (host data gone) returns whatever
        was built eagerly, provided its slices still dodge the slow-gather
        regime for this table."""
        cp = self._ell_chunked
        if f is not None and itemsize is not None:
            rb = f * itemsize
            # cheap no-op when the host sub-CSR twins are gone (jit copies)
            self._maybe_build_chunked(row_bytes=rb)
            cp = self._ell_chunked
            if cp is not None:
                from dgsparse_tpu.core.planner import HybridPlan

                ce = cp.ell if isinstance(cp, HybridPlan) else cp
                if ce.chunk_size * rb > (16 << 20):
                    return None       # slices land in the slow regime
        return cp

    def slot_gmap(self):
        """(gather_map, valid) for the slot-API transpose ELL (None when
        the storage has no hybrid ell_t plan)."""
        return getattr(self, "_slot_gmap", None)

    def mm_comp(self):
        """bwd-plan slot -> fwd ELL flat slot (None when unavailable)."""
        return getattr(self, "_mm_comp", None)

    def mm_bwd(self):
        """bwd-slot-space index set for the ELL MAX/MIN backward
        ({rows, kidx, epos} dict or None; see __init__)."""
        return getattr(self, "_mm_bwd", None)

    def ones_vslot(self):
        """Memoized ones-value vslot (the has_value=False cache) for
        VALUED hybrid storages: gspmm ADD/SUB decompose into an
        UNWEIGHTED SpMM whose dense-cell tier would otherwise
        re-materialize its [ncells,R,C] blocks on every call."""
        v = getattr(self, "_ones_vslot", None)
        if v is None:
            v = self._build_vslot(None)
            self._ones_vslot = v if v is not None else False
        return v or None

    def wp_slot(self, f_eff: int, dtype):
        """Memoized pre-expanded packed K-sum weights for the ELL forward
        plan at effective feature width f_eff (a divisor of 128, <= 32).

        kernels.pallas_spmm._gather_ksum_packed folds g = 128/f K-slots
        into full 128-lane rows; this caches the weight expansion
        (jnp.repeat over f lanes) at plan time. REFUTED end-to-end and
        default-OFF: the isolated probe showed 478 -> 345 us with the
        expansion passed as an input, but through the public spmm() it
        is a consistent 1.45x loss (964 vs 672 us) — the expanded table
        adds more HBM traffic than the repeat it removes (see
        docs/BENCHMARKS.md §1c, 2026-08-19).

        Returns per-plan-shape structure (EllPlan -> one array,
        BucketedEllPlan / HybridPlan residue -> tuple per bucket) or None
        when no concrete slot values exist, f doesn't pack, or the
        expansion exceeds the cache budget."""
        from dgsparse_tpu.core.planner import (BucketedEllPlan, EllPlan,
                                               HybridPlan)
        from dgsparse_tpu.kernels.pallas_spmm import _round_up, build_wp_np

        if not _WP_CACHE_ENABLED or f_eff >= 128 or 128 % f_eff != 0:
            return None
        vslot = self._vslot
        if vslot is None:
            return None
        ell_w = vslot.get("ell")
        plan = getattr(self, "_ell_fwd", None)
        if isinstance(plan, HybridPlan):
            plan = plan.ell
            ell_w = ell_w.get("ell") if isinstance(ell_w, dict) else None
        if ell_w is None or isinstance(ell_w, (dict, tuple)) or \
                isinstance(ell_w, jax.core.Tracer):
            return None
        key = (int(f_eff), np.dtype(dtype).name)
        cache = getattr(self, "_wp_cache", None)
        if cache is None:
            cache = {}
            self._wp_cache = cache
        ent = cache.get(key)
        if ent is not None:
            return ent[0]
        g = 128 // f_eff
        if isinstance(plan, BucketedEllPlan):
            shapes = list(zip(plan.rbs, plan.ks))
        elif isinstance(plan, EllPlan):
            shapes = [plan.cols.shape]
        else:
            return None
        total = sum(rb * (_round_up(k, g) // g) * 128
                    for rb, k in shapes if k)
        if total * np.dtype(dtype).itemsize > _WP_CACHE_BUDGET_BYTES:
            cache[key] = (None, True)
            return None
        w_np = np.asarray(jax.device_get(ell_w)).astype(np.dtype(dtype))
        parts, off = [], 0
        for rb, k in shapes:
            if k == 0:
                parts.append(None)
                continue
            parts.append(build_wp_np(w_np[off:off + rb * k], rb, k, f_eff))
            off += rb * k
        out = parts[0] if isinstance(plan, EllPlan) else tuple(parts)
        # Device-backed arrays, even when called under an enclosing jit
        # trace: plain jnp.asarray here would leak tracers (every
        # primitive bind is staged under JAX's dynamic trace), so the
        # upload runs inside ensure_compile_time_eval — the result is a
        # committed Array the trace captures as a constant operand rather
        # than re-embedding a 20 MB numpy literal per compile.
        with jax.ensure_compile_time_eval():
            out = _wp_to_device(out)
        cache[key] = (out, True)
        return out

    def _host_perm(self, name: str, arr) -> np.ndarray:
        """Memoized host copy of a static per-structure permutation."""
        cache = getattr(self, "_host_perm_cache", None)
        if cache is None:
            cache = {}
            self._host_perm_cache = cache
        h = cache.get(name)
        if h is None:
            h = np.asarray(jax.device_get(arr))
            cache[name] = h
        return h

    def _build_vslot(self, values):
        """Plan-slot-ordered value caches (padding -> 0), one per plan.

        A 1-D value gather values[eperm] costs ~1.3-1.6 ns/element on v5e —
        ~200 us of the p2p SpMM time, paid EVERY call though the
        permutation is static per structure. Precomputing it here is the
        same construction-time amortization as the reference's eager CSC
        value cache (dgsparse/storage.py:100,159-174). Returns None when
        values are absent/traced (ops fall back to in-graph gathers);
        gradients stay exact either way because the custom VJPs compute
        d_values explicitly (ops/spmm.py)."""
        if isinstance(values, jax.core.Tracer):
            return None
        if getattr(self, "_plan_fwd", None) is None and \
                getattr(self, "_ell_fwd", None) is None:
            return None
        if values is None:
            # ones-default values: the only per-call cost worth caching is
            # the hybrid dense-cell materialization (a 1-D segment-sum over
            # every dense-tier edge); everything else is a cheap mask.
            from dgsparse_tpu.core.planner import (HybridPlan,
                                                   materialize_cells_np)

            hp = getattr(self, "_ell_fwd", None)
            if isinstance(hp, HybridPlan) and hp.cells is not None:
                cells_np = materialize_cells_np(hp.cells, None)
                # bf16 twin: bf16-mode passes read half the bytes and skip
                # the per-call in-graph cast (XLA materializes a bf16 copy
                # of the full cell array before every pallas_call otherwise)
                return {"ell": {"bell": None, "ell": None,
                                "cells": jnp.asarray(cells_np),
                                "cells_bf16": jnp.asarray(
                                    cells_np).astype(jnp.bfloat16)},
                        "esc": None, "esc_t": None, "bell": None,
                        "bell_t": None, "csc": None}
            return None
        vals_np = np.asarray(jax.device_get(values))
        perm_np = self._host_perm("_csr2csc", self._csr2csc)
        vals_csc = vals_np[perm_np]

        def slotw(plan_obj, v):
            # eperm is static per structure — fetch it from device once and
            # memoize the host copy on the plan, so repeated set_values()
            # calls (eager value-update pipelines) pay only the slot-array
            # re-upload, not a device round-trip per plan.
            ep = getattr(plan_obj, "_eperm_host", None)
            if ep is None:
                ep = np.asarray(jax.device_get(plan_obj.eperm)).reshape(-1)
                try:
                    plan_obj._eperm_host = ep
                except Exception:
                    pass
            return jnp.asarray(
                np.where(ep >= 0, v[np.maximum(ep, 0)], 0).astype(v.dtype))

        ell_w = None
        ell_cw = None
        if self._ell_fwd is not None:
            from dgsparse_tpu.core.planner import (ColChunkedEllPlan,
                                                   HybridPlan,
                                                   materialize_cells_np)

            def chunked_slotw(cplan, v):
                return tuple(slotw(s, v) for s in cplan.subs)

            if isinstance(self._ell_fwd, HybridPlan):
                hp = self._ell_fwd
                cells_dev = (jnp.asarray(
                    materialize_cells_np(hp.cells, vals_np))
                    if hp.cells is not None else None)
                ell_w = {
                    "bell": (slotw(hp.bell, vals_np)
                             if hp.bell is not None else None),
                    "ell": slotw(hp.ell, vals_np),
                    "cells": cells_dev,
                    # bf16 twin: bf16-mode passes read half the bytes and
                    # skip the per-call in-graph cast
                    "cells_bf16": (cells_dev.astype(jnp.bfloat16)
                                   if cells_dev is not None else None),
                    "ell_t": (slotw(hp.ell_t, vals_np)
                              if hp.ell_t is not None else None),
                }
                cp = getattr(self, "_ell_chunked", None)
                if cp is not None:
                    if isinstance(cp.ell, ColChunkedEllPlan):
                        ell_w["ell_c"] = chunked_slotw(cp.ell, vals_np)
                    if isinstance(cp.ell_t, ColChunkedEllPlan):
                        ell_w["ell_t_c"] = chunked_slotw(cp.ell_t, vals_np)
            else:
                ell_w = slotw(self._ell_fwd, vals_np)
                cp = getattr(self, "_ell_chunked", None)
                if isinstance(cp, ColChunkedEllPlan):
                    ell_cw = chunked_slotw(cp, vals_np)
        return {
            "ell": ell_w,
            "ell_c": ell_cw,
            "esc": (slotw(self._plan_fwd, vals_np)
                    if self._plan_fwd is not None else None),
            "esc_t": (slotw(self._plan_bwd, vals_csc)
                      if self._plan_bwd is not None else None),
            "bell": (slotw(self._bell_fwd, vals_np)
                     if self._bell_fwd is not None else None),
            "bell_t": (slotw(self._bell_bwd, vals_csc)
                       if self._bell_bwd is not None else None),
            "csc": jnp.asarray(vals_csc),
        }

    # --- reference-parity accessors (dgsparse/storage.py) ---
    def rowptr(self) -> jax.Array:
        return self._rowptr

    def col(self) -> jax.Array:
        return self._col

    def values(self) -> Optional[jax.Array]:
        return self._values

    def colptr(self) -> jax.Array:
        return self._colptr

    def row(self) -> jax.Array:
        """CSC row indices (paired with colptr), as used by the backward."""
        return self._row_csc

    def csr2csc(self) -> jax.Array:
        """Permutation p with values_csc = values[p]."""
        return self._csr2csc

    # --- extras ---
    def coo_row(self) -> jax.Array:
        """Per-edge row ids in CSR order."""
        return self._coo_row

    def csc_col(self) -> jax.Array:
        """Per-edge col ids in CSC order (segment ids of the transpose)."""
        return self._csc_col

    def degrees(self) -> jax.Array:
        return T.row_degrees(self._rowptr)

    @property
    def num_rows(self) -> int:
        return self._num_rows

    @property
    def num_cols(self) -> int:
        return self._num_cols

    @property
    def nnz(self) -> int:
        return self._nnz

    def sparse_sizes(self) -> Tuple[int, int]:
        return (self._num_rows, self._num_cols)

    def plan(self, transpose: bool = False):
        """Edge-tile plan for the Pallas kernels (None if built under jit)."""
        return self._plan_bwd if transpose else self._plan_fwd

    def ell_plan(self):
        """Row-balance ELL plan (None unless degree-regular)."""
        return self._ell_fwd

    def vslot(self):
        """Plan-slot-ordered value caches (dict or None; see _build_vslot).
        Only valid for the values array the Storage was built with — ops
        check identity before using it."""
        return self._vslot

    def bell_plan(self, transpose: bool = False):
        """Blocked-ELL 2D plan (None unless the structure is dense enough)."""
        return self._bell_bwd if transpose else self._bell_fwd

    # --- pytree protocol ---
    def tree_flatten(self):
        children = (
            self._rowptr,
            self._col,
            self._values,
            self._colptr,
            self._row_csc,
            self._csr2csc,
            self._coo_row,
            self._csc_col,
            self._plan_fwd,
            self._plan_bwd,
            self._bell_fwd,
            self._bell_bwd,
            self._ell_fwd,
            self._ell_chunked,
            self._vslot,
            self._mm_comp,
            self._mm_bwd,
            self._slot_gmap,
        )
        aux = (self._num_rows, self._num_cols, self._nnz, self._tune_key)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (
            obj._rowptr,
            obj._col,
            obj._values,
            obj._colptr,
            obj._row_csc,
            obj._csr2csc,
            obj._coo_row,
            obj._csc_col,
            obj._plan_fwd,
            obj._plan_bwd,
            obj._bell_fwd,
            obj._bell_bwd,
            obj._ell_fwd,
            obj._ell_chunked,
            obj._vslot,
            obj._mm_comp,
            obj._mm_bwd,
            obj._slot_gmap,
        ) = children
        obj._num_rows, obj._num_cols, obj._nnz, obj._tune_key = aux
        return obj


@jax.tree_util.register_pytree_node_class
class SparseTensor:
    """CSR sparse matrix handle (reference: dgsparse/tensor.py:7-42)."""

    def __init__(
        self,
        row: Optional[jax.Array] = None,
        rowptr: Optional[jax.Array] = None,
        col: Optional[jax.Array] = None,
        values: Optional[jax.Array] = None,
        has_value: bool = False,
        sparse_sizes: Optional[Tuple[int, int]] = None,
        build_plans: bool = True,
    ):
        self.storage = Storage(
            rowptr=rowptr,
            col=col,
            values=values if has_value else values,
            row=row,
            sparse_sizes=sparse_sizes,
            build_plans=build_plans,
        )
        self.has_value = bool(has_value)

    # --- constructors ---
    @classmethod
    def from_csr(
        cls,
        rowptr,
        col,
        values=None,
        sparse_sizes: Optional[Tuple[int, int]] = None,
        build_plans: bool = True,
    ) -> "SparseTensor":
        """build_plans: True = full plan family; "ell" = ELL/hybrid forward
        plan only (~9 B/edge, the 100M-edge scale mode); "esc" = ESC
        edge-tile fwd+bwd plans only (~60 % of full plan memory, keeps the
        training backward); False = no plans (XLA paths, ~half the
        per-edge device memory — for billion-edge graphs)."""
        return cls(
            rowptr=rowptr,
            col=col,
            values=values,
            has_value=values is not None,
            sparse_sizes=sparse_sizes,
            build_plans=build_plans,
        )

    @classmethod
    def from_edge_index(
        cls,
        edge_index,
        edge_attr=None,
        sparse_sizes: Optional[Tuple[int, int]] = None,
    ) -> "SparseTensor":
        """Build from a [2, nnz] edge_index (row 0 = dst/row, row 1 = src/col)."""
        edge_index = jnp.asarray(edge_index)
        return cls(
            row=edge_index[0],
            col=edge_index[1],
            values=edge_attr,
            has_value=edge_attr is not None,
            sparse_sizes=sparse_sizes,
        )

    @classmethod
    def from_scipy(cls, mat) -> "SparseTensor":
        csr = mat.tocsr()
        csr.sort_indices()
        return cls.from_csr(
            jnp.asarray(csr.indptr, jnp.int32),
            jnp.asarray(csr.indices, jnp.int32),
            jnp.asarray(csr.data, jnp.float32),
            sparse_sizes=(int(csr.shape[0]), int(csr.shape[1])),
        )

    @classmethod
    def from_dense(cls, mat) -> "SparseTensor":
        mat = np.asarray(jax.device_get(mat))
        row, col = np.nonzero(mat)
        order = np.lexsort((col, row))
        row, col = row[order], col[order]
        rowptr = np.zeros(mat.shape[0] + 1, np.int32)
        np.add.at(rowptr, row + 1, 1)
        rowptr = np.cumsum(rowptr).astype(np.int32)
        return cls.from_csr(
            jnp.asarray(rowptr),
            jnp.asarray(col, jnp.int32),
            jnp.asarray(mat[row, col], jnp.float32),
            sparse_sizes=(int(mat.shape[0]), int(mat.shape[1])),
        )

    # --- views ---
    def to_dense(self) -> jax.Array:
        m, n = self.sparse_sizes()
        vals = self.values_or_ones()
        out = jnp.zeros((m, n), vals.dtype)
        return out.at[self.storage.coo_row(), self.storage.col()].add(vals)

    def values_or_ones(self) -> jax.Array:
        """Explicit values, or implicit all-ones (reference
        __guard_load_default_one, include/cuda/cuda_util.cuh:139-146)."""
        v = self.storage.values()
        if self.has_value and v is not None:
            return v
        return jnp.ones((self.nnz,), jnp.float32)

    def set_values(self, values: Optional[jax.Array]) -> "SparseTensor":
        """Return a new SparseTensor sharing structure with new values."""
        obj = SparseTensor.__new__(SparseTensor)
        st = Storage.__new__(Storage)
        src = self.storage
        st._rowptr, st._col = src._rowptr, src._col
        st._values = values
        st._colptr, st._row_csc = src._colptr, src._row_csc
        st._csr2csc, st._coo_row = src._csr2csc, src._coo_row
        st._csc_col = src._csc_col
        st._plan_fwd, st._plan_bwd = src._plan_fwd, src._plan_bwd
        st._bell_fwd, st._bell_bwd = src._bell_fwd, src._bell_bwd
        st._ell_fwd = src._ell_fwd
        st._ell_chunked = src._ell_chunked
        st._mm_comp = src.mm_comp()
        st._mm_bwd = src.mm_bwd()
        st._slot_gmap = src.slot_gmap()
        st._tune_key = src._tune_key
        st._num_rows, st._num_cols, st._nnz = (
            src._num_rows,
            src._num_cols,
            src._nnz,
        )
        # re-derive the slot caches for the NEW values (host-side when
        # concrete; None under a trace -> ops fall back to in-graph gathers)
        st._vslot = st._build_vslot(values)
        obj.storage = st
        obj.has_value = values is not None
        return obj

    def t(self) -> "SparseTensor":
        """Transpose, reusing the cached CSC view (no re-sort)."""
        src = self.storage
        vals = None
        if self.has_value and src._values is not None:
            vals = src._values[src._csr2csc]
        obj = SparseTensor.__new__(SparseTensor)
        st = Storage.__new__(Storage)
        st._rowptr, st._col = src._colptr, src._row_csc
        st._values = vals
        # CSC of the transpose is the original CSR; the inverse permutation
        # maps transposed-order values back to original order.
        if isinstance(src._csr2csc, jax.core.Tracer):
            inv = jnp.zeros_like(src._csr2csc).at[src._csr2csc].set(
                jnp.arange(src._nnz, dtype=jnp.int32))
        else:
            perm_np = np.asarray(jax.device_get(src._csr2csc))
            inv_np = np.empty_like(perm_np)
            inv_np[perm_np] = np.arange(src._nnz, dtype=np.int32)
            inv = jnp.asarray(inv_np)
        st._colptr, st._row_csc = src._rowptr, src._col
        st._csr2csc = inv
        # the transpose's edge-order arrays are the original's CSC twins
        st._coo_row = src._csc_col
        st._csc_col = src._coo_row
        st._plan_fwd, st._plan_bwd = src._plan_bwd, src._plan_fwd
        st._bell_fwd, st._bell_bwd = src._bell_bwd, src._bell_fwd
        st._ell_fwd = None
        st._mm_comp = None  # fwd ELL plan not carried over
        st._mm_bwd = None
        st._slot_gmap = None
        st._vslot = st._build_vslot(vals)
        st._tune_key = None  # transposed structure: tuned entries don't map
        st._num_rows, st._num_cols = src._num_cols, src._num_rows
        st._nnz = src._nnz
        obj.storage = st
        obj.has_value = self.has_value
        return obj

    # --- shape ---
    def sparse_sizes(self) -> Tuple[int, int]:
        return self.storage.sparse_sizes()

    @property
    def shape(self) -> Tuple[int, int]:
        return self.storage.sparse_sizes()

    @property
    def nnz(self) -> int:
        return self.storage.nnz

    def __repr__(self) -> str:
        m, n = self.sparse_sizes()
        return (
            f"SparseTensor(shape=({m}, {n}), nnz={self.nnz}, "
            f"has_value={self.has_value})"
        )

    def validate(self) -> "SparseTensor":
        """Check CSR invariants (the dtype/bounds asserts the reference
        scatters through its C++ layer, e.g. src/cuda/spmm_cuda.cu:387-395);
        raises ValueError on violation. Host-side; requires concrete arrays."""
        st = self.storage
        rowptr = np.asarray(jax.device_get(st.rowptr()))
        col = np.asarray(jax.device_get(st.col()))
        m, n = self.sparse_sizes()
        if rowptr[0] != 0 or rowptr[-1] != self.nnz:
            raise ValueError("rowptr must start at 0 and end at nnz")
        if (np.diff(rowptr) < 0).any():
            raise ValueError("rowptr must be nondecreasing")
        if len(col) and (col.min() < 0 or col.max() >= n):
            raise ValueError(f"col indices out of range [0, {n})")
        if self.has_value and st.values() is not None \
                and st.values().shape[0] != self.nnz:
            raise ValueError("values length != nnz")
        return self

    # --- pytree protocol ---
    def tree_flatten(self):
        return (self.storage,), (self.has_value,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.storage = children[0]
        obj.has_value = aux[0]
        return obj
