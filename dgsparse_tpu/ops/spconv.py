"""3D submanifold / strided sparse convolution (spconv).

TPU-native redesign of the reference's fused gather-GEMM-scatter spconv
(src/spconv.cpp, src/cuda/spconv_cuda.cu, include/cuda/spconv.cuh) and its
GPU hash-table rulebook builder (src/cuda/sparse_mapping.cu,
include/cuda/sparse_mapping.cuh):

- The **rulebook** (which (input, output) pairs each kernel offset connects)
  is built ONCE on the host with numpy dict/sort machinery instead of a GPU
  open-addressing hash table — sparsity structure is static per point cloud,
  exactly how the reference amortizes it across the network
  (src/spconv.cpp:11-17). A C++ builder with the same layout lives in
  native/ for large clouds.
- The device step is static-shape: per-offset gather -> dense [E_k, C_in] x
  [C_in, C_out] MXU matmul -> scatter-add. The center tap under
  `separate_mid` is one plain dense matmul over all points, mirroring the
  reference's single cuBLAS GEMM for w[0,0,0] (src/cuda/spconv_cuda.cu:44-83).
- Like the reference's 128-quantized `qkpos` layout
  (include/cuda/sparse_mapping.cuh:272-290), the builder also emits a
  Q-padded concatenated (imap, omap, widx) stream for the fused Pallas
  kernel path.

Gradients: dX = scatter(imap) of g[omap] @ W^T, dW[k] = X[imap]^T @ g[omap]
(reference: spconv_bwd_fused, src/cuda/spconv_cuda.cu:189-253), obtained here
via JAX autodiff of the gather/scatter formulation (exact same structure).
"""

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# test hook: force the compact ESC spconv path off-TPU
_FORCE_ESC = [False]
# fused Pallas kernel knob: None/False = off (the fused tier measured
# slower than ESC on v5e — docs/BENCHMARKS.md §4), True = force it on
_FORCE_FUSED = [None]


def _prec(x):
    """MXU precision for fp32 matmul operands: TPU lowers fp32 dots to a
    SINGLE bf16 pass by default (~1e-3 rel error — failed the adjoint
    test on real TPU); the fp32 contract is reference parity, so fp32
    inputs use HIGHEST. bf16 inputs keep the fast single pass."""
    return jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None


def _triple(x) -> Tuple[int, int, int]:
    if isinstance(x, (tuple, list)):
        assert len(x) == 3
        return tuple(int(v) for v in x)
    return (int(x),) * 3


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SpConvPlan:
    """Static rulebook for one (coords, kernel, stride, padding) combo.

    imap/omap: concatenated (input_id, output_id) pairs grouped by kernel
    offset, each offset's segment padded to a multiple of `quant` with
    (-1, 0) sentinels; widx gives the kernel-offset id per pair. kpos/qkpos
    are the raw/quantized exclusive scans of per-offset pair counts
    (reference: kpos_quantized, test/test_spconv.py:5-14).
    """

    imap: jax.Array          # [sum_nnz_q] int32, -1 = padding
    omap: jax.Array          # [sum_nnz_q] int32
    widx: jax.Array          # [sum_nnz_q] int32 kernel-offset id
    o2i: jax.Array           # [k_vol, num_out] int32 input id per (offset,
                             # output), -1 = miss — the gather-only forward map
    i2o: jax.Array           # [k_vol, num_in] int32 inverse map for backward
    # ESC path (sparse clouds): EdgeTilePlans that one-hot-scatter the
    # Q-padded pair stream by out id (fwd) / in id (bwd); "columns" are
    # positions in the Q-padded stream, so the whole conv is ONE masked
    # gather + ONE batched einsum + one ESC scatter per direction.
    plan_by_out: object      # EdgeTilePlan or None
    plan_by_in: object       # EdgeTilePlan or None
    # Fused-kernel slot arrays (kernels/pallas_spconv.py): per slot of the
    # by-out / by-in EdgeTilePlans, the source row to gather (input id /
    # output id; -1 padding) and the pair's kernel-offset id.
    fo_src: object           # [S_out] int32 or None
    fo_widx: object          # [S_out] int32 or None
    fi_src: object           # [S_in] int32 or None
    fi_widx: object          # [S_in] int32 or None
    knnz: tuple              # static per-offset true pair counts
    kpos: tuple              # static exclusive scan of knnz
    qkpos: tuple             # static exclusive scan of quantized counts
    num_out: int
    num_in: int
    k_vol: int
    separate_mid: bool       # center tap computed as a dense matmul
    quant: int = 128

    def tree_flatten(self):
        return (self.imap, self.omap, self.widx, self.o2i, self.i2o,
                self.plan_by_out, self.plan_by_in, self.fo_src,
                self.fo_widx, self.fi_src, self.fi_widx), (
            self.knnz, self.kpos, self.qkpos, self.num_out, self.num_in,
            self.k_vol, self.separate_mid, self.quant)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def total_pairs(self) -> int:
        return int(self.kpos[-1])

    def use_esc(self) -> bool:
        """Sparse clouds: compact ESC path beats the masked-dense gathers
        when most (offset, output) probes miss. TPU-only by default (the
        interpret-mode segment kernel is slow on CPU); _FORCE_ESC for
        tests. Static per plan, so forward and backward always agree."""
        if self.plan_by_out is None:
            return False
        if not (_FORCE_ESC[0] or jax.default_backend() == "tpu"):
            return False
        return self.use_esc_structure()

    def use_fused(self, c_in: int, c_out: int) -> bool:
        """Fused Pallas pair-stream kernel (kernels/pallas_spconv.py) —
        the TPU counterpart of the reference's FGMS fused tensor-core tier
        (include/cuda/spconv.cuh:1097-1248). MEASURED SLOWER than the ESC
        formulation on v5e (60K-voxel cloud, c=32: 48.9 vs 104.5 Mvox/s
        fwd): the in-kernel k_vol× weight-stack projection is MXU-bound
        while ESC's extra stream gather rides idle bandwidth. Kept as a
        forceable tier (_FORCE_FUSED) — the trade may flip on parts with
        faster MXUs relative to HBM."""
        if _FORCE_FUSED[0] is not True:
            return False
        if self.fo_src is None or self.fi_src is None:
            return False
        kc = self.k_vol * max(c_in, c_out)
        return kc <= 2048 and self.use_esc_structure()

    def use_esc_structure(self) -> bool:
        """Sparsity condition shared by the ESC and fused paths."""
        return (self.plan_by_out is not None
                and self.total_pairs
                < 0.5 * (self.k_vol - (1 if self.separate_mid else 0))
                * max(self.num_out, 1))


def _encode(coords: np.ndarray, dims: np.ndarray) -> np.ndarray:
    """Pack (b, x, y, z) int coords into a single int64 key."""
    c = coords.astype(np.int64)
    return ((c[:, 0] * dims[0] + c[:, 1]) * dims[1] + c[:, 2]) * dims[2] + c[:, 3]


def build_rulebook(
    coords: np.ndarray,
    kernel_size=3,
    stride=1,
    padding=0,
    spatial_shape: Optional[Sequence[int]] = None,
    submanifold: Optional[bool] = None,
    quant: int = 128,
) -> Tuple[SpConvPlan, np.ndarray]:
    """Host-side rulebook builder (reference: sparse_mapping,
    src/cuda/sparse_mapping.cu:20-161).

    coords: [nnz, 4] int (batch, x, y, z). Returns (plan, out_coords).
    Submanifold (stride==1) keeps out_coords == coords and marks the center
    tap for the dense-matmul path; strided conv generates downsampled unique
    output coords (the reference's sort+unique, sparse_mapping.cu:66-93).
    """
    coords = np.asarray(coords, np.int64)
    nnz = len(coords)
    ks, st, pad = _triple(kernel_size), _triple(stride), _triple(padding)
    k_vol = ks[0] * ks[1] * ks[2]
    if submanifold is None:
        submanifold = all(s == 1 for s in st)
    if spatial_shape is None:
        spatial_shape = tuple(int(coords[:, i + 1].max()) + 1 for i in range(3))
    dims = np.array([spatial_shape[0] + max(ks) + 2,
                     spatial_shape[1] + max(ks) + 2,
                     spatial_shape[2] + max(ks) + 2], np.int64)

    in_keys = _encode(coords, dims)
    in_order = np.argsort(in_keys)
    in_keys_sorted = in_keys[in_order]

    def lookup(keys: np.ndarray) -> np.ndarray:
        """Vectorized hash-table probe: sorted-key searchsorted (-1 miss)."""
        pos = np.searchsorted(in_keys_sorted, keys)
        pos = np.minimum(pos, len(in_keys_sorted) - 1)
        hit = in_keys_sorted[pos] == keys
        return np.where(hit, in_order[pos], -1).astype(np.int64)

    if submanifold:
        out_coords = coords.copy()
    elif nnz >= 2048:
        # Native C++ single-pass path (hash dedupe of output coords + pair
        # probes) — ~10x over the numpy expand/unique/searchsorted pipeline,
        # which matters for streaming point clouds where the rulebook is on
        # the per-frame critical path.
        from dgsparse_tpu import native

        nat = native.rulebook_strided(coords.astype(np.int32), ks, st, pad,
                                      tuple(spatial_shape))
        if nat is not None:
            out_coords_n, imaps, omaps, knnz = nat
            return _finalize_plan(imaps, omaps, knnz, k_vol,
                                  len(out_coords_n), nnz, False, quant), \
                out_coords_n
        out_coords = None
    else:
        out_coords = None
    if out_coords is None:
        # Output coords: positions where the strided window anchored at
        # out*stride - padding covers at least one input voxel
        # (reference: the generic-stride expand + sort + unique path,
        # src/cuda/sparse_mapping.cu:94-129).
        offs = [(i, j, k) for i in range(ks[0]) for j in range(ks[1])
                for k in range(ks[2])]
        cand = []
        for (oi, oj, ok) in offs:
            v = coords[:, 1:4] + np.array(pad) - np.array([oi, oj, ok])
            ok_mask = ((v % np.array(st)) == 0).all(1) & (v >= 0).all(1)
            o = v[ok_mask] // np.array(st)
            out_sp = [(spatial_shape[i] + 2 * pad[i] - ks[i]) // st[i] + 1
                      for i in range(3)]
            in_range = (o < np.array(out_sp)).all(1)
            c = np.concatenate(
                [coords[ok_mask][in_range][:, :1], o[in_range]], 1)
            cand.append(c)
        cand = np.concatenate(cand, 0)
        # NOTE dims here must bound the OUT coordinate space for the key
        # order to be (b, x, y, z)-lexicographic — use out dims.
        out_sp = [(spatial_shape[i] + 2 * pad[i] - ks[i]) // st[i] + 1
                  for i in range(3)]
        odims = np.array([s + 2 for s in out_sp], np.int64)
        keys = _encode(cand, odims)
        _, first = np.unique(keys, return_index=True)
        out_coords = cand[first]  # unique keys are sorted -> (b,x,y,z) order

    num_out = len(out_coords)

    mid = (k_vol - 1) // 2
    separate_mid = bool(submanifold)

    # Native C++ hash-probe path for the submanifold case (the hot one) —
    # the CPU analog of the reference's GPU hash table
    # (include/cuda/sparse_mapping.cuh:26-58).
    if submanifold and all(k % 2 == 1 for k in ks) \
            and all(p == k // 2 for p, k in zip(pad, ks)) and nnz >= 2048:
        from dgsparse_tpu import native

        nat = native.rulebook_subm(coords.astype(np.int32), ks,
                                   tuple(spatial_shape), separate_mid)
        if nat is not None:
            imaps, omaps, knnz = nat
            return _finalize_plan(imaps, omaps, knnz, k_vol, num_out, nnz,
                                  separate_mid, quant), \
                out_coords.astype(np.int32)

    imaps, omaps, knnz = [], [], []
    offs = [(i, j, k) for i in range(ks[0]) for j in range(ks[1])
            for k in range(ks[2])]
    for kp, (oi, oj, ok) in enumerate(offs):
        if separate_mid and kp == mid:
            knnz.append(0)
            imaps.append(np.empty(0, np.int32))
            omaps.append(np.empty(0, np.int32))
            continue
        # input coord = out*stride - padding + offset
        inc = out_coords[:, 1:4] * np.array(st) - np.array(pad) + \
            np.array([oi, oj, ok])
        valid = (inc >= 0).all(1) & (inc < np.array(spatial_shape)).all(1)
        q = np.concatenate([out_coords[:, :1], inc], 1)[valid]
        out_ids = np.nonzero(valid)[0]
        in_ids = lookup(_encode(q, dims))
        hit = in_ids >= 0
        imaps.append(in_ids[hit].astype(np.int32))
        omaps.append(out_ids[hit].astype(np.int32))
        knnz.append(int(hit.sum()))

    return _finalize_plan(imaps, omaps, knnz, k_vol, num_out, nnz,
                          separate_mid, quant), out_coords.astype(np.int32)


def plan_from_reference_rulebook(data: dict, quant: int = 128) -> SpConvPlan:
    """Build a SpConvPlan from a dgSPARSE sample-data rulebook dict — the
    real MinkUNet/SemanticKITTI fixtures the reference tests against
    (example/data/sample-data/{fp32,fp16}/minkunet-semantickitti/*.pth;
    field layout per test/test_spconv.py:106-118: per-offset pair counts
    `knnz`, exclusive-scan `kpos`, and the concatenated `imap`/`omap`
    streams). Mirrors the reference's separate-mid detection
    (test_spconv.py:120-124): submanifold fixtures carry an EMPTY center
    offset whose identity map is served by the dense center-tap matmul."""
    knnz = np.asarray(data["knnz"], np.int64)
    kpos = np.asarray(data["kpos"], np.int64)
    imap = np.asarray(data["imap"], np.int64)
    omap = np.asarray(data["omap"], np.int64)
    k_vol = int(data["k_vol"])
    in_nnz = int(data["in_nnz"])
    out_nnz = int(data["out_nnz"])
    if len(kpos) != k_vol + 1 or int(kpos[-1]) != len(imap):
        raise ValueError("inconsistent rulebook: kpos does not index imap")
    separate_mid = in_nnz == out_nnz
    mid = (k_vol - 1) // 2
    imaps = [imap[kpos[k]:kpos[k] + knnz[k]].astype(np.int32)
             for k in range(k_vol)]
    omaps = [omap[kpos[k]:kpos[k] + knnz[k]].astype(np.int32)
             for k in range(k_vol)]
    knnz = [int(x) for x in knnz]
    if separate_mid and knnz[mid]:
        # real SemanticKITTI fixtures carry the center tap as an explicit
        # identity map — strip it so it rides the dense center-tap matmul
        # (the reference's separate_mid cuBLAS GEMM,
        # src/cuda/spconv_cuda.cu:44-83)
        ident = np.arange(knnz[mid], dtype=np.int32)
        if knnz[mid] == in_nnz and np.array_equal(imaps[mid], ident) \
                and np.array_equal(omaps[mid], ident):
            imaps[mid] = np.empty(0, np.int32)
            omaps[mid] = np.empty(0, np.int32)
            knnz[mid] = 0
        else:
            separate_mid = False     # non-identity center: keep the maps
    return _finalize_plan(imaps, omaps, knnz, k_vol,
                          out_nnz, in_nnz, separate_mid, quant)


def _finalize_plan(imaps, omaps, knnz, k_vol, num_out, nnz, separate_mid,
                   quant) -> SpConvPlan:
    # Dense per-offset maps. Because every (output, offset) has at most ONE
    # input voxel, the conv is expressible as pure masked row-gathers in both
    # directions — no scatter anywhere, which is the TPU-native formulation
    # of the reference's fused gather-GEMM-scatter (include/cuda/spconv.cuh).
    o2i = np.full((k_vol, max(num_out, 1)), -1, np.int32)
    i2o = np.full((k_vol, max(nnz, 1)), -1, np.int32)
    for kp in range(k_vol):
        o2i[kp, omaps[kp]] = imaps[kp]
        i2o[kp, imaps[kp]] = omaps[kp]

    # Quantized concatenation (reference qkpos: 128-aligned offsets so every
    # device tile belongs to exactly one kernel offset).
    imap_q, omap_q, widx_q = [], [], []
    kpos, qkpos = [0], [0]
    for kp in range(k_vol):
        n = knnz[kp]
        nq = -(-n // quant) * quant if n else 0
        im = np.full(nq, -1, np.int32)
        om = np.zeros(nq, np.int32)
        im[:n] = imaps[kp]
        om[:n] = omaps[kp]
        imap_q.append(im)
        omap_q.append(om)
        widx_q.append(np.full(nq, kp, np.int32))
        kpos.append(kpos[-1] + n)
        qkpos.append(qkpos[-1] + nq)

    # ESC plans over the Q-padded pair stream (fwd scatter by out id, bwd
    # scatter by in id); "columns" are Q-padded stream positions, so the
    # device step is one masked gather + one batched per-tile einsum + one
    # one-hot scatter.
    total_pairs = int(kpos[-1])
    imap_q_np = np.concatenate(imap_q) if imap_q else np.empty(0, np.int32)
    omap_q_np = np.concatenate(omap_q) if omap_q else np.empty(0, np.int32)
    widx_q_np = np.concatenate(widx_q) if widx_q else np.empty(0, np.int32)
    plan_by_out = plan_by_in = None
    fo_src = fo_widx = fi_src = fi_widx = None
    if total_pairs:
        from dgsparse_tpu.core.planner import (EdgeTilePlan,
                                               _invert_eperm,
                                               edge_tile_arrays_host)

        real = np.nonzero(imap_q_np >= 0)[0].astype(np.int32)
        n_stream = len(imap_q_np)

        def pair_plan(ids, num_rows):
            """Host-built ESC plan over the Q-padded pair stream; returns
            (device EdgeTilePlan, host cols, host eperm) — all layout work
            stays in numpy so plan construction never waits on the device
            tunnel (a busy tunnel turned a 0.6 s LiDAR-scale rulebook into
            minutes when these arrays round-tripped through it)."""
            order = np.argsort(ids, kind="stable")
            rowptr_p = np.zeros(num_rows + 1, np.int64)
            np.add.at(rowptr_p, ids + 1, 1)
            rowptr_p = np.cumsum(rowptr_p).astype(np.int32)
            cols, eperm, lrow, tile_rb = edge_tile_arrays_host(
                rowptr_p, real[order], sort_cols=False)
            plan = EdgeTilePlan(
                cols=jnp.asarray(cols), eperm=jnp.asarray(eperm),
                lrow=jnp.asarray(lrow), tile_rb=jnp.asarray(tile_rb),
                inv_eperm=jnp.asarray(_invert_eperm(eperm, len(real))),
                num_tiles=len(tile_rb), edge_tile=256, row_block=128,
                num_row_blocks=max(-(-num_rows // 128), 1),
                num_rows=num_rows, num_cols=n_stream, nnz=len(real))
            return plan, cols, eperm

        plan_by_out, cols_o, eperm_o = pair_plan(omap_q_np[real], num_out)
        plan_by_in, cols_i, eperm_i = pair_plan(imap_q_np[real], nnz)

        # Fused-kernel slot arrays: compose plan slot -> Q-stream position
        # -> (source row id, offset id), so the device step is ONE gather
        # per direction (kernels/pallas_spconv.py).
        def slot_arrays(cols, eperm, src_ids):
            valid = eperm >= 0
            sid = np.where(valid, src_ids[cols], -1).astype(np.int32)
            swidx = np.where(valid, widx_q_np[cols], 0).astype(np.int32)
            return jnp.asarray(sid), jnp.asarray(swidx)

        fo_src, fo_widx = slot_arrays(cols_o, eperm_o, imap_q_np)
        fi_src, fi_widx = slot_arrays(cols_i, eperm_i, omap_q_np)

    return SpConvPlan(
        imap=jnp.asarray(np.concatenate(imap_q) if imap_q else
                         np.empty(0, np.int32)),
        omap=jnp.asarray(np.concatenate(omap_q) if omap_q else
                         np.empty(0, np.int32)),
        widx=jnp.asarray(np.concatenate(widx_q) if widx_q else
                         np.empty(0, np.int32)),
        o2i=jnp.asarray(o2i),
        i2o=jnp.asarray(i2o),
        plan_by_out=plan_by_out,
        plan_by_in=plan_by_in,
        fo_src=fo_src,
        fo_widx=fo_widx,
        fi_src=fi_src,
        fi_widx=fi_widx,
        knnz=tuple(int(k) for k in knnz),
        kpos=tuple(kpos),
        qkpos=tuple(qkpos),
        num_out=num_out,
        num_in=nnz,
        k_vol=k_vol,
        separate_mid=separate_mid,
        quant=quant,
    )


def inverse_plan(plan: SpConvPlan) -> SpConvPlan:
    """Rulebook of the INVERSE (transposed) convolution: in/out roles swap
    and kernel offsets mirror — the decoder-side op for UNet architectures
    (the reference ships MinkUNet spconv fixtures but no inverse op). The
    inverse of a strided downsample scatters coarse features back to the
    exact fine sites the encoder saw."""
    k_vol = plan.k_vol
    i2o_np = np.asarray(jax.device_get(plan.i2o))
    knnz = []
    imaps, omaps = [], []
    mid = (k_vol - 1) // 2
    for kp in range(k_vol):
        mk = k_vol - 1 - kp
        if plan.separate_mid and kp == mid:
            knnz.append(0)
            imaps.append(np.empty(0, np.int32))
            omaps.append(np.empty(0, np.int32))
            continue
        outs = np.nonzero(i2o_np[mk] >= 0)[0].astype(np.int32)
        imaps.append(i2o_np[mk][outs])
        omaps.append(outs)
        knnz.append(len(outs))
    return _finalize_plan(imaps, omaps, knnz, k_vol, plan.num_in,
                          plan.num_out, plan.separate_mid, plan.quant)


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=())
def spconv(
    features: jax.Array,      # [nnz_in, C_in]
    kernel: jax.Array,        # [k_vol, C_in, C_out]
    plan: SpConvPlan,
) -> jax.Array:
    """Fused sparse conv (reference: spconv_fwd_fused,
    src/cuda/spconv_cuda.cu:18-187). Returns [num_out, C_out].

    TPU-native formulation: every (output, offset) pair has at most one
    input voxel, so the conv is `out = sum_k mask_k * (X W_k)[o2i_k]` —
    dense MXU matmuls plus masked row-gathers, with NO scatter on either
    the forward or backward path (the backward gathers through the inverse
    map i2o). The center tap under separate_mid is one plain dense matmul
    over all points, mirroring the reference's single cuBLAS GEMM
    (src/cuda/spconv_cuda.cu:44-83).
    """
    return _spconv_fwd_impl(features, kernel, plan)


def _spconv_fwd_impl(features, kernel, plan):
    c_out = kernel.shape[-1]
    c_in = kernel.shape[1]
    mid = (plan.k_vol - 1) // 2
    from dgsparse_tpu.utils import metrics

    metrics.record(
        "spconv",
        path=("fused" if plan.use_fused(c_in, c_out)
              else "esc" if plan.use_esc() else "dense"),
        pairs=plan.total_pairs, c_in=c_in, c_out=c_out)
    if plan.use_fused(c_in, c_out):
        # Fused weight-stationary pair-stream kernel (the reference's FGMS
        # tensor-core tier, include/cuda/spconv.cuh:1097-1248): one gather
        # of input rows in by-out slot order, then a single Pallas pass
        # does projection + offset selection + VMEM-accumulated scatter —
        # the pair stream never round-trips through HBM.
        from dgsparse_tpu.kernels import pallas_spconv as kf

        p = plan.plan_by_out
        valid = (plan.fo_src >= 0)[:, None]
        x_slot = jnp.where(
            valid, jnp.take(features, jnp.maximum(plan.fo_src, 0), axis=0),
            0).astype(features.dtype)
        w_flat = jnp.transpose(kernel, (1, 0, 2)).reshape(
            c_in, plan.k_vol * c_out)
        exact = features.dtype == jnp.float32
        out = kf.fused_pair_matmul(
            x_slot, plan.fo_widx, p.lrow, p.tile_rb, w_flat,
            plan.num_out, c_out, p.edge_tile, p.row_block, exact=exact)
        out = out.astype(features.dtype)
        if plan.separate_mid:
            out = out + jnp.dot(features, kernel[mid],
                                preferred_element_type=jnp.float32,
                precision=_prec(features)
                                ).astype(features.dtype)
        return out
    if plan.use_esc():
        # Sparse-cloud path: gather ONLY hit pairs (Q-padded rulebook
        # stream, ONE masked take), project all offsets in ONE batched
        # per-tile einsum (every Q-tile has a single weight slice, the
        # reference's qkpos invariant), then one-hot-scatter the stream by
        # output id via the ESC kernel. A 2.7%-dense LiDAR cloud wastes 97%
        # of both gathers and projections on the masked-dense path.
        from dgsparse_tpu.kernels.pallas_spmm import spmm_esc

        out = jnp.zeros((plan.num_out, c_out), features.dtype)
        if plan.separate_mid:
            out = out + jnp.dot(features, kernel[mid],
                                preferred_element_type=jnp.float32,
                precision=_prec(features)
                                ).astype(features.dtype)
        total_q = int(plan.qkpos[-1])
        if total_q:
            q = plan.quant
            t = total_q // q
            valid = (plan.imap >= 0)[:, None]
            gathered = jnp.where(
                valid,
                jnp.take(features, jnp.maximum(plan.imap, 0), axis=0), 0)
            w_t = jnp.take(kernel, plan.widx[::q], axis=0)
            stream = jnp.einsum(
                "tqi,tio->tqo", gathered.reshape(t, q, -1), w_t,
                preferred_element_type=jnp.float32,
                precision=_prec(features)).astype(features.dtype)
            out = out + spmm_esc(plan.plan_by_out, None,
                                 stream.reshape(total_q, c_out)
                                 ).astype(features.dtype)
        return out
    # Per-offset H_k = X @ W[k] (MXU) + masked row-gather, looped so peak
    # memory stays O(n * C) instead of materializing [k_vol, n, C].
    out = jnp.zeros((plan.num_out, c_out), features.dtype)
    if plan.separate_mid:
        # submanifold center tap: out rows == in rows, one dense matmul
        # (reference: the cuBLAS GEMM, src/cuda/spconv_cuda.cu:44-83)
        out = out + jnp.dot(features, kernel[mid],
                            preferred_element_type=jnp.float32,
                precision=_prec(features)
                            ).astype(features.dtype)
    for kp in range(plan.k_vol):
        if plan.separate_mid and kp == mid:
            continue
        if plan.knnz[kp] == 0:
            continue
        h_k = jnp.dot(features, kernel[kp],
                      preferred_element_type=jnp.float32,
                precision=_prec(features)
                      ).astype(features.dtype)
        idx = plan.o2i[kp]                      # [num_out], -1 miss
        hit = (idx >= 0)[:, None]
        out = out + jnp.where(hit, jnp.take(h_k, jnp.maximum(idx, 0),
                                            axis=0), 0)
    return out


def _spconv_vjp_fwd(features, kernel, plan):
    return _spconv_fwd_impl(features, kernel, plan), (features, kernel, plan)


def _spconv_vjp_bwd(residuals, g):
    """dX, dW via the inverse maps (reference: spconv_bwd_fused,
    src/cuda/spconv_cuda.cu:189-253): d_H[k] = mask * g[i2o_k] (a gather),
    dX = sum_k d_H[k] W[k]^T, dW[k] = X^T d_H[k] — all dense MXU."""
    features, kernel, plan = residuals
    mid = (plan.k_vol - 1) // 2
    c_in, c_out = kernel.shape[1], kernel.shape[2]
    if plan.use_fused(c_in, c_out):
        # Fused backward, mirroring the reference's W_transpose /
        # I_transpose kernels (src/cuda/spconv_cuda.cu:223-251):
        # dX runs the same fused kernel over the BY-IN pair ordering with
        # the transposed weight stack; dW is one accumulator pass over the
        # by-out stream (fused_pair_dw).
        from dgsparse_tpu.kernels import pallas_spconv as kf

        exact = features.dtype == jnp.float32
        g = g.astype(features.dtype)
        pin = plan.plan_by_in
        valid_in = (plan.fi_src >= 0)[:, None]
        g_slot = jnp.where(
            valid_in, jnp.take(g, jnp.maximum(plan.fi_src, 0), axis=0), 0)
        wt_flat = jnp.transpose(kernel, (2, 0, 1)).reshape(
            c_out, plan.k_vol * c_in)
        d_features = kf.fused_pair_matmul(
            g_slot, plan.fi_widx, pin.lrow, pin.tile_rb, wt_flat,
            plan.num_in, c_in, pin.edge_tile, pin.row_block,
            exact=exact).astype(features.dtype)
        if plan.separate_mid:
            d_features = d_features + jnp.dot(
                g, kernel[mid].T,
                preferred_element_type=jnp.float32,
                precision=_prec(features)).astype(features.dtype)

        pout = plan.plan_by_out
        valid_out = (plan.fo_src >= 0)[:, None]
        x_slot = jnp.where(
            valid_out,
            jnp.take(features, jnp.maximum(plan.fo_src, 0), axis=0), 0)
        rows_slot = (jnp.repeat(pout.tile_rb, pout.edge_tile)
                     * pout.row_block + pout.lrow)
        g_out_slot = jnp.where(
            valid_out,
            jnp.take(g, jnp.minimum(rows_slot, plan.num_out - 1), axis=0),
            0)
        d_kernel = kf.fused_pair_dw(
            x_slot, g_out_slot, plan.fo_widx, plan.k_vol, pout.edge_tile,
            exact=exact).astype(kernel.dtype)
        if plan.separate_mid:
            d_kernel = d_kernel.at[mid].add(jnp.dot(
                features.T, g,
                preferred_element_type=jnp.float32,
                precision=_prec(features)).astype(kernel.dtype))
        d_plan = jax.tree.map(
            lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0), plan)
        return d_features, d_kernel, d_plan
    if plan.use_esc():
        # Mirror of the fused forward: d_stream is a pure masked gather of
        # g by the Q-padded out ids; dW via ONE batched einsum (per-offset
        # slices summed over their tiles); dX via the by-in ESC plan — no
        # scatters anywhere.
        from dgsparse_tpu.kernels.pallas_spmm import spmm_esc

        d_features = jnp.zeros_like(features)
        if plan.separate_mid:
            d_features = d_features + jnp.dot(
                g.astype(features.dtype), kernel[mid].T,
                preferred_element_type=jnp.float32,
                precision=_prec(features)).astype(features.dtype)
        total_q = int(plan.qkpos[-1])
        d_kernel = jnp.zeros_like(kernel)
        if plan.separate_mid:
            d_kernel = d_kernel.at[mid].set(jnp.dot(
                features.T, g.astype(features.dtype),
                preferred_element_type=jnp.float32,
                precision=_prec(features)).astype(kernel.dtype))
        if total_q:
            q = plan.quant
            t = total_q // q
            valid = (plan.imap >= 0)[:, None]
            d_stream = jnp.where(
                valid, jnp.take(g, plan.omap, axis=0), 0
            ).astype(features.dtype).reshape(t, q, -1)
            gathered = jnp.where(
                valid,
                jnp.take(features, jnp.maximum(plan.imap, 0), axis=0), 0
            ).reshape(t, q, -1)
            # per-tile dW, summed per offset over its (contiguous) tiles
            dw_t = jnp.einsum("tqi,tqo->tio", gathered, d_stream,
                              preferred_element_type=jnp.float32,
                precision=_prec(features))
            for kp in range(plan.k_vol):
                t0 = plan.qkpos[kp] // q
                t1 = plan.qkpos[kp + 1] // q
                if t1 > t0:
                    d_kernel = d_kernel.at[kp].add(
                        dw_t[t0:t1].sum(0).astype(kernel.dtype))
            w_t = jnp.take(kernel, plan.widx[::q], axis=0)
            d_gathered = jnp.einsum(
                "tqo,tio->tqi", d_stream, w_t,
                preferred_element_type=jnp.float32,
                precision=_prec(features)).astype(features.dtype)
            d_features = d_features + spmm_esc(
                plan.plan_by_in, None,
                d_gathered.reshape(total_q, -1)).astype(features.dtype)
        d_plan = jax.tree.map(
            lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0), plan)
        return d_features, d_kernel, d_plan

    d_features = jnp.zeros_like(features)
    d_kernel_parts = []
    for kp in range(plan.k_vol):
        if plan.separate_mid and kp == mid:
            d_h = g.astype(features.dtype)
        elif plan.knnz[kp] == 0:
            d_kernel_parts.append(
                jnp.zeros(kernel.shape[1:], kernel.dtype))
            continue
        else:
            idx = plan.i2o[kp]                  # [num_in], -1 miss
            hit = (idx >= 0)[:, None]
            d_h = jnp.where(hit, jnp.take(g, jnp.maximum(idx, 0), axis=0),
                            0).astype(features.dtype)
        d_features = d_features + jnp.dot(
            d_h, kernel[kp].T,
            preferred_element_type=jnp.float32,
                precision=_prec(features)).astype(features.dtype)
        d_kernel_parts.append(jnp.dot(
            features.T, d_h,
            preferred_element_type=jnp.float32,
                precision=_prec(features)).astype(kernel.dtype))
    d_kernel = jnp.stack(d_kernel_parts)        # one slice per offset
    d_plan = jax.tree.map(
        lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0), plan)
    return d_features, d_kernel, d_plan


spconv.defvjp(_spconv_vjp_fwd, _spconv_vjp_bwd)


class SparseConvTensor:
    """Features + voxel coords + cached rulebooks, carried through a network
    so mappings are built once (the design the reference notes as intended,
    src/spconv.cpp:11-17)."""

    def __init__(self, features: jax.Array, coords: np.ndarray,
                 spatial_shape: Sequence[int]):
        self.features = features
        self.coords = np.asarray(coords, np.int32)
        self.spatial_shape = tuple(int(s) for s in spatial_shape)
        self._plans = {}

    def plan_for(self, kernel_size, stride, padding) -> Tuple[SpConvPlan,
                                                              np.ndarray]:
        key = (_triple(kernel_size), _triple(stride), _triple(padding))
        if key not in self._plans:
            self._plans[key] = build_rulebook(
                self.coords, kernel_size, stride, padding,
                spatial_shape=self.spatial_shape)
        return self._plans[key]

    def replace(self, features: jax.Array, coords=None, spatial_shape=None):
        new = SparseConvTensor(
            features,
            self.coords if coords is None else coords,
            self.spatial_shape if spatial_shape is None else spatial_shape,
        )
        if coords is None and spatial_shape is None:
            new._plans = self._plans
        return new
