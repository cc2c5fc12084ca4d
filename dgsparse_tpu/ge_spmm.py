"""GE-SpMM standalone-library API parity (torch-free C API analog).

Mirrors the reference's framework-free GE-SpMM surface
(src/ge-spmm/gespmm.h:9-85): the `SpMatCsrDescr_t` descriptor, the
`gespmmAlg_t` algorithm enum, the `gespmmAlgSel` heuristic
(src/ge-spmm/gespmm.cc:13-24) and the `gespmmCsrSpMM` entry — here as a
thin layer over the library's SparseTensor + Algorithm machinery, so code
written against the reference's C API maps one-to-one.

The reference's 10 CUDA schedules collapse onto the TPU algorithm zoo:
seq/par-reduce row-balance -> ELL row-balance; nnz-balance -> ESC edge
tiles; row-caching -> BELL in-MXU tiles; the legacy v2 N<=32 kernel
matrix (src/ge-spmm/gespmm_v2.cu) is subsumed by XLA's handling of small
feature widths. `transpose=False` (column-major B/C,
csrspmm_non_transpose.cu) is served by transposing at the XLA layout
level — on TPU, layout is the compiler's job, not the kernel's.
"""

import dataclasses
import enum
from typing import Optional

import jax
import jax.numpy as jnp

from dgsparse_tpu.core.formats import SparseTensor
from dgsparse_tpu.ops.spmm import spmm
from dgsparse_tpu.ops.types import Algorithm


class GespmmAlg(enum.Enum):
    """gespmmAlg_t (src/ge-spmm/gespmm.h:18-30), mapped to TPU schedules."""

    DEFAULT = "default"                     # = gespmmAlgSel
    SEQREDUCE_ROWBALANCE = "seqreduce_rowbalance"
    PARREDUCE_ROWBALANCE = "parreduce_rowbalance"
    SEQREDUCE_NNZBALANCE = "seqreduce_nnzbalance"
    PARREDUCE_NNZBALANCE = "parreduce_nnzbalance"
    ROWCACHING_ROWBALANCE = "rowcaching_rowbalance"
    ROWCACHING_NNZBALANCE = "rowcaching_nnzbalance"


_ALG_MAP = {
    GespmmAlg.DEFAULT: Algorithm.AUTO,
    # row-balance schedules -> ELL row-balance
    GespmmAlg.SEQREDUCE_ROWBALANCE: Algorithm.PALLAS_ROW_TILE,
    GespmmAlg.PARREDUCE_ROWBALANCE: Algorithm.PALLAS_ROW_TILE,
    # nnz-balance schedules -> ESC edge tiles
    GespmmAlg.SEQREDUCE_NNZBALANCE: Algorithm.PALLAS_EDGE_TILE,
    GespmmAlg.PARREDUCE_NNZBALANCE: Algorithm.PALLAS_EDGE_TILE,
    # row-caching (shared-memory staging) -> fully in-MXU BELL tiles
    GespmmAlg.ROWCACHING_ROWBALANCE: Algorithm.PALLAS_BELL,
    GespmmAlg.ROWCACHING_NNZBALANCE: Algorithm.PALLAS_BELL,
}


@dataclasses.dataclass
class SpMatCsrDescr_t:  # noqa: N801 — reference-parity name
    """CSR descriptor (src/ge-spmm/gespmm.h:9-16)."""

    nrow: int
    ncol: int
    nnz: int
    indptr: jax.Array
    indices: jax.Array
    data: Optional[jax.Array] = None
    # memoized SparseTensor (plans built once per descriptor, not per
    # call; also lets gespmmCsrSpMM run under jit, where plan building
    # is impossible — construction needs host-side index data)
    _sp: Optional[SparseTensor] = dataclasses.field(
        default=None, repr=False, compare=False)

    def to_sparse_tensor(self) -> SparseTensor:
        if self._sp is None:
            if isinstance(jnp.asarray(0) + 0, jax.core.Tracer):
                raise RuntimeError(
                    "SpMatCsrDescr_t.to_sparse_tensor() first called "
                    "inside jit: plan construction needs host index "
                    "data. Call gespmmCsrSpMM (or to_sparse_tensor) "
                    "once eagerly; subsequent jitted calls reuse the "
                    "memoized SparseTensor.")
            self._sp = SparseTensor.from_csr(
                self.indptr, self.indices, self.data,
                sparse_sizes=(self.nrow, self.ncol))
        return self._sp


def gespmmAlgSel(dense_ncol: int, transpose: bool = True) -> GespmmAlg:  # noqa: N802
    """The reference heuristic (src/ge-spmm/gespmm.cc:13-24): N>=32 ->
    row-caching, N>4 -> seqreduce row-balance, else parreduce row-balance.
    (The TPU AUTO heuristic is structure-aware and usually better; this is
    provided for drop-in parity.)"""
    if not transpose:
        return GespmmAlg.PARREDUCE_ROWBALANCE
    if dense_ncol >= 32:
        return GespmmAlg.ROWCACHING_ROWBALANCE
    if dense_ncol > 4:
        return GespmmAlg.SEQREDUCE_ROWBALANCE
    return GespmmAlg.PARREDUCE_ROWBALANCE


def gespmmCsrSpMM(sp_descr: SpMatCsrDescr_t, B: jax.Array,  # noqa: N802
                  alg: GespmmAlg = GespmmAlg.DEFAULT,
                  transpose: bool = True) -> jax.Array:
    """gespmmCsrSpMM (src/ge-spmm/gespmm.h:40-47): C = A @ B, sum-reduce.

    transpose=True: B is [ncol, N] row-major (the common layout).
    transpose=False: the reference's column-major variant — B arrives
    [N, ncol] and C returns [N, nrow]."""
    sp = sp_descr.to_sparse_tensor()
    algorithm = _ALG_MAP[alg]
    if transpose:
        return spmm(sp, B, "sum", algorithm)
    return spmm(sp, B.T, "sum", algorithm).T


def spmm_cuda(sp_descr: SpMatCsrDescr_t, B: jax.Array) -> jax.Array:  # pragma: no cover - alias
    """Legacy alias (src/ge-spmm/gespmm.h:60-70)."""
    return gespmmCsrSpMM(sp_descr, B, GespmmAlg.DEFAULT)


def spmm_cuda_no_edge_value(sp_descr: SpMatCsrDescr_t,
                            B: jax.Array) -> jax.Array:
    """Legacy alias, values treated as implicit ones
    (src/ge-spmm/gespmm.h:72-82)."""
    if sp_descr.data is None:
        return gespmmCsrSpMM(sp_descr, B, GespmmAlg.DEFAULT)
    d = getattr(sp_descr, "_no_value_twin", None)
    if d is None:
        d = dataclasses.replace(sp_descr, data=None, _sp=None)
        sp_descr._no_value_twin = d
    return gespmmCsrSpMM(d, B, GespmmAlg.DEFAULT)


def cuda_csr_coo_spmm(row: jax.Array, col: jax.Array,
                      values: Optional[jax.Array], B: jax.Array,
                      nrow: int, transpose: bool = True) -> jax.Array:
    """Legacy v2 COO entry (src/ge-spmm/gespmm_csrcoo_v2.cu:6-606): SpMM
    directly over an (unsorted) edge list, no CSR required. The CUDA
    version earns its keep through atomics; the TPU one through zero
    preprocessing — see ops/spmm_coo.spmm_coo for the tradeoff."""
    from dgsparse_tpu.ops.spmm_coo import spmm_coo

    if transpose:
        return spmm_coo(row, col, values, B, nrow, "sum")
    return spmm_coo(row, col, values, B.T, nrow, "sum").T
