"""Sparse format transforms, all jittable with static shapes.

Reference parity: `csr2csc` wrapping cusparseCsr2cscEx2
(include/cuda/csr2csc.cuh:8-26, src/cuda/spmm_cuda.cu:384-414) and the
`dgsparse.ftransform.csr2csc` Python entry (dgsparse/ftransform.py:6-10).
On TPU the transpose is a stable argsort over column indices — a one-time
host/compile cost that the Storage container caches eagerly, exactly like the
reference caches the CSC view at construction (dgsparse/storage.py:100).

All index arrays are int32 (the reference asserts int32,
dgsparse/storage.py:29) — it halves index bandwidth on TPU too.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def expand_rowptr(rowptr: jax.Array, nnz: int) -> jax.Array:
    """CSR rowptr -> per-edge row ids (COO row array). `nnz` must be static.

    Implemented as a searchsorted over edge positions rather than repeat() so
    it is O(nnz log M), jittable, and correct for empty rows.
    """
    positions = jnp.arange(nnz, dtype=rowptr.dtype)
    # row[e] = (number of rowptr entries <= e) - 1, over rowptr[1:]
    return jnp.searchsorted(rowptr[1:], positions, side="right").astype(jnp.int32)


def compress_rowids(row: jax.Array, num_rows: int) -> jax.Array:
    """Sorted COO row ids -> CSR rowptr of length num_rows+1."""
    counts = jnp.bincount(row, length=num_rows)
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )


def csr2csc(
    rowptr: jax.Array,
    col: jax.Array,
    values: Optional[jax.Array],
    num_cols: int,
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array], jax.Array]:
    """Transpose a CSR matrix into CSC.

    Returns (colptr, row, values_csc, perm) where `perm` is the csr2csc
    permutation: ``values_csc = values[perm]`` — the same permutation tensor
    the reference threads into the backward pass so A^T·grad never
    re-transposes (src/spmm.cpp:72-74, dgsparse/storage.py:159-174).
    """
    nnz = col.shape[0]
    row = expand_rowptr(rowptr, nnz)
    # Stable sort by column; ties keep row order, giving sorted rows within
    # each column (canonical CSC).
    perm = jnp.argsort(col, stable=True).astype(jnp.int32)
    colptr = compress_rowids(col, num_cols)
    row_csc = row[perm]
    values_csc = None if values is None else values[perm]
    return colptr, row_csc, values_csc, perm


def coo2csr(
    row: jax.Array,
    col: jax.Array,
    values: Optional[jax.Array],
    num_rows: int,
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array], jax.Array]:
    """Sort COO edges by row (stable in column order) and build rowptr.

    Returns (rowptr, col_sorted, values_sorted, perm).
    """
    perm = jnp.argsort(row, stable=True).astype(jnp.int32)
    row_sorted = row[perm]
    rowptr = compress_rowids(row_sorted, num_rows)
    values_sorted = None if values is None else values[perm]
    return rowptr, col[perm], values_sorted, perm


def csr2coo(rowptr: jax.Array, col: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """CSR -> COO (row, col)."""
    return expand_rowptr(rowptr, col.shape[0]), col


def row_degrees(rowptr: jax.Array) -> jax.Array:
    return rowptr[1:] - rowptr[:-1]


# --- numpy twins -----------------------------------------------------------
# Host-side structure building must NOT run eager jnp ops: on TPU each eager
# primitive pays a fresh XLA compile. Storage uses these (or the native C++
# library) on concrete inputs; the jnp versions above remain for use under
# jit.

import numpy as np  # noqa: E402


def expand_rowptr_np(rowptr: np.ndarray) -> np.ndarray:
    return np.repeat(
        np.arange(len(rowptr) - 1, dtype=np.int32), np.diff(rowptr))


def csr2csc_np(rowptr: np.ndarray, col: np.ndarray, num_cols: int):
    """(colptr, row_csc, perm) with numpy (native C++ when available)."""
    from dgsparse_tpu import native

    num_rows = len(rowptr) - 1
    out = None
    if len(col) >= 4096:
        out = native.csr2csc(rowptr, col, num_rows, num_cols)
    if out is not None:
        return out
    row = expand_rowptr_np(rowptr)
    perm = np.argsort(col, kind="stable").astype(np.int32)
    colptr = np.zeros(num_cols + 1, np.int64)
    np.add.at(colptr, col + 1, 1)
    colptr = np.cumsum(colptr).astype(np.int32)
    return colptr, row[perm], perm
