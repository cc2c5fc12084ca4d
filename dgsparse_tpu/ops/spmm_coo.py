"""COO-native SpMM: reduce directly over an (unsorted) edge list.

Reference parity: `cuda_csr_coo_spmm` — the standalone GE-SpMM v2 entry
that consumes COO directly instead of CSR
(/root/reference/src/ge-spmm/gespmm_csrcoo_v2.cu:6-606, dispatch
`:569+`). The CUDA version exists because atomics make unsorted COO
cheap on GPUs; on TPU an unsorted segment reduction lowers to XLA's
sort-free scatter-add fusion, which is slower than the sorted CSR paths
but needs NO preprocessing at all — the right tool when the edge list is
traced (built under jit), streamed, or used once.

For repeated use, `coo2csr` + `SparseTensor.from_csr` + `spmm` is the
fast path: the conversion is a one-time host/device sort and every call
after that rides the planned kernels. The measured tradeoff on the
headline graph lives in docs/BENCHMARKS.md §1c (bench:
benchmark/bench_coo.py).

Gradient structure matches ops/spmm.py exactly (d_values = per-edge dot,
d_dense = transpose segment over col; max/min = winning-edge masks).
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dgsparse_tpu.kernels import xla as kx
from dgsparse_tpu.ops.types import ReduceOp, as_reduce

_FLOAT0 = jax.dtypes.float0


def _int_zero(x):
    return np.zeros(x.shape, dtype=_FLOAT0)


def _coo_forward(reduce: ReduceOp, has_value, num_rows, row, col, values,
                 dense):
    vals = values if has_value else None
    gathered = jnp.take(dense, col, axis=0)
    if vals is not None:
        gathered = gathered * vals[:, None].astype(gathered.dtype)
    degrees = None
    if reduce == ReduceOp.MEAN:
        degrees = jnp.bincount(row, length=num_rows)
    return kx.segment_reduce(gathered, row, num_rows, reduce, degrees)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _spmm_coo(reduce: ReduceOp, has_value: bool, num_rows: int, idx,
              values, dense):
    out, _ = _coo_forward(reduce, has_value, num_rows, idx[0], idx[1],
                          values, dense)
    return out


def _spmm_coo_fwd(reduce, has_value, num_rows, idx, values, dense):
    out, arg_edge = _coo_forward(reduce, has_value, num_rows, idx[0],
                                 idx[1], values, dense)
    return out, (idx, values, dense, arg_edge)


def _spmm_coo_bwd(reduce, has_value, num_rows, residuals, g):
    (row, col), values, dense, arg_edge = residuals
    nnz = col.shape[0]
    g32 = g.astype(jnp.float32)
    if reduce in (ReduceOp.SUM, ReduceOp.MEAN):
        if reduce == ReduceOp.MEAN:
            deg = jnp.maximum(jnp.bincount(row, length=num_rows),
                              1).astype(jnp.float32)
            g32 = g32 / deg[:, None]
        g_rows = jnp.take(g32, row, axis=0)
        if has_value:
            d_values = jnp.sum(
                g_rows * jnp.take(dense, col, axis=0).astype(jnp.float32),
                axis=-1).astype(values.dtype)
            contrib = g_rows * values[:, None].astype(jnp.float32)
        else:
            d_values = jnp.zeros_like(values)
            contrib = g_rows
        d_dense = jax.ops.segment_sum(
            contrib, col, num_segments=dense.shape[0]).astype(dense.dtype)
    else:
        # winning-edge masked backward (same structure as the XLA branch
        # of ops/spmm.py's _spmm_bwd, minus the sortedness assumptions)
        arg_rows = jnp.take(arg_edge, row, axis=0)       # [nnz, F]
        eids = jnp.arange(nnz, dtype=arg_rows.dtype)[:, None]
        win = arg_rows == eids
        g_rows = jnp.where(win, jnp.take(g32, row, axis=0), 0)
        if has_value:
            d_values = jnp.sum(
                g_rows * jnp.take(dense, col, axis=0).astype(jnp.float32),
                axis=-1).astype(values.dtype)
            contrib = g_rows * values[:, None].astype(jnp.float32)
        else:
            d_values = jnp.zeros_like(values)
            contrib = g_rows
        d_dense = jax.ops.segment_sum(
            contrib, col, num_segments=dense.shape[0]).astype(dense.dtype)
    return (_int_zero(row), _int_zero(col)), d_values, d_dense


_spmm_coo.defvjp(_spmm_coo_fwd, _spmm_coo_bwd)


def spmm_coo(row: jax.Array, col: jax.Array,
             values: Optional[jax.Array], dense: jax.Array,
             num_rows: int, reduce="sum") -> jax.Array:
    """COO SpMM: out[m] = reduce_{e: row[e]=m} values[e] * dense[col[e]].

    Args:
      row, col: [nnz] int32 edge endpoints — any order, duplicates allowed
        (duplicate edges accumulate, matching CSR with repeated entries).
      values: [nnz] edge values or None (implicit ones).
      dense: [N, F].
      num_rows: static output row count M.
      reduce: "sum" | "mean" | "max" | "min".

    Returns [M, F]. Differentiable in values and dense. For repeated use
    of one graph prefer `coo2csr` + `SparseTensor` + `spmm` (planned
    kernels); this op is the zero-preprocessing path (reference:
    src/ge-spmm/gespmm_csrcoo_v2.cu).
    """
    reduce = as_reduce(reduce)
    if row.shape != col.shape or row.ndim != 1:
        raise ValueError(
            f"row/col must be matching [nnz] vectors, got {row.shape} "
            f"vs {col.shape}")
    if dense.ndim != 2:
        raise ValueError(f"dense must be [N, F], got {dense.shape}")
    has_value = values is not None
    if not has_value:
        values = jnp.ones(row.shape, dense.dtype)
    elif values.shape != row.shape:
        raise ValueError(
            f"values must be [nnz={row.shape[0]}], got {values.shape}")
    return _spmm_coo(reduce, has_value, int(num_rows), (row, col), values,
                     dense)
