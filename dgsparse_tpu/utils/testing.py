"""Deterministic synthetic graphs + slow numpy oracles for the test suite.

The reference tests download live datasets (test/utils.py:15-46); we replace
those with seeded synthetic CSR graphs (including empty rows and skewed
degrees) so tests are hermetic, plus loaders for the bundled .mtx files when
present.
"""

from typing import Optional, Tuple

import numpy as np


def random_csr(
    num_rows: int,
    num_cols: int,
    avg_degree: float = 8.0,
    seed: int = 0,
    skew: float = 1.0,
    with_empty_rows: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Seeded random CSR (rowptr, col, values) with power-law-ish degrees."""
    rng = np.random.default_rng(seed)
    # Degrees: lognormal-skewed around avg_degree, some rows forced empty.
    deg = rng.lognormal(mean=np.log(max(avg_degree, 1.0)), sigma=skew,
                        size=num_rows)
    deg = np.minimum(deg.astype(np.int64), num_cols)
    if with_empty_rows:
        deg[rng.random(num_rows) < 0.05] = 0
    rowptr = np.zeros(num_rows + 1, np.int32)
    rowptr[1:] = np.cumsum(deg)
    nnz = int(rowptr[-1])
    col = np.empty(nnz, np.int32)
    for r in range(num_rows):
        d = int(deg[r])
        if d:
            col[rowptr[r]:rowptr[r + 1]] = np.sort(
                rng.choice(num_cols, size=d, replace=False)
            )
    values = rng.standard_normal(nnz).astype(np.float32)
    return rowptr, col, values


def spmm_oracle(
    rowptr: np.ndarray,
    col: np.ndarray,
    values: Optional[np.ndarray],
    dense: np.ndarray,
    reduce: str = "sum",
) -> np.ndarray:
    """Slow per-row numpy SpMM matching reference CUDA semantics
    (include/cuda/spmm_cuda.cuh:10-55): empty rows -> 0, mean /= degree."""
    m = len(rowptr) - 1
    out = np.zeros((m, dense.shape[1]), dense.dtype)
    for r in range(m):
        s, e = int(rowptr[r]), int(rowptr[r + 1])
        if s == e:
            continue
        contrib = dense[col[s:e]]
        if values is not None:
            contrib = contrib * values[s:e, None]
        if reduce == "sum":
            out[r] = contrib.sum(0)
        elif reduce == "mean":
            out[r] = contrib.mean(0)
        elif reduce == "max":
            out[r] = contrib.max(0)
        elif reduce == "min":
            out[r] = contrib.min(0)
        else:
            raise ValueError(reduce)
    return out


def gspmm_oracle(rowptr, col, values, dense, reduce, compute):
    """Semiring oracle: compute(edge, feat) then reduce."""
    m = len(rowptr) - 1
    out = np.zeros((m, dense.shape[1]), dense.dtype)
    for r in range(m):
        s, e = int(rowptr[r]), int(rowptr[r + 1])
        if s == e:
            continue
        feat = dense[col[s:e]]
        if values is None:
            c = feat
        else:
            ev = values[s:e, None]
            c = {
                "add": feat + ev,
                "sub": feat - ev,
                "mul": feat * ev,
                "div": feat / ev,
            }[compute]
        out[r] = {
            "sum": c.sum(0),
            "mean": c.mean(0),
            "max": c.max(0),
            "min": c.min(0),
        }[reduce]
    return out


def sddmm_oracle(rowptr, col, d1, d2, reduce="sum"):
    nnz = len(col)
    out = np.zeros(nnz, d1.dtype)
    m = len(rowptr) - 1
    for r in range(m):
        s, e = int(rowptr[r]), int(rowptr[r + 1])
        for p in range(s, e):
            out[p] = d1[r] @ d2[col[p]]
            if reduce == "mean":
                out[p] /= (e - s)
    return out


def load_mtx(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Tuple[int, int]]:
    """Minimal MatrixMarket coordinate reader -> CSR (rowptr, col, values)."""
    import scipy.io

    mat = scipy.io.mmread(path).tocsr()
    mat.sort_indices()
    return (
        mat.indptr.astype(np.int32),
        mat.indices.astype(np.int32),
        np.asarray(mat.data, np.float32),
        (int(mat.shape[0]), int(mat.shape[1])),
    )


def collective_volumes(fn, *args) -> dict:
    """Trace fn(*args) and sum the element counts moved by each collective
    primitive (ppermute / all_gather / psum / psum_scatter / all_to_all /
    reduce_scatter), recursing into sub-jaxprs (shard_map, jit, scan...).
    Counts are PER-DEVICE sends: inside shard_map the avals are
    shard-local, so an all_gather of [N/D, F] counts N/D * F.

    Used by the distributed tests to assert communication stays
    O(boundary) — e.g. a halo exchange whose volume silently grows to
    O(volume) still produces correct numbers, so only a volume assertion
    catches the regression.
    """
    import jax
    import jax.extend  # noqa: F401 — jax.extend.core needs the submodule import

    names = {"ppermute", "all_gather", "psum", "psum_scatter",
             "all_to_all", "reduce_scatter", "all_gather_invariant",
             "psum_invariant"}  # shard_map traces psum as psum_invariant
    # fold *_invariant spellings into the base name so callers see one key
    canon = {"all_gather_invariant": "all_gather", "psum_invariant": "psum"}
    totals: dict = {}

    def walk(jaxpr):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name in names:
                n = sum(int(np.prod(v.aval.shape))
                        for v in eqn.invars if hasattr(v, "aval")
                        and hasattr(v.aval, "shape"))
                key = canon.get(eqn.primitive.name, eqn.primitive.name)
                totals[key] = totals.get(key, 0) + n
            for v in eqn.params.values():
                if isinstance(v, jax.extend.core.ClosedJaxpr):
                    walk(v.jaxpr)
                elif isinstance(v, jax.extend.core.Jaxpr):
                    walk(v)
                elif isinstance(v, (tuple, list)):
                    for item in v:
                        if isinstance(item, jax.extend.core.ClosedJaxpr):
                            walk(item.jaxpr)
                        elif isinstance(item, jax.extend.core.Jaxpr):
                            walk(item)

    walk(jax.make_jaxpr(fn)(*args).jaxpr)
    return totals
