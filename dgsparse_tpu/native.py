"""ctypes bindings for the native host library (native/dgsparse_host.cpp).

The library is built on demand with `make` (g++); every entry point has a
numpy fallback, so the package works without a toolchain. The native paths
matter for large graphs/point clouds where one-time plan construction would
otherwise dominate (the reference pays the same cost in cuSPARSE/thrust/GPU
hash kernels at construction time).
"""

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native")


def _packaged_so() -> str:
    """Installed location: setup.py copies the .so into the package as
    package data (wheel/conda/docker installs have no native/ source
    tree next to site-packages)."""
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "libdgsparse_host.so")


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_native_dir(), "libdgsparse_host.so")
    src = os.path.join(_native_dir(), "dgsparse_host.cpp")
    if os.path.exists(src):
        # Dev checkout: rebuild when missing OR stale (source newer than
        # the binary) so an old artifact can never silently shadow the
        # checked-in C++ source.
        stale = (not os.path.exists(so)
                 or os.path.getmtime(src) > os.path.getmtime(so))
        if stale:
            try:
                subprocess.run(["make", "-B", "-C", _native_dir()],
                               check=True, capture_output=True, timeout=120)
            except Exception:
                if not os.path.exists(so):
                    so = _packaged_so()
    else:
        # Installed package: the .so ships as package data next to this
        # module (ADVICE r3: the docker/conda paths built it but never
        # shipped it, silently falling back to numpy planners).
        so = _packaged_so()
    if not os.path.exists(so):
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.dg_csr2csc.argtypes = [_I32P, _I32P, ctypes.c_int32,
                                   ctypes.c_int32, ctypes.c_int64, _I32P,
                                   _I32P, _I32P]
        lib.dg_plan_count.argtypes = [_I32P, ctypes.c_int32, ctypes.c_int32,
                                      ctypes.c_int32]
        lib.dg_plan_count.restype = ctypes.c_int64
        lib.dg_plan_fill.argtypes = [_I32P, _I32P, ctypes.c_int32,
                                     ctypes.c_int32, ctypes.c_int32,
                                     ctypes.c_int32, _I32P, _I32P, _I32P,
                                     _I32P]
        lib.dg_rulebook_subm.argtypes = [_I32P, ctypes.c_int64,
                                         ctypes.c_int32, ctypes.c_int32,
                                         ctypes.c_int32, _I32P,
                                         ctypes.c_int32, _I32P, _I32P,
                                         _I64P]
        lib.dg_rulebook_subm.restype = ctypes.c_int64
        lib.dg_rulebook_strided.argtypes = [
            _I32P, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            _I32P, _I32P, _I32P, _I32P, _I64P]
        lib.dg_rulebook_strided.restype = ctypes.c_int64
        lib.dg_cell_split_count.argtypes = [
            _I32P, _I32P, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            _I64P]
        lib.dg_cell_split_fill.argtypes = [
            _I32P, _I32P, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            _I32P, _I32P, _I32P, _I32P, _I32P, _I32P]
        lib.dg_version.restype = ctypes.c_int32
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return load() is not None


def csr2csc(rowptr: np.ndarray, col: np.ndarray, num_rows: int,
            num_cols: int) -> Optional[Tuple[np.ndarray, np.ndarray,
                                             np.ndarray]]:
    lib = load()
    if lib is None:
        return None
    nnz = len(col)
    colptr = np.zeros(num_cols + 1, np.int32)
    row = np.empty(nnz, np.int32)
    perm = np.empty(nnz, np.int32)
    lib.dg_csr2csc(np.ascontiguousarray(rowptr, np.int32),
                   np.ascontiguousarray(col, np.int32),
                   num_rows, num_cols, nnz, colptr, row, perm)
    return colptr, row, perm


def plan_edge_tiles(rowptr: np.ndarray, col: np.ndarray, edge_tile: int,
                    row_block: int, sort_cols: bool = True):
    """Native edge-tile plan; returns (cols, eperm, lrow, tile_rb) or None."""
    lib = load()
    if lib is None:
        return None
    rowptr = np.ascontiguousarray(rowptr, np.int32)
    col = np.ascontiguousarray(col, np.int32)
    nrow = len(rowptr) - 1
    t = int(lib.dg_plan_count(rowptr, nrow, edge_tile, row_block))
    cols = np.empty(t * edge_tile, np.int32)
    eperm = np.empty(t * edge_tile, np.int32)
    lrow = np.empty(t * edge_tile, np.int32)
    tile_rb = np.empty(t, np.int32)
    lib.dg_plan_fill(rowptr, col, nrow, edge_tile, row_block,
                     int(sort_cols), cols, eperm, lrow, tile_rb)
    return cols, eperm, lrow, tile_rb


def cell_split(rowptr: np.ndarray, col: np.ndarray, num_rows: int,
               num_cols: int, row_block: int, col_window: int,
               min_cell: int, dense_min: int, max_cells: int):
    """Native 3-tier hybrid cell split (counting sorts, O(nnz + cells)).

    Returns (d_slot, d_eperm, cell_rb, cell_cw, bell_ids, res_ids) or None
    (no lib, or the cell grid is too large for the per-cell count array).
    d_slot/d_eperm are slot-sorted with CSR-stable ties — identical layout
    to the numpy twin in core/planner.build_dense_cell_plan."""
    lib = load()
    if lib is None:
        return None
    nrb = max(-(-num_rows // row_block), 1)
    ncw = max(-(-num_cols // col_window), 1)
    if nrb * ncw > (1 << 28):     # per-cell count array would exceed ~1 GB
        return None
    rowptr = np.ascontiguousarray(rowptr, np.int32)
    col = np.ascontiguousarray(col, np.int32)
    sizes = np.zeros(5, np.int64)
    lib.dg_cell_split_count(rowptr, col, num_rows, num_cols, row_block,
                            col_window, min_cell, dense_min, max_cells,
                            sizes)
    n_dense, n_bell, n_res, n_sel, _ = (int(x) for x in sizes)
    d_slot = np.empty(n_dense, np.int32)
    d_eperm = np.empty(n_dense, np.int32)
    cell_rb = np.empty(n_sel, np.int32)
    cell_cw = np.empty(n_sel, np.int32)
    bell_ids = np.empty(n_bell, np.int32)
    res_ids = np.empty(n_res, np.int32)
    lib.dg_cell_split_fill(rowptr, col, num_rows, num_cols, row_block,
                           col_window, min_cell, dense_min, max_cells,
                           d_slot, d_eperm, cell_rb, cell_cw, bell_ids,
                           res_ids)
    return d_slot, d_eperm, cell_rb, cell_cw, bell_ids, res_ids


def rulebook_subm(coords: np.ndarray, ks: Tuple[int, int, int],
                  spatial: Tuple[int, int, int], separate_mid: bool):
    """Native submanifold rulebook; returns (imaps, omaps, knnz) lists or
    None."""
    lib = load()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, np.int32)
    n = len(coords)
    k_vol = ks[0] * ks[1] * ks[2]
    imap = np.empty(k_vol * n, np.int32)
    omap = np.empty(k_vol * n, np.int32)
    knnz = np.zeros(k_vol, np.int64)
    lib.dg_rulebook_subm(coords, n, ks[0], ks[1], ks[2],
                         np.ascontiguousarray(spatial, np.int32),
                         int(separate_mid), imap, omap, knnz)
    imaps = [imap[kp * n: kp * n + knnz[kp]].copy() for kp in range(k_vol)]
    omaps = [omap[kp * n: kp * n + knnz[kp]].copy() for kp in range(k_vol)]
    return imaps, omaps, [int(x) for x in knnz]


def rulebook_strided(coords: np.ndarray, ks, st, pad, spatial):
    """Native strided rulebook; returns (out_coords, imaps, omaps, knnz)
    or None."""
    lib = load()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, np.int32)
    n = len(coords)
    k_vol = ks[0] * ks[1] * ks[2]
    out_coords = np.empty((n * k_vol, 4), np.int32)
    imap = np.empty(k_vol * n, np.int32)
    omap = np.empty(k_vol * n, np.int32)
    knnz = np.zeros(k_vol, np.int64)
    num_out = lib.dg_rulebook_strided(
        coords, n, ks[0], ks[1], ks[2], st[0], st[1], st[2],
        pad[0], pad[1], pad[2], np.ascontiguousarray(spatial, np.int32),
        out_coords, imap, omap, knnz)
    imaps = [imap[kp * n: kp * n + knnz[kp]].copy() for kp in range(k_vol)]
    omaps = [omap[kp * n: kp * n + knnz[kp]].copy() for kp in range(k_vol)]
    return (out_coords[:num_out].copy(), imaps, omaps,
            [int(x) for x in knnz])
