"""Stage-level timing of build_hybrid_plan at Reddit scale (host-only).

VERDICT r2 item 5: 115M-edge construction must go < 60 s. bench_scale
measured 422 s for build_hybrid_plan — this breaks it into stages.
Caches the generated graph in /tmp so re-profiling skips the ~4 min
generation.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


CACHE = "/tmp/reddit_clustered_seed4.npz"


def graph():
    if os.path.exists(CACHE):
        d = np.load(CACHE)
        return d["rowptr"], d["col"]
    from bench_scale import clustered_graph

    t0 = time.perf_counter()
    rowptr, col = clustered_graph(232965, 232965, 492, seed=4)
    log(f"generated in {time.perf_counter()-t0:.0f}s")
    np.savez(CACHE, rowptr=rowptr, col=col)
    return rowptr, col


class T:
    def __init__(self):
        self.t0 = time.perf_counter()

    def lap(self, label):
        t = time.perf_counter()
        log(f"  {label:40s} {t - self.t0:8.1f}s")
        self.t0 = t


def main():
    rowptr, col = graph()
    m = len(rowptr) - 1
    n = m
    nnz = len(col)
    log(f"graph {m} nodes {nnz} edges")

    import dgsparse_tpu.core.planner as P
    from dgsparse_tpu import native

    t = T()
    deg = np.diff(rowptr)
    coo_row = np.repeat(np.arange(m, dtype=np.int32), deg)
    t.lap("coo_row expand")
    nat = native.cell_split(rowptr, col, m, n, 128, 128, 96, 768, 65536)
    d_slot, d_eperm, cell_rb, cell_cw, bell_edges, res_ids = nat
    t.lap(f"native cell_split (dense={len(d_slot)/1e6:.1f}M "
          f"bell={len(bell_edges)/1e6:.1f}M res={len(res_ids)/1e6:.1f}M)")

    t_order = np.lexsort((cell_rb, cell_cw)).astype(np.int32)
    t.lap("cells t_order lexsort")

    def sub_csr(ids):
        ids = np.asarray(ids)
        sub_col = col[ids]
        sub_deg = np.bincount(coo_row[ids], minlength=m)
        sub_rowptr = np.zeros(m + 1, np.int64)
        sub_rowptr[1:] = np.cumsum(sub_deg)
        return (sub_rowptr.astype(np.int32), sub_col,
                ids.astype(np.int32, copy=False))

    if len(bell_edges):
        b_rowptr, b_col, b_ids = sub_csr(bell_edges)
        t.lap("bell sub_csr")
        bell = P.build_bell_plan(b_rowptr, b_col, n, edge_tile=256,
                                 row_block=128, col_window=128)
        t.lap(f"build_bell_plan ({bell.num_tiles} tiles)")

    e_rowptr, e_col, e_ids = sub_csr(res_ids)
    t.lap("residue sub_csr")
    ell = P.build_bucketed_ell_plan(e_rowptr, e_col, n)
    t.lap(f"build_bucketed_ell_plan (ks={ell.ks})")

    nd_ids = np.sort(np.concatenate([
        np.asarray(bell_edges, np.int32), np.asarray(res_ids, np.int32)]))
    t.lap("nd_ids sort")
    nd_rowptr, nd_col, nd_ids = sub_csr(nd_ids)
    t.lap("nd sub_csr")
    tr = native.csr2csc(nd_rowptr, nd_col, m, n)
    t.lap("native csr2csc (transpose)")
    if tr is not None:
        colptr_t, row_t, perm_t = tr
        ell_t = P.build_bucketed_ell_plan(colptr_t, row_t, m)
        t.lap(f"transpose bucketed ELL (ks={ell_t.ks})")

    # full call for comparison
    t0 = time.perf_counter()
    plan = P.build_hybrid_plan(rowptr, col, n)
    log(f"  full build_hybrid_plan: {time.perf_counter()-t0:.1f}s "
        f"(None={plan is None})")


if __name__ == "__main__":
    main()
