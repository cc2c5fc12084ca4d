"""Decompose SparseTensor construction time on the real TPU.

Round-1 pathology: 135.66 s to build plans for p2p-Gnutella31 (148K edges)
in the bench child. Hypotheses: (a) per-unique-shape host->device transfer
compiles under the axon tunnel (bucketed ELL has ~20 buckets x 4 arrays of
distinct shapes), (b) host-side numpy/native plan build, (c) eager op
compiles. This script times each stage separately.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgsparse_tpu.utils.cache import enable

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out) if isinstance(out, jax.Array) else None
    dt = time.perf_counter() - t0
    print(f"{label:55s} {dt*1e3:10.1f} ms", flush=True)
    return out


def main():
    from dgsparse_tpu.core import transform as T
    from dgsparse_tpu.core.planner import (build_bell_plan,
                                           build_bucketed_ell_plan,
                                           build_edge_tile_plan)
    from dgsparse_tpu.utils.testing import load_mtx

    mtx = "/root/reference/example/data/p2p-Gnutella31.mtx"
    rowptr, col, vals, (m, n) = t("load_mtx", lambda: load_mtx(mtx))
    print(f"M={m} nnz={len(col)}", flush=True)

    # stage 1: pure host work (numpy/native), no device involvement
    colptr, row_csc, perm = t("csr2csc_np (host)",
                              lambda: T.csr2csc_np(rowptr, col, n))
    t("expand_rowptr_np x2 (host)",
      lambda: (T.expand_rowptr_np(rowptr), T.expand_rowptr_np(colptr))[0])

    import dgsparse_tpu.core.planner as P

    # monkeypatch jnp.asarray inside planner to identity => host-only build
    real_asarray = P.jnp.asarray
    P.jnp.asarray = lambda x: x
    try:
        t("build_edge_tile_plan fwd (host only)",
          lambda: build_edge_tile_plan(rowptr, col, n, sort_cols=False))
        t("build_edge_tile_plan bwd (host only)",
          lambda: build_edge_tile_plan(colptr, row_csc, m, sort_cols=False))
        bek_host = t("build_bucketed_ell_plan (host only)",
                     lambda: build_bucketed_ell_plan(rowptr, col, n))
        print(f"  buckets={len(bek_host.ks)} pad={bek_host.pad_ratio():.2f}",
              flush=True)
        t("build_bell_plan fwd (host only)",
          lambda: build_bell_plan(rowptr, col, n))
    finally:
        P.jnp.asarray = real_asarray

    # stage 2: device transfers, one unique shape at a time
    x = np.zeros(len(col), np.int32)
    t("first transfer [nnz] i32", lambda: jnp.asarray(x))
    t("second transfer [nnz] i32 (same shape)", lambda: jnp.asarray(x + 1))
    y = np.zeros((1234, 77), np.float32)
    t("transfer unique shape [1234,77] f32", lambda: jnp.asarray(y))
    t("transfer unique shape [1233,77] f32",
      lambda: jnp.asarray(np.zeros((1233, 77), np.float32)))
    t("transfer unique shape [1232,77] f32",
      lambda: jnp.asarray(np.zeros((1232, 77), np.float32)))

    # stage 3: the full constructor as shipped
    from dgsparse_tpu import SparseTensor

    t("SparseTensor.from_csr FULL (plans+transfers)",
      lambda: SparseTensor.from_csr(rowptr, col, vals,
                                    sparse_sizes=(m, n)).storage.col())
    t("SparseTensor.from_csr AGAIN (warm)",
      lambda: SparseTensor.from_csr(rowptr, col, vals,
                                    sparse_sizes=(m, n)).storage.col())


if __name__ == "__main__":
    sys.exit(main())
