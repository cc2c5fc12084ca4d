"""Measure the two remaining 'asserted, not measured' claims (round 4):

1. tiny/odd F (7, 12): the padded lane-pack schedule
   (kernels/pallas_spmm._pack_pad_width — replaces the reference's
   dedicated N in {1..32} kernel matrix, src/ge-spmm/gespmm_v2.cu:7-56)
   vs the XLA_SEGMENT fallback those widths used to ride.
2. non-transpose layout (column-major B/C —
   src/ge-spmm/csrspmm_non_transpose.cu): ge_spmm.py serves it via
   `.T` on both sides and claims XLA absorbs the layout change; measure
   gespmmCsrSpMM(transpose=False) vs transpose=True at equal FLOPs.

Both on the bundled p2p-Gnutella31.mtx (the reference's headline graph).

Run on TPU: python benchmark/probe_smallf_nt.py
Writes benchmark/results_smallf_nt.json
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgsparse_tpu.utils.cache import enable as _enable_cache

_enable_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from dgsparse_tpu import Algorithm, SparseTensor, spmm
    from dgsparse_tpu.ge_spmm import SpMatCsrDescr_t, gespmmCsrSpMM
    from dgsparse_tpu.utils.bench import time_pytree_2pt
    from dgsparse_tpu.utils.testing import load_mtx, spmm_oracle

    mtx = "/root/reference/example/data/p2p-Gnutella31.mtx"
    rowptr, col, _vals, (m, n) = load_mtx(mtx)
    nnz = len(col)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               None, (m, n))
    rng = np.random.default_rng(0)
    rows = []

    # --- 1) tiny/odd F ---
    for f in (7, 12, 32):
        b = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
        ref = spmm_oracle(rowptr, col, None, np.asarray(b), "sum")
        for alg in (Algorithm.PALLAS_ROW_TILE, Algorithm.XLA_SEGMENT):
            out = np.asarray(jax.device_get(spmm(sp, b, "sum", alg)))
            err = float(np.abs(out - ref).max() / np.abs(ref).max())
            assert err < 1e-4, (f, alg, err)
            dt = time_pytree_2pt(lambda x: spmm(sp, x, "sum", alg), (b,),
                                 iters=(50, 250), repeats=3)
            gf = 2.0 * nnz * f / dt / 1e9
            log(f"F={f:3d} {alg.name:16s} {dt*1e6:9.1f} us  {gf:6.2f} GF/s")
            rows.append({"probe": "tiny_f", "feat": f, "alg": alg.name,
                         "us": dt * 1e6, "gflops": gf})

    # --- 2) non-transpose layout ---
    d = SpMatCsrDescr_t(nrow=m, ncol=n, nnz=nnz,
                        indptr=jnp.asarray(rowptr),
                        indices=jnp.asarray(col), data=None)
    f = 32
    b_rm = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    b_cm = b_rm.T  # [N, ncol] column-major-role operand
    ref = spmm_oracle(rowptr, col, None, np.asarray(b_rm), "sum")
    out_t = np.asarray(jax.device_get(gespmmCsrSpMM(d, b_rm)))
    out_nt = np.asarray(jax.device_get(
        gespmmCsrSpMM(d, b_cm, transpose=False))).T
    for name, o in (("T", out_t), ("NT", out_nt)):
        err = float(np.abs(o - ref).max() / np.abs(ref).max())
        assert err < 1e-4, (name, err)
    dt_t = time_pytree_2pt(lambda x: gespmmCsrSpMM(d, x), (b_rm,),
                           iters=(50, 250), repeats=3)
    dt_nt = time_pytree_2pt(
        lambda x: gespmmCsrSpMM(d, x, transpose=False), (b_cm,),
        iters=(50, 250), repeats=3)
    for name, dt in (("transpose=True", dt_t), ("transpose=False", dt_nt)):
        gf = 2.0 * nnz * f / dt / 1e9
        log(f"{name:16s} F={f} {dt*1e6:9.1f} us  {gf:6.2f} GF/s")
        rows.append({"probe": "non_transpose", "feat": f, "variant": name,
                     "us": dt * 1e6, "gflops": gf})
    rows.append({"probe": "nt_ratio", "nt_over_t": dt_nt / dt_t})
    log(f"non-transpose / transpose ratio: {dt_nt/dt_t:.2f}x")

    out_path = os.path.join(os.path.dirname(__file__),
                            "results_smallf_nt.json")
    with open(out_path, "w") as fh:
        json.dump({"backend": jax.default_backend(), "rows": rows}, fh,
                  indent=1)
    log("wrote", out_path)


if __name__ == "__main__":
    main()
