"""Race stock JAX sparse (jax.experimental.sparse BCOO/BCSR) vs the
public AUTO path — the repo's first external comparator (VERDICT r4 #6),
the analog of the reference racing cuSPARSE in its own harness
(/root/reference/example/ge-spmm/spmm.cu:94-137).

Protocol identical to the headline bench: full-output correctness vs the
host oracle first, then two-point on-device timing (time_pytree_2pt) of
`mat @ dense`, GFLOPS = 2*nnz*F/t. The sparse operand is a TIMED
ARGUMENT (closure capture would embed index arrays as HLO constants).

Usage: python benchmark/bench_vs_jaxsparse.py
Writes benchmark/results_vs_jaxsparse.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgsparse_tpu.utils.cache import enable

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_graph(name, rowptr, col, feats, results):
    import jax.experimental.sparse as jsparse

    from dgsparse_tpu import SparseTensor, spmm
    from dgsparse_tpu.utils.bench import time_pytree_2pt
    from dgsparse_tpu.utils.testing import spmm_oracle

    m, n = len(rowptr) - 1, int(col.max()) + 1
    n = max(n, m)
    nnz = len(col)
    coo_row = np.repeat(np.arange(m, dtype=np.int32),
                        np.diff(rowptr).astype(np.int64))
    vals = np.ones(nnz, np.float32)

    t0 = time.perf_counter()
    sp = SparseTensor.from_csr(np.asarray(rowptr), np.asarray(col), None,
                               sparse_sizes=(m, n))
    log(f"[{name}] from_csr {time.perf_counter() - t0:.1f}s nnz={nnz}")
    bcoo = jsparse.BCOO(
        (jnp.asarray(vals),
         jnp.asarray(np.stack([coo_row, col.astype(np.int32)], axis=1))),
        shape=(m, n), indices_sorted=True, unique_indices=True)
    try:
        bcsr = jsparse.BCSR.from_bcoo(bcoo)
    except Exception as ex:  # BCSR availability varies by jax version
        log(f"[{name}] BCSR unavailable: {type(ex).__name__}: {ex}")
        bcsr = None

    rng = np.random.default_rng(0)
    for feat in feats:
        b = jnp.asarray(rng.standard_normal((n, feat)).astype(np.float32))
        ref = spmm_oracle(rowptr, col, None, np.asarray(b), "sum")

        def record(tag, fn, args):
            out = np.asarray(jax.device_get(jax.jit(fn)(*args)))
            np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)
            dt = time_pytree_2pt(fn, args, iters=(20, 100), repeats=3)
            gf = 2.0 * nnz * feat / dt / 1e9
            log(f"[{name}] F={feat:3d} {tag:18s} {dt*1e6:9.1f} us "
                f"{gf:7.2f} GF/s")
            results.append({"graph": name, "feat": feat, "impl": tag,
                            "nnz": int(nnz), "us": round(dt * 1e6, 1),
                            "gflops": round(gf, 2)})
            return dt

        t_ours = record("dgsparse AUTO", lambda x, s: spmm(s, x, "sum"),
                        (b, sp))
        t_bcoo = record("jax BCOO @", lambda x, mat: mat @ x, (b, bcoo))
        results.append({"graph": name, "feat": feat,
                        "speedup_vs_bcoo": round(t_bcoo / t_ours, 2)})
        if bcsr is not None:
            try:
                t_bcsr = record("jax BCSR @", lambda x, mat: mat @ x,
                                (b, bcsr))
                results[-1]["speedup_vs_bcsr"] = round(t_bcsr / t_ours, 2)
            except Exception as ex:
                log(f"[{name}] BCSR matmul failed: "
                    f"{type(ex).__name__}: {ex}")


def main():
    from dgsparse_tpu.utils.testing import load_mtx, random_csr

    jax.device_get(jnp.zeros((8,), jnp.float32) + 1.0)
    results = []
    mtx = "/root/reference/example/data/p2p-Gnutella31.mtx"
    if os.path.exists(mtx):
        rowptr, col, _, (m, n) = load_mtx(mtx)
        run_graph("p2p-Gnutella31", rowptr, col, (32, 128), results)
    rowptr, col, _ = random_csr(169343, 169343, avg_degree=6.9, seed=3,
                                skew=1.1)
    run_graph("arxiv-scale", rowptr, col, (32, 128), results)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_vs_jaxsparse.json")
    with open(out, "w") as fh:
        json.dump({"backend": jax.default_backend(), "rows": results},
                  fh, indent=1)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
