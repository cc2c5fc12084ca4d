"""Heavy-tail Reddit, beyond the F=64 sum row (round 5).

BENCHMARKS §2f established that the public AUTO sum path survives a
real-Reddit degree tail (20K-degree hubs, top-1 % rows = 19 % of mass).
This probe widens the evidence on the SAME storage object:

  - AUTO sum fp32 F=128      (hybrid chunked, wider features)
  - AUTO sum bf16 F=64       (bf16 input tier under the tail)
  - MAX  fp32 F=64           (argmax winner machinery: hub rows put up
                              to 20K candidates behind one output row —
                              the exact stress VERDICT r4 #3 named)
  - MEAN fp32 F=64           (hybrid tier with degree division)

Reference analog: include/cuda/spmm_cuda.cuh:10-55 (sum/mean rows) and
:400-433 (max with argmax residuals); real-data policy substituted per
/root/reference/test/utils.py:15-46 (zero egress).

Run: python benchmark/probe_heavytail_ext.py
Writes benchmark/results_heavytail_ext_r5.json.
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


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_scale import heavytail_graph

    from dgsparse_tpu import SparseTensor, spmm
    from dgsparse_tpu.utils.bench import time_pytree_2pt

    m = 232_965
    rowptr, col = heavytail_graph(m, m, 492, seed=6)
    nnz = len(col)
    jax.device_get(jnp.zeros((8,), jnp.float32) + 1.0)
    t0 = time.perf_counter()
    sp = SparseTensor.from_csr(rowptr, col, None, sparse_sizes=(m, m))
    log(f"from_csr {time.perf_counter() - t0:.1f}s "
        f"plan={type(sp.storage.ell_plan()).__name__}")

    rng = np.random.default_rng(1)
    rows = []

    def t(label, reduce, feat, dtype, iters=(3, 9)):
        b = jnp.asarray(rng.standard_normal((m, feat)).astype(np.float32))
        if dtype == "bf16":
            b = b.astype(jnp.bfloat16)
        dt = time_pytree_2pt(lambda x, s: spmm(s, x, reduce), (b, sp),
                             iters=iters, repeats=3)
        gf = 2.0 * nnz * feat / dt / 1e9
        log(f"  [{label:22s}] {dt*1e3:8.1f} ms  {gf:6.2f} GF/s")
        rows.append({"graph": "reddit-heavytail", "op": label,
                     "reduce": reduce, "feat": feat, "dtype": dtype,
                     "nnz": int(nnz), "ms": round(dt * 1e3, 1),
                     "gflops": round(gf, 2)})

    t("AUTO sum f32 F=128", "sum", 128, "f32")
    t("AUTO sum bf16 F=64", "sum", 64, "bf16")
    t("AUTO max f32 F=64", "max", 64, "f32", iters=(2, 6))
    t("AUTO mean f32 F=64", "mean", 64, "f32")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_heavytail_ext_r5.json")
    with open(out, "w") as fh:
        json.dump({"backend": jax.default_backend(), "rows": rows}, fh,
                  indent=1)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
