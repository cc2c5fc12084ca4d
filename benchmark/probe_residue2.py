"""Residue (bucketed-ELL) decomposition at Reddit scale, round 2.

Variants all end in the REAL consumer (recombination) — isolated
sum-consumed variants are algebraically collapsed by XLA (see
docs/BENCHMARKS.md §1b). Tests: f32 vs bf16 gather table, and gather
chunk-budget sensitivity.
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

from probe_cells import clustered_graph, log  # noqa: E402


def main():
    m = n = 232965
    feat = 64
    rowptr, col = clustered_graph(m, n, 115e6 / m)
    nnz = len(col)
    from dgsparse_tpu import native
    from dgsparse_tpu.core.planner import build_bucketed_ell_plan
    from dgsparse_tpu.kernels import pallas_spmm as kp
    from dgsparse_tpu.utils.bench import time_pytree_2pt

    t0 = time.perf_counter()
    nat = native.cell_split(rowptr, col, m, n, 128, 128, 96, 768, 65536)
    _, _, _, _, bell_ids, res_ids = nat
    sub_deg = np.bincount(
        np.repeat(np.arange(m), np.diff(rowptr))[res_ids], minlength=m)
    sub_rowptr = np.concatenate([[0], np.cumsum(sub_deg)]).astype(np.int32)
    plan = build_bucketed_ell_plan(sub_rowptr, col[res_ids], n)
    tot = sum(rb * k for rb, k in zip(plan.rbs, plan.ks))
    log(f"residue {len(res_ids)/1e6:.1f}M edges, slots {tot/1e6:.1f}M, "
        f"buckets ks={plan.ks} build {time.perf_counter()-t0:.1f}s")
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((n, feat)).astype(np.float32))

    def t(label, fn, args):
        t0 = time.perf_counter()
        dt = time_pytree_2pt(fn, args, iters=(2, 6), repeats=2)
        log(f"  [{label:24s}] {dt*1e3:8.1f} ms "
            f"({dt/len(res_ids)*1e9:.2f} ns/edge) "
            f"[wall {time.perf_counter()-t0:.0f}s]")
        return dt

    budgets = [(256 << 20, "256MB")]
    if len(sys.argv) > 1 and sys.argv[1] == "budgets":
        budgets = [(64 << 20, "64MB"), (1 << 30, "1GB")]
    for budget, tag in budgets:
        kp._GATHER_BUDGET_BYTES = budget
        t(f"f32 budget={tag}",
          lambda x, p: kp.spmm_bucketed_ell(p, None, x), (b, plan))
    kp._GATHER_BUDGET_BYTES = 256 << 20
    if not (len(sys.argv) > 1 and sys.argv[1] == "budgets"):
        t("bf16 table budget=256MB",
          lambda x, p: kp.spmm_bucketed_ell(p, None, x.astype(jnp.bfloat16)),
          (b, plan))

    # gather-only with a REAL consumer: the recombination row gather of
    # per-chunk row-sums is replaced by simply emitting the gathered rows
    # of ONE representative chunk into the output — lower bound per chunk
    cols0 = plan.bucket_views()[-1][0]  # largest bucket
    rbq, kq = cols0.shape
    rows_per = max((256 << 20) // (4 * feat) // kq, 1)
    sl = cols0[:rows_per].reshape(-1)
    one = jnp.asarray(np.asarray(sl))

    def chunk_gather(x, idx):
        return jnp.take(x, idx, axis=0)  # full output materialized

    dt = time_pytree_2pt(chunk_gather, (b, one), iters=(4, 12), repeats=3)
    log(f"  one-chunk raw gather: {dt*1e3:.1f} ms for {len(sl)} rows "
        f"({dt/len(sl)*1e9:.2f} ns/row)")


if __name__ == "__main__":
    main()
