"""nchunks A/B for the column-chunked gather (round 4).

results_scale_lean_r4.json measured chunked x16 at 5.9 ns/slot on
reddit-random — well above the 2.1-2.7 ns/row chunked-gather rate —
implying the per-chunk [M, F] partial accumulation, not the gather,
now binds. Fewer chunks with the LARGEST slices that stay under the
~16 MB gather cliff cut partial traffic proportionally. Interleave
nchunks in {4, 8, 16} on reddit-random (uniform columns, worst case)
through spmm_col_chunked_ell, plus the flat plan as control.

Run: python benchmark/probe_nchunks.py
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
    from benchmark.bench_scale import clustered_graph
    from dgsparse_tpu.core.planner import (build_col_chunked_ell_plan,
                                           build_ell_plan)
    from dgsparse_tpu.kernels.pallas_spmm import (spmm_col_chunked_ell,
                                                  spmm_ell)
    from dgsparse_tpu.ops.types import ReduceOp
    from dgsparse_tpu.utils.bench import time_pytree_2pt

    m = 232965
    feat = 64
    t0 = time.perf_counter()
    # intra=0.0 => uniform random columns (bench_scale's reddit-random)
    rowptr, col = clustered_graph(m, m, 492, seed=5, intra=0.0)
    nnz = len(col)
    log(f"graph {time.perf_counter()-t0:.1f}s nnz={nnz}")
    t0 = time.perf_counter()
    flat = build_ell_plan(rowptr, col, m)
    plans = {}
    for nc in (4, 8, 16):
        plans[nc] = build_col_chunked_ell_plan(rowptr, col, m, nc)
        log(f"nchunks={nc} pad={plans[nc].pad_ratio():.3f} "
            f"slice={(m // nc) * feat * 4 / 2**20:.1f} MB")
    log(f"plans {time.perf_counter()-t0:.1f}s flat_pad={flat.pad_ratio():.3f}")
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((m, feat)).astype(np.float32))
    results = {}
    for rnd in range(3):
        dt = time_pytree_2pt(
            lambda x, p: spmm_ell(p, None, x, ReduceOp.SUM), (b, flat),
            iters=(2, 6), repeats=1)
        log(f"  [flat      ] r{rnd} {dt*1e3:8.1f} ms "
            f"({2*nnz*feat/dt/1e9:6.1f} GF/s)")
        results.setdefault("flat", []).append(dt * 1e3)
        for nc in (4, 8, 16):
            dt = time_pytree_2pt(
                lambda x, p: spmm_col_chunked_ell(p, None, x,
                                                  ReduceOp.SUM),
                (b, plans[nc]), iters=(2, 6), repeats=1)
            log(f"  [chunked x{nc:<2d}] r{rnd} {dt*1e3:8.1f} ms "
                f"({2*nnz*feat/dt/1e9:6.1f} GF/s)")
            results.setdefault(f"x{nc}", []).append(dt * 1e3)
    out = {k: {"ms": [round(x, 1) for x in v], "min_ms": round(min(v), 1)}
           for k, v in results.items()}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
