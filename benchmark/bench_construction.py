"""Construction-time benchmark: SparseTensor.from_csr (CSC cache + all
plan building) at three scales. Closes the round-2 verdict item on
recording plan-construction cost next to the op throughput it buys.

The heavy lifting is host-side (native counting sorts in
native/dgsparse_host.cpp + numpy); the device transfer of the finished
plan arrays is included and reported separately via the backend field.

Usage: python benchmark/bench_construction.py [--skip-reddit]
Writes benchmark/results_construction_r3.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dgsparse_tpu import SparseTensor
    from dgsparse_tpu.utils.testing import load_mtx, random_csr

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_scale import clustered_graph

    jax.device_get(jnp.zeros((8,), jnp.float32) + 1.0)  # backend warm
    backend = jax.default_backend()
    results = []

    def run(name, rowptr, col, mode=True, repeats=2):
        m = len(rowptr) - 1
        nnz = len(col)
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            sp = SparseTensor.from_csr(np.asarray(rowptr), np.asarray(col),
                                       None, sparse_sizes=(m, m),
                                       build_plans=mode)
            # materialize: block on EVERY device array the construction
            # produced (plans included — on an async backend the plan
            # transfers can still be in flight when col lands)
            st = sp.storage
            leaves = jax.tree.leaves((
                st.col(), st.colptr(), st.plan(), st.plan(transpose=True),
                st.ell_plan(), st.bell_plan(), st.vslot()))
            jax.block_until_ready(
                [x for x in leaves if isinstance(x, jax.Array)])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            del sp
        mode_name = mode if isinstance(mode, str) else (
            "full" if mode else "none")
        log(f"[{name}] nnz={nnz} plans={mode_name}: {best:.2f}s")
        results.append({"graph": name, "nnz": nnz, "plans": mode_name,
                        "backend": backend, "seconds": round(best, 2)})

    mtx = "/root/reference/example/data/p2p-Gnutella31.mtx"
    if os.path.exists(mtx):
        rowptr, col, _, (m, n) = load_mtx(mtx)
        run("p2p-Gnutella31", rowptr, col)
    rowptr, col, _ = random_csr(169343, 169343, avg_degree=6.9, seed=3,
                                skew=1.1)
    run("arxiv-scale", rowptr, col)

    if "--skip-reddit" not in sys.argv:
        log("generating reddit-clustered (115M edges)...")
        rowptr, col = clustered_graph(232965, 232965, 492, seed=4)
        # default mode on a 115M-edge clustered graph = hybrid plan (ESC
        # skipped as redundant); lean "ell"-only and no-plan tiers below.
        run("reddit-clustered", rowptr, col, repeats=1)
        run("reddit-clustered", rowptr, col, mode="ell", repeats=1)
        run("reddit-clustered", rowptr, col, mode=False, repeats=1)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_construction_r3.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {out}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
