"""A/B the lane-packed ELL K-sum (pallas_spmm.set_lane_pack) on the
headline graphs: p2p-Gnutella31 F=32 (the driver metric) and an
arxiv-scale graph at F=64 (g=2 fold).

Usage: python benchmark/probe_lanepack.py [feat ...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgsparse_tpu.utils.cache import enable

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from dgsparse_tpu import Algorithm, SparseTensor, spmm
    from dgsparse_tpu.kernels import pallas_spmm as kp
    from dgsparse_tpu.utils.bench import time_pytree_2pt
    from dgsparse_tpu.utils.testing import load_mtx, random_csr

    jax.device_get(jnp.zeros((8,), jnp.float32) + 1.0)   # backend warm
    results = []
    graphs = []
    mtx = "/root/reference/example/data/p2p-Gnutella31.mtx"
    if os.path.exists(mtx):
        rowptr, col, vals, (m, n) = load_mtx(mtx)
        graphs.append(("p2p-Gnutella31", rowptr, col, vals, m, n, (32, 64)))
    rowptr, col, vals = random_csr(169343, 169343, avg_degree=6.9, seed=3,
                                   skew=1.1)
    graphs.append(("arxiv-scale", rowptr, col, np.abs(vals), 169343,
                   169343, (64,)))

    for name, rowptr, col, vals, m, n, feats in graphs:
        sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                                   jnp.asarray(vals), sparse_sizes=(m, n))
        nnz = len(col)
        rng = np.random.default_rng(0)
        for f in feats:
            b = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
            for packed in (False, True):
                kp.set_lane_pack(packed)
                try:
                    dt = time_pytree_2pt(
                        lambda x: spmm(sp, x, "sum",
                                       Algorithm.PALLAS_ROW_TILE), (b,),
                        iters=(50, 250), repeats=3)
                    gf = 2 * nnz * f / dt / 1e9
                    log(f"{name} F={f} packed={packed}: "
                        f"{dt*1e6:8.1f} us  {gf:6.2f} GF/s")
                    results.append({"graph": name, "feat": f,
                                    "packed": packed,
                                    "us": round(dt * 1e6, 1),
                                    "gflops": round(gf, 2)})
                finally:
                    kp.set_lane_pack(False)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
