"""Public slot-space chain at Reddit scale (VERDICT r3 #4 done check).

The fused `gat_attention` measured 1.33 s fwd at 114.6M edges
(benchmark/results_attention_r3.json); the round-3 gap was that the
PUBLIC sddmm/edge_softmax/spmm consumers still paid the ~2.3 s
CSR-edge-order assembly between ops. ops/slot.py (round 4) makes slot
order a public value type — this bench measures the public chain

    sddmm_slots -> leaky -> edge_softmax_slots -> spmm_slots

on the same reddit-clustered graph / F=64 and reports it against the
fused kernel's recorded number (target: within 1.5x).

GAT logits (s_row[r] + s_col[c]) ride sddmm_slots as rank-2 dots:
dot([s_row_i, 1], [1, s_col_j]) = s_row_i + s_col_j.

Run: python benchmark/bench_slot_chain.py [--quick]
Writes benchmark/results_slot_chain.json.
"""

import argparse
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

FUSED_US = 1325056.7    # SLOT_FUSED fwd, results_attention_r3.json


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    from bench_scale import clustered_graph

    from dgsparse_tpu import (SparseTensor, edge_softmax_slots, sddmm_slots,
                              spmm_slots)
    from dgsparse_tpu.utils.bench import time_pytree_2pt

    m = n = 65_536 if args.quick else 232_965
    avg = 64 if args.quick else 492
    feat = 64
    rowptr, col = clustered_graph(m, n, avg, seed=4)
    nnz = len(col)
    t0 = time.perf_counter()
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               None, sparse_sizes=(m, n))
    log(f"reddit-clustered nnz={nnz} construction "
        f"{time.perf_counter()-t0:.1f}s")
    rng = np.random.default_rng(7)
    s_row = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    s_col = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((n, feat)).astype(np.float32))
    ones_m = jnp.ones((m, 1), jnp.float32)
    ones_n = jnp.ones((n, 1), jnp.float32)

    def leaky(v):
        return jnp.where(v >= 0, v, 0.2 * v)

    def chain(sr, sc, xx, spa):
        d1 = jnp.concatenate([sr[:, None], ones_m], axis=1)
        d2 = jnp.concatenate([ones_n, sc[:, None]], axis=1)
        sv = sddmm_slots(spa, d1, d2)
        sv = jax.tree.map(leaky, sv)
        alpha = edge_softmax_slots(spa, sv)
        return spmm_slots(spa, alpha, xx)

    rows = []

    def record(alg, dt):
        r = {"graph": "reddit-clustered", "alg": alg, "op": "slot-chain",
             "nnz": int(nnz), "feat": feat, "us": round(dt * 1e6, 1),
             "medges_s": round(nnz / dt / 1e6, 1),
             "vs_fused": round(dt * 1e6 / FUSED_US, 2)}
        log(f"  [{alg:22s}] {dt*1e6:12.1f} us  {r['medges_s']:8.1f} "
            f"Medge/s  ({r['vs_fused']}x fused)")
        return r

    dt = time_pytree_2pt(chain, (s_row, s_col, x, sp), iters=(2, 6),
                         repeats=3)
    rows.append(record("PUBLIC_SLOT_CHAIN fwd", dt))

    def fwdbwd(sr, sc, xx, spa):
        def f(a, b, c):
            out = chain(a, b, c, spa)
            return jnp.vdot(out, xx), out

        (_, out), grads = jax.value_and_grad(
            f, argnums=(0, 1, 2), has_aux=True)(sr, sc, xx)
        return out + grads[2]

    dt = time_pytree_2pt(fwdbwd, (s_row, s_col, x, sp), iters=(2, 6),
                         repeats=3)
    rows.append(record("PUBLIC_SLOT_CHAIN f+b", dt))

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_slot_chain.json")
    with open(out, "w") as fh:
        json.dump({"backend": jax.default_backend(), "fused_us": FUSED_US,
                   "rows": rows}, fh, indent=1)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
