"""Slot-space pipeline demo: SDDMM -> edge_softmax -> SpMM with NO
CSR-edge-order assembly between ops.

The reference's gspmm-fp example (example/gspmm-fp/util.py:17-110)
composes per-edge ops through [nnz] edge-order tensors; on TPU every
hop in/out of edge order is a random permutation gather (~20 ns/edge —
2.3 s at Reddit scale). ops/slot.py makes PLAN-SLOT order a public
value type (SlotValues), so chained pipelines stay in the layout the
kernels already use and pay the assembly permutation only at a true API
boundary (slots_to_edges).

Run: python examples/slot_pipeline.py [--nodes 4096]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=4096)
    ap.add_argument("--feat", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        from dgsparse_tpu.kernels import pallas_spmm as kp

        kp.set_interpret(True)

    from dgsparse_tpu import (SparseTensor, edge_softmax, edge_softmax_slots,
                              sddmm, sddmm_slots, slots_to_edges, spmm,
                              spmm_slots)
    from dgsparse_tpu.utils.testing import random_csr

    n = args.nodes
    rowptr, col, vals = random_csr(n, n, avg_degree=8.0, seed=0)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(n, n))
    rng = np.random.default_rng(1)
    d1 = jnp.asarray(rng.standard_normal((n, args.feat)).astype(np.float32))
    d2 = jnp.asarray(rng.standard_normal((n, args.feat)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((n, args.feat)).astype(np.float32))

    @jax.jit
    def chain_slots(d1, d2, x, spa):
        sv = sddmm_slots(spa, d1, d2)            # logits, slot order
        alpha = edge_softmax_slots(spa, sv)      # weights, slot order
        return spmm_slots(spa, alpha, x)         # aggregate

    @jax.jit
    def chain_edges(d1, d2, x, spa):
        z = sddmm(spa, d1, d2)                   # [nnz] edge order
        alpha = edge_softmax(spa, z)             # [nnz] edge order
        return spmm(spa.set_values(alpha), x, "sum")

    out_s = jax.block_until_ready(chain_slots(d1, d2, x, sp))
    out_e = jax.block_until_ready(chain_edges(d1, d2, x, sp))
    err = float(jnp.max(jnp.abs(out_s - out_e)))
    print(f"slot chain == edge chain: max|err| = {err:.2e}")
    assert err < 1e-3

    # the boundary converter, for consumers that need edge order
    alpha_edges = slots_to_edges(
        sp, edge_softmax_slots(sp, sddmm_slots(sp, d1, d2)))
    print(f"assembled edge-order weights: shape {alpha_edges.shape}, "
          f"row sums ~1: "
          f"{float(jnp.sum(alpha_edges)) / max(1, int(np.sum(np.diff(rowptr) > 0))):.3f}")

    for name, fn in (("slot ", chain_slots), ("edge ", chain_edges)):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(d1, d2, x, sp)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name} chain: {dt*1e3:.3f} ms/iter "
              f"(wall incl. dispatch; see bench_slot_chain.py for "
              f"on-device numbers)")


if __name__ == "__main__":
    main()
