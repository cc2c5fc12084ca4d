"""p2p-Gnutella31 ROW_TILE forward decomposition (VERDICT r2 missing #2).

Attributes the ~700 us bucketed-ELL forward at F=32 component by
component with the fetch-synced two-point harness: full op, gather-only,
gather+einsum (no recombination), recombination alone, raw random-gather
floor, and the XLA fallback for reference.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgsparse_tpu.utils.cache import enable

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    feat = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    from dgsparse_tpu.core.planner import build_bucketed_ell_plan
    from dgsparse_tpu.kernels.pallas_spmm import (_ell_recombine,
                                                  spmm_bucketed_ell)
    from dgsparse_tpu.utils.bench import time_pytree_2pt
    from dgsparse_tpu.utils.testing import load_mtx

    rowptr, col, vals, (m, n) = load_mtx(
        "/root/reference/example/data/p2p-Gnutella31.mtx")
    nnz = len(col)
    plan = build_bucketed_ell_plan(rowptr, col, n)
    tot_slots = sum(rb * k for rb, k in zip(plan.rbs, plan.ks))
    crows = plan.concat_rows
    log(f"p2p nnz={nnz} buckets={len(plan.ks)} pad={plan.pad_ratio():.2f} "
        f"slots={tot_slots} concat_rows={crows}")
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((n, feat)).astype(np.float32))
    w_slot = jnp.asarray(rng.standard_normal(tot_slots).astype(np.float32))

    def t(fn, args, label):
        dt = time_pytree_2pt(fn, args, iters=(50, 250), repeats=3)
        log(f"  [{label:20s}] {dt*1e6:8.1f} us")
        return dt

    t(lambda x, p, w: spmm_bucketed_ell(p, None, x, w_slot=w),
      (b, plan, w_slot), "full (w_slot)")
    t(lambda x, p: spmm_bucketed_ell(p, None, x), (b, plan), "full (mask)")

    def gather_only(x, p):
        acc = jnp.float32(0)
        for cols_b, _, _, _, k in p.bucket_views():
            g = jnp.take(x, cols_b.reshape(-1), axis=0)
            acc += jnp.sum(g) * 1e-30
        return acc

    t(gather_only, (b, plan), "gather-only")

    def no_recombine(x, p, w):
        acc = jnp.float32(0)
        o2 = 0
        for cols_b, mask, _, _, k in p.bucket_views():
            rb = cols_b.shape[0]
            g = jnp.take(x, cols_b.reshape(-1), axis=0).reshape(rb, k, feat)
            ww = jax.lax.slice(w, (o2,), (o2 + rb * k,)).reshape(rb, k)
            o2 += rb * k
            acc += jnp.sum(jnp.einsum("mk,mkf->mf", ww, g,
                                      preferred_element_type=jnp.float32)
                           ) * 1e-30
        return acc

    t(no_recombine, (b, plan, w_slot), "gather+einsum")

    # recombination alone: gather [crows(+zeros), F] -> [M, F]
    concat = jnp.asarray(rng.standard_normal((crows, feat)).astype(
        np.float32))
    t(lambda c, p: _ell_recombine(p, c), (concat, plan), "recombine-only")

    # floors
    idx = jnp.asarray(rng.integers(0, n, tot_slots, np.int64).astype(
        np.int32))
    t(lambda x, i: jnp.sum(jnp.take(x, i, axis=0)) * 1e-30, (b, idx),
      "raw-gather floor")

    # XLA fallback for scale
    from dgsparse_tpu.kernels import xla as kx

    coo = jnp.asarray(np.repeat(np.arange(m, dtype=np.int32),
                                np.diff(rowptr)))
    vj = jnp.asarray(vals)
    t(lambda x, r, c, v: kx.spmm_forward(r, c, v, x, m,
                                         kx.ReduceOp.SUM)[0],
      (b, coo, jnp.asarray(col), vj), "xla-segment")


if __name__ == "__main__":
    main()
