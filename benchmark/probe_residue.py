"""Probe: bucketed-ELL residue cost decomposition at Reddit scale.

The 3-tier hybrid's dense cells run 92M edges in ~4 ms; the 23M-edge
random residue costs ~420 ms — ~3x the 4.8 ns/row gather wall. This
probe isolates where the 3x goes: gather alone, gather+einsum,
recombination, and a bf16-table variant.
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
    log(f"graph nnz={nnz}")
    from dgsparse_tpu import native
    from dgsparse_tpu.core.planner import build_bucketed_ell_plan
    from dgsparse_tpu.kernels.pallas_spmm import (_ell_recombine,
                                                  spmm_bucketed_ell)
    from dgsparse_tpu.utils.bench import time_pytree_2pt

    t0 = time.perf_counter()
    nat = native.cell_split(rowptr, col, m, n, 128, 128, 96, 768, 65536)
    d_slot, d_eperm, cell_rb, cell_cw, bell_ids, res_ids = nat
    log(f"cell_split {time.perf_counter()-t0:.1f}s res={len(res_ids)/1e6:.1f}M")
    t0 = time.perf_counter()
    sub_deg = np.bincount(
        np.repeat(np.arange(m), np.diff(rowptr))[res_ids], minlength=m)
    sub_rowptr = np.concatenate([[0], np.cumsum(sub_deg)]).astype(np.int32)
    sub_col = col[res_ids]
    plan = build_bucketed_ell_plan(sub_rowptr, sub_col, n)
    tot_slots = sum(rb * k for rb, k in zip(plan.rbs, plan.ks))
    log(f"bucketed build {time.perf_counter()-t0:.1f}s "
        f"buckets={len(plan.ks)} pad={plan.pad_ratio():.2f} "
        f"slots={tot_slots/1e6:.1f}M")

    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((n, feat)).astype(np.float32))

    def t(fn, args, label, edges):
        dt = time_pytree_2pt(fn, args, iters=(10, 40), repeats=5)
        log(f"  [{label}] {dt*1e3:.1f} ms ({dt/max(edges,1)*1e9:.2f} ns/edge)")
        return dt

    # full residue op
    t(lambda x, p: spmm_bucketed_ell(p, None, x), (b, plan), "full",
      len(res_ids))

    # gather only (all buckets, chunked identically)
    def gather_only(x, p):
        acc = jnp.float32(0)
        for cols_b, _, _, _, k in p.bucket_views():
            g = jnp.take(x, cols_b.reshape(-1), axis=0)
            acc += jnp.sum(g) * 1e-30
        return acc

    t(gather_only, (b, plan), "gather-only", len(res_ids))

    # gather + einsum, no recombine
    def no_recombine(x, p):
        acc = jnp.float32(0)
        for cols_b, mask, _, _, k in p.bucket_views():
            rb = cols_b.shape[0]
            g = jnp.take(x, cols_b.reshape(-1), axis=0).reshape(rb, k, feat)
            o = jnp.einsum("mk,mkf->mf", mask, g,
                           preferred_element_type=jnp.float32)
            acc += jnp.sum(o) * 1e-30
        return acc

    t(no_recombine, (b, plan), "gather+einsum", len(res_ids))

    # bf16 table variant (halved gather bytes)
    t(lambda x, p: spmm_bucketed_ell(p, None, x.astype(jnp.bfloat16)),
      (b, plan), "full-bf16table", len(res_ids))

    # raw flat gather of the same slot count (the floor)
    flat_idx = jnp.asarray(
        rng.integers(0, n, tot_slots, dtype=np.int64).astype(np.int32))

    def raw(x, idx):
        return jnp.sum(jnp.take(x, idx, axis=0)) * 1e-30

    t(raw, (b, flat_idx), "raw-random-gather", tot_slots)


if __name__ == "__main__":
    main()
