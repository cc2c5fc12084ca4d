"""Recombine-step alternatives on the p2p headline plan (round 4).

The bucketed-ELL forward assembles bucket-order outputs and restores the
original row order with one [M, F] row gather (_ell_recombine) —
measured ~125 us of the ~670 us p2p@F=32 headline (probe_p2p.py). This
probe races the alternatives:

  g-fill   current: jnp.take(concat, inv_row, mode=fill)  (baseline)
  g-clip   zeros block appended + clip-mode take
  scatter  zeros.at[plan.rows].set(concat, unique+indices sorted flags)
  dus      per-bucket dynamic_update_slice into a row-sorted buffer —
           only measurable as an upper bound (needs contiguous rows; we
           time the raw DUS cost to see if a plan-side relayout could
           ever pay)

Run: python benchmark/probe_recombine.py [F=32]
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
    from dgsparse_tpu.kernels.pallas_spmm import _ell_recombine
    from dgsparse_tpu.utils.bench import time_pytree_2pt
    from dgsparse_tpu.utils.testing import load_mtx

    rowptr, col, vals, (m, n) = load_mtx(
        "/root/reference/example/data/p2p-Gnutella31.mtx")
    plan = build_bucketed_ell_plan(rowptr, col, n)
    crows = plan.concat_rows
    log(f"p2p M={m} concat_rows={crows} feat={feat}")
    rng = np.random.default_rng(0)
    concat = jnp.asarray(
        rng.standard_normal((crows, feat)).astype(np.float32))

    def t(fn, args, label):
        dt = time_pytree_2pt(fn, args, iters=(50, 250), repeats=3)
        log(f"  [{label:22s}] {dt*1e6:8.1f} us")
        return dt

    t(lambda c, p: _ell_recombine(p, c), (concat, plan), "g-fill (current)")

    def g_clip(c, p):
        z = jnp.zeros((m - crows if m > crows else 1, feat), c.dtype)
        full = jnp.concatenate([c, z], axis=0)
        return jnp.take(full, p.inv_row, axis=0, mode="clip")

    t(g_clip, (concat, plan), "g-clip+zeros")

    def scat(c, p):
        out = jnp.zeros((m, feat), c.dtype)
        return out.at[p.rows].set(c, unique_indices=True,
                                  indices_are_sorted=False)

    t(scat, (concat, plan), "scatter-set")

    # correctness: scatter == gather for nonempty rows, zeros elsewhere
    a = np.asarray(jax.device_get(_ell_recombine(plan, concat)))
    b = np.asarray(jax.device_get(scat(concat, plan)))
    log(f"  scatter max|err| = {np.max(np.abs(a - b)):.2e}")

    # upper bound for a contiguous relayout: one DUS of the whole block
    def dus(c):
        out = jnp.zeros((m, feat), c.dtype)
        return jax.lax.dynamic_update_slice(out, c, (0, 0))

    t(dus, (concat,), "dus floor (contig)")


if __name__ == "__main__":
    main()
