"""Round-5 p2p@F=32 residual attack (VERDICT r4 #2).

The packed bucketed-ELL forward runs 553-724 us against a measured
274+120 us gather+recombine floor; the HLO attribution (BENCHMARKS
1c-bis) prices the residual as B repack (~70 us) + K-sum passes
(~40 us) + dispatch. Candidate reformulations, all A/B'd in ONE session
against the public path:

  A  public spmm, lane-pack ON  (baseline)
  B  public spmm, lane-pack OFF (baseline)
  C  deferred g-fold: bucket outputs stay packed [rb,128]; ONE recombine
     gather at 512 B/row folds the g groups in its consumer (removes the
     per-bucket fold passes; tests whether the recombine gather is
     row-priced at 4x the bytes)
  D  transposed-space pipeline: carry B as [F, N]; the slot gather is
     an axis-1 (minor-dim) gather from a column-major-friendly carry, so
     any layout conversion can hoist out of the timing loop; K-sum is a
     sublane reduce; one [M,F] transpose at the end
  E  C + D combined (transposed deferred fold), if C or D wins
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
    from dgsparse_tpu.kernels.pallas_spmm import (set_lane_pack,
                                                  spmm_bucketed_ell)
    from dgsparse_tpu.utils.bench import time_pytree_2pt
    from dgsparse_tpu.utils.testing import load_mtx, spmm_oracle

    rowptr, col, vals, (m, n) = load_mtx(
        "/root/reference/example/data/p2p-Gnutella31.mtx")
    nnz = len(col)
    plan = build_bucketed_ell_plan(rowptr, col, n)
    tot_slots = sum(rb * k for rb, k in zip(plan.rbs, plan.ks))
    log(f"p2p nnz={nnz} buckets={len(plan.ks)} ks={plan.ks} rbs={plan.rbs} "
        f"pad={plan.pad_ratio():.3f} slots={tot_slots} "
        f"concat_rows={plan.concat_rows}")
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((n, feat)).astype(np.float32))
    w_slot = jnp.asarray(rng.standard_normal(tot_slots).astype(np.float32))
    f = feat
    g = 128 // f

    # ---- C: deferred g-fold --------------------------------------------
    def packed_nofold(x, p, w):
        outs = []
        o2 = 0
        for cols, mask, eperm, _rows, k in p.bucket_views():
            rb = cols.shape[0]
            ww = jax.lax.slice(w, (o2,), (o2 + rb * k,)).reshape(rb, k)
            o2 += rb * k
            k2 = -(-k // g) * g
            if k2 != k:
                cols = jnp.pad(cols, ((0, 0), (0, k2 - k)), mode="edge")
                ww = jnp.pad(ww, ((0, 0), (0, k2 - k)))
            gathered = jnp.take(x, cols.reshape(-1), axis=0)
            gp = gathered.reshape(rb, k2 // g, g * f)
            wp = jnp.repeat(ww.reshape(rb, k2 // g, g), f, axis=2)
            outs.append((wp * gp).sum(axis=1, dtype=jnp.float32))  # [rb,128]
        cat = jnp.concatenate(outs, axis=0)
        full = jnp.take(cat, p.inv_row, axis=0, mode="fill",
                        fill_value=0)                              # [M,128]
        return full.reshape(p.num_rows, g, f).sum(axis=1)

    # ---- D: transposed-space pipeline ----------------------------------
    def transposed_pipe(xt, p, w):                                 # xt [F,N]
        outs = []
        o2 = 0
        for cols, mask, eperm, _rows, k in p.bucket_views():
            rb = cols.shape[0]
            ww = jax.lax.slice(w, (o2,), (o2 + rb * k,)).reshape(rb, k)
            o2 += rb * k
            gathered = jnp.take(xt, cols.reshape(-1), axis=1)      # [F,rb*k]
            gathered = gathered.reshape(f, rb, k)
            outs.append((ww[None] * gathered).sum(
                axis=2, dtype=jnp.float32))                        # [F,rb]
        cat = jnp.concatenate(outs, axis=1)                        # [F,crows]
        full = jnp.take(cat, p.inv_row, axis=1, mode="fill",
                        fill_value=0)                              # [F,M]
        return full.T

    # correctness vs oracle first
    ref = spmm_oracle(rowptr, col, None, np.asarray(b), "sum")
    w_ones = np.zeros(tot_slots, np.float32)
    inv = np.asarray(plan.inv)
    w_ones[inv] = 1.0
    w_ones_j = jnp.asarray(w_ones)
    outc = np.asarray(jax.device_get(jax.jit(packed_nofold)(
        b, plan, w_ones_j)))
    np.testing.assert_allclose(outc, ref, rtol=1e-4, atol=1e-4)
    outd = np.asarray(jax.device_get(jax.jit(transposed_pipe)(
        b.T, plan, w_ones_j)))
    np.testing.assert_allclose(outd, ref, rtol=1e-4, atol=1e-4)
    log("correctness OK (C, D)")

    def t(fn, args, label):
        dt = time_pytree_2pt(fn, args, iters=(50, 250), repeats=3)
        gf = 2.0 * nnz * feat / dt / 1e9
        log(f"  [{label:28s}] {dt*1e6:8.1f} us  {gf:6.2f} GF/s")
        return dt * 1e6

    rows = {}
    for rnd in range(3):
        set_lane_pack(True)
        rows.setdefault("A_public_packed", []).append(
            t(lambda x, p, w: spmm_bucketed_ell(p, None, x, w_slot=w),
              (b, plan, w_slot), f"A public packed r{rnd}"))
        set_lane_pack(False)
        rows.setdefault("B_public_unpacked", []).append(
            t(lambda x, p, w: spmm_bucketed_ell(p, None, x, w_slot=w),
              (b, plan, w_slot), f"B public unpacked r{rnd}"))
        set_lane_pack(None)
        rows.setdefault("C_deferred_fold", []).append(
            t(packed_nofold, (b, plan, w_slot), f"C deferred fold r{rnd}"))
        rows.setdefault("D_transposed", []).append(
            t(transposed_pipe, (b.T, plan, w_slot), f"D transposed r{rnd}"))

    import json
    out = {k: {"us": [round(v, 1) for v in vs],
               "min_us": round(min(vs), 1)} for k, vs in rows.items()}
    log(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(__file__),
                           "results_r5_probe.json"), "w") as fh:
        json.dump({"feat": feat, "nnz": nnz, "rows": out}, fh, indent=1)


if __name__ == "__main__":
    main()
