"""reddit-random chunked-ELL attribution + pad-free gather A/B (VERDICT
r4 #10).

Round 4 recorded the public chunked-ELL path at 824 ms on the 115M-edge
uniform-random graph vs a 642 ms FLAT-table gather floor — but the
tablesize microbenchmark says 4 MB chunk slices gather at ~2.09 ns/row,
which would put the chunked gather floor near ~260 ms for these 123M
slots. Something other than the gather dominates. Variants, one session:

  A  public spmm() on the chunked plan            (the 824 ms baseline)
  B  chunked gather ONLY (same plan layout, consumed, no K-sum/mask/
     recombine/partial)                            -> the real floor
  C  B + K-sum (masked, values=None, per-bucket)   -> + reduce cost
  D  full pipeline but pads gather with mode=fill on -1 columns
     (no mask multiply at all in the unweighted case)
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
    feat = 64
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_scale import clustered_graph

    from dgsparse_tpu import SparseTensor, spmm
    from dgsparse_tpu.utils.bench import time_pytree_2pt

    jax.device_get(jnp.zeros((8,), jnp.float32) + 1.0)
    t0 = time.time()
    rowptr, col = clustered_graph(232965, 232965, 492, seed=5, intra=0.0)
    m = 232965
    nnz = len(col)
    log(f"generator {time.time()-t0:.0f}s nnz={nnz}")
    t0 = time.time()
    sp = SparseTensor.from_csr(rowptr, col, None, sparse_sizes=(m, m),
                               build_plans="ell")
    log(f"from_csr(ell) {time.time()-t0:.0f}s")
    cp = sp.storage.ell_chunked(feat, 4)
    assert cp is not None, "chunked plan missing"
    log(f"chunked: nchunks={cp.nchunks} pad={cp.pad_ratio():.3f}")
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((m, feat)).astype(np.float32))

    cs = cp.chunk_size

    def gather_only(x, p):
        acc = jnp.float32(0)
        for c, sub in enumerate(p.subs):
            if sub.nnz == 0:
                continue
            lo = c * cs
            dsl = jax.lax.slice(x, (lo, 0), (min(lo + cs, p.num_cols),
                                             feat))
            for cols_b, _, _, _, k in sub.bucket_views():
                g = jnp.take(dsl, cols_b.reshape(-1), axis=0)
                acc += jnp.sum(g) * 1e-30
        return acc

    def gather_ksum(x, p):
        acc = jnp.float32(0)
        for c, sub in enumerate(p.subs):
            if sub.nnz == 0:
                continue
            lo = c * cs
            dsl = jax.lax.slice(x, (lo, 0), (min(lo + cs, p.num_cols),
                                             feat))
            for cols_b, mask, _, _, k in sub.bucket_views():
                rb = cols_b.shape[0]
                g = jnp.take(dsl, cols_b.reshape(-1), axis=0)
                g = g.reshape(rb, k, feat)
                s = (mask.astype(g.dtype)[:, :, None] * g).sum(
                    axis=1, dtype=jnp.float32)
                acc += jnp.sum(s) * 1e-30
        return acc

    # D: pad-free fill-mode gather pipeline (unweighted): pads point PAST
    # the chunk slice; mode="fill" returns 0 rows — no mask multiply, no
    # eperm read. NOTE the sentinel must be >= the slice row count, NOT
    # -1: jnp.take mode="fill" wraps negative indices numpy-style (only
    # indices >= n fill) — measured 2026-08-20, the first probe run's
    # 99.7 % mismatch was every pad slot gathering dsl[-1].
    filled = []
    for c, sub in enumerate(cp.subs):
        if sub.nnz == 0:
            filled.append(None)
            continue
        ep = np.asarray(jax.device_get(sub.eperm))
        cl = np.asarray(jax.device_get(sub.cols))
        filled.append(jnp.asarray(np.where(ep >= 0, cl, cs).astype(np.int32)))

    def full_fill(x, p, fills):
        out = None
        for c, sub in enumerate(p.subs):
            if sub.nnz == 0:
                continue
            lo = c * cs
            dsl = jax.lax.slice(x, (lo, 0), (min(lo + cs, p.num_cols),
                                             feat))
            o2 = 0
            parts = []
            fc = fills[c]
            for cols_b, _, _, _, k in sub.bucket_views():
                rb = cols_b.shape[0]
                cf = jax.lax.slice(fc, (o2,), (o2 + rb * k,))
                o2 += rb * k
                g = jnp.take(dsl, cf, axis=0, mode="fill", fill_value=0)
                parts.append(g.reshape(rb, k, feat).sum(
                    axis=1, dtype=jnp.float32))
            cat = jnp.concatenate(parts, axis=0)
            part = jnp.take(cat, sub.inv_row, axis=0, mode="fill",
                            fill_value=0)
            out = part if out is None else out + part
        return out

    rows = {}

    def t(label, fn, args, iters=(2, 6)):
        dt = time_pytree_2pt(fn, args, iters=iters, repeats=3)
        gf = 2.0 * nnz * feat / dt / 1e9
        log(f"  [{label:24s}] {dt*1e3:8.1f} ms  {gf:6.2f} GF/s")
        rows[label] = {"ms": round(dt * 1e3, 1), "gflops": round(gf, 2)}

    # correctness of D vs public — AFTER the A/B/C attribution rounds so
    # a D defect cannot void the attribution record (it did on 08-20).
    d_ok = False
    try:
        ref = np.asarray(jax.device_get(
            jax.jit(lambda x, s: spmm(s, x, "sum"))(b, sp)))
        got = np.asarray(jax.device_get(
            jax.jit(full_fill)(b, cp, filled)))
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
        d_ok = True
        log("correctness OK (D vs public)")
    except AssertionError as e:
        log(f"variant D INCORRECT, timing it anyway for the record: "
            f"{str(e).splitlines()[2] if len(str(e).splitlines()) > 2 else e}")

    for rnd in range(2):
        t(f"A public chunked r{rnd}",
          lambda x, s: spmm(s, x, "sum"), (b, sp))
        t(f"B gather-only r{rnd}", gather_only, (b, cp))
        t(f"C gather+ksum r{rnd}", gather_ksum, (b, cp))
        t(f"D fill-mode full r{rnd}", full_fill, (b, cp, filled))
    rows["D_correct"] = d_ok

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_lean_r5.json")
    with open(out, "w") as fh:
        json.dump({"backend": jax.default_backend(), "nnz": int(nnz),
                   "feat": feat, "nchunks": int(cp.nchunks),
                   "rows": rows}, fh, indent=1)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
