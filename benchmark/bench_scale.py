"""North-star scale benchmarks (BASELINE.json): SpMM GFLOP/s and HBM
roofline fraction at ogbn-arxiv scale and Reddit scale, F=64/128.

Run on the TPU:  python benchmark/bench_scale.py [--quick]

Graphs are synthetic but shape-matched to the published datasets:
- arxiv-scale: 169,343 nodes, ~1.17M edges, power-law degrees
  (ogbn-arxiv: 169343 nodes / 1,166,243 edges).
- reddit-scale: 232,965 nodes, ~114.6M edges, avg degree ~492
  (Reddit: 232965 / 114,615,892). Two variants:
    * `reddit-random`: uniform random columns — the worst case for any
      2-D tiling; runs the lean row-chunked XLA path (build_plans=False;
      a [115M, 64] f32 contribution tensor is 29 GB and cannot
      materialize on a 16 GB chip).
    * `reddit-clustered`: 80% of edges inside ~194-node communities
      (Reddit's defining structure) — the BELL 2-D one-hot kernel's
      target; cells fill and the kernel goes MXU-bound.

All timing is two-point on-device with array-carry chaining (utils.bench.time_pytree_2pt): the
tunnel adds a session-dependent FIXED latency per dispatch (1.3..29 ms
measured) that a single-count loop folds into every number.

Roofline accounting is the MINIMAL algorithmic traffic
(nnz + M + N) * F * 4 bytes — i.e. read every neighbor row once, write the
output once, read B once — divided by measured time and the 819 GB/s v5e
HBM peak. Anything a schedule re-reads (padding, streams) counts AGAINST
it. The reference's own formula 2*nnz*F/t gives GFLOP/s
(example/ge-spmm/spmm.cu:162-164).
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

HBM_GBPS = 819.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def power_law_graph(m, n, nnz_target, seed=0, alpha=1.2):
    """Power-law out-degrees, uniform columns (arxiv-like)."""
    rng = np.random.default_rng(seed)
    w = (1.0 + np.arange(m)) ** -alpha
    rng.shuffle(w)
    deg = rng.poisson(w / w.sum() * nnz_target)
    col = rng.integers(0, n, int(deg.sum()), dtype=np.int32)
    rowptr = np.zeros(m + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    # sort columns within rows for realism (CSR convention)
    for _ in range(1):
        order = np.argsort(np.repeat(np.arange(m), deg) * (n + 1) + col,
                           kind="stable")
        col = col[order]
    return rowptr.astype(np.int32), col


def clustered_graph(m, n, avg_deg, seed=0, intra=0.8, comm=194):
    """Community-clustered graph (Reddit-like): intra fraction of edges
    land inside the node's ~comm-sized community."""
    rng = np.random.default_rng(seed)
    deg = np.maximum(rng.poisson(avg_deg, m), 1).astype(np.int64)
    nnz = int(deg.sum())
    row = np.repeat(np.arange(m, dtype=np.int64), deg)
    c0 = (row // comm) * comm
    width = np.minimum(comm, n - c0)
    is_intra = rng.random(nnz) < intra
    col = np.where(
        is_intra,
        c0 + rng.integers(0, 1 << 30, nnz) % width,
        rng.integers(0, n, nnz),
    ).astype(np.int32)
    order = np.argsort(row * (n + 1) + col, kind="stable")
    col = col[order]
    rowptr = np.zeros(m + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    return rowptr.astype(np.int32), col


def heavytail_graph(m, n, avg_deg, seed=0, intra=0.8, comm=194,
                    max_deg=20000, sigma=1.5):
    """Hub-augmented community graph (VERDICT r4 #3): the adversarial
    stand-in for real Reddit's degree tail that the Poisson clustered
    generator lacks (docs/BENCHMARKS.md §9 fidelity gap). Out-degrees are
    lognormal(sigma) clipped to max_deg and bisection-scaled to the target
    mean; columns keep the community structure (intra fraction inside
    ~comm-node blocks) but inter-community edges attach PREFERENTIALLY
    (p ∝ degree), so hub columns are hot on the gather side too — matching
    the real graph's symmetric hub structure. With sigma=1.5 the top-1 %
    of rows carry ~20 % of edges and p99 ≈ 5K (real Reddit: max ~21.6K).
    Substitutes the reference's real-data policy
    (/root/reference/test/utils.py:15-46) under zero network egress."""
    rng = np.random.default_rng(seed)
    x = rng.lognormal(0.0, sigma, m)
    lo, hi = 1e-3, 1e6
    target = float(avg_deg) * m
    for _ in range(60):  # bisection on the pre-clip scale
        c = 0.5 * (lo + hi)
        s = np.minimum(np.maximum(np.rint(x * c), 1), max_deg).sum()
        lo, hi = (c, hi) if s < target else (lo, c)
    deg = np.minimum(np.maximum(np.rint(x * 0.5 * (lo + hi)), 1),
                     max_deg).astype(np.int64)
    nnz = int(deg.sum())
    cum = np.cumsum(deg)
    row = np.repeat(np.arange(m, dtype=np.int64), deg)
    c0 = (row // comm) * comm
    col = (c0 + rng.integers(0, 1 << 30, nnz)
           % np.minimum(comm, n - c0)).astype(np.int32)
    del c0
    # preferential inter-community columns: searchsorted on cumsum(deg)
    inter = np.nonzero(rng.random(nnz) >= intra)[0]
    draws = rng.integers(0, cum[-1], len(inter), dtype=np.int64)
    col[inter] = np.searchsorted(cum, draws, side="right").astype(np.int32)
    del inter, draws
    order = np.argsort(row * (n + 1) + col, kind="stable")
    del row
    col = col[order]
    rowptr = np.zeros(m + 1, np.int64)
    rowptr[1:] = cum
    ds = np.sort(deg)[::-1]
    log(f"heavytail: nnz={nnz} max_deg={ds[0]} p99={ds[m // 100]} "
        f"top1%_mass={ds[:m // 100].sum() / nnz:.3f}")
    return rowptr.astype(np.int32), col


def bench_standard(name, rowptr, col, feat, algs):
    """SparseTensor-based spmm benchmark (plans built)."""
    from dgsparse_tpu import Algorithm, SparseTensor, spmm
    from dgsparse_tpu.utils.bench import time_pytree_2pt

    m, nnz = len(rowptr) - 1, len(col)
    n = m
    t0 = time.perf_counter()
    sp = SparseTensor.from_csr(rowptr, col, None, sparse_sizes=(m, n))
    log(f"[{name}] construction {time.perf_counter()-t0:.1f}s "
        f"nnz={nnz}")
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((n, feat)).astype(np.float32))
    rows = []
    for alg in algs:
        try:
            dt = time_pytree_2pt(
                lambda x, a=Algorithm[alg]: spmm(sp, x, "sum", a), (b,),
                iters=(20, 60), repeats=3)
            rows.append(_row(name, alg, nnz, m, n, feat, dt))
        except Exception as ex:
            log(f"[{name}] {alg} failed: {type(ex).__name__}: {ex}")
    return rows


def bench_reddit_lean(name, rowptr, col, feat, chunks=16):
    """Row-chunked XLA segment SpMM: peak memory O(nnz/chunks * F)."""
    from dgsparse_tpu.utils.bench import time_pytree_2pt

    m, nnz = len(rowptr) - 1, len(col)
    n = m
    col_j = jnp.asarray(col)
    coo_row = np.repeat(np.arange(m, dtype=np.int32),
                        np.diff(rowptr).astype(np.int64))
    coo_j = jnp.asarray(coo_row)
    bounds = [int(rowptr[min(i * (m // chunks + 1), m)])
              for i in range(chunks)] + [nnz]
    rbounds = [min(i * (m // chunks + 1), m) for i in range(chunks)] + [m]
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((n, feat)).astype(np.float32))

    def fwd(bx, col_a, coo_a):
        outs = []
        for i in range(chunks):
            s, e = bounds[i], bounds[i + 1]
            r0, r1 = rbounds[i], rbounds[i + 1]
            if e == s:
                outs.append(jnp.zeros((r1 - r0, feat), jnp.float32))
                continue
            contrib = jnp.take(bx, jax.lax.slice(col_a, (s,), (e,)),
                               axis=0).astype(jnp.float32)
            seg = jax.lax.slice(coo_a, (s,), (e,)) - r0
            outs.append(jax.ops.segment_sum(
                contrib, seg, num_segments=r1 - r0,
                indices_are_sorted=True))
        return jnp.concatenate(outs, axis=0)

    def gather_only(bx, col_a, coo_a):
        # the lean path's own floor: the per-edge random row gather alone,
        # consumed by a chunk-local reduce so nothing materializes
        acc = jnp.zeros((feat,), jnp.float32)
        for i in range(chunks):
            s, e = bounds[i], bounds[i + 1]
            if e == s:
                continue
            g = jnp.take(bx, jax.lax.slice(col_a, (s,), (e,)), axis=0)
            acc = acc + g.astype(jnp.float32).sum(axis=0)
        return acc

    rows = []
    for tag, bx in (("f32", b), ("bf16", b.astype(jnp.bfloat16))):
        # index arrays as args, not closures (HLO-constant size limit)
        dt = time_pytree_2pt(fwd, (bx, col_j, coo_j), iters=(2, 6),
                             repeats=5)
        if dt <= 0:
            # fall back to blocking wall-time (coarse but nonzero)
            import time as _t

            r = jax.jit(fwd)(bx, col_j, coo_j)
            jax.device_get(r[-1, -1])
            t0 = _t.perf_counter()
            jax.device_get(jax.jit(fwd)(bx, col_j, coo_j)[-1, -1])
            dt = _t.perf_counter() - t0
        rows.append(_row(name, f"XLA_CHUNKED[{chunks}] {tag}", nnz, m, n,
                         feat, dt))
        gt = time_pytree_2pt(gather_only, (bx, col_j, coo_j), iters=(2, 6),
                             repeats=5)
        rows.append(_row(name, f"gather floor {tag}", nnz, m, n, feat, gt))
    return rows


def bench_reddit_ell(name, rowptr, col, feat):
    """Single-K ELL plan at 115M edges through the public from_csr
    (build_plans="ell"): viable now that spmm_ell row-chunks its gather to
    the budget — the masked K-sum replaces the lean path's segment_sum
    (which measures ~60 % of lean time, results_lean_r3.json)."""
    from dgsparse_tpu import Algorithm, SparseTensor, spmm
    from dgsparse_tpu.utils.bench import time_pytree_2pt

    m, nnz = len(rowptr) - 1, len(col)
    t0 = time.perf_counter()
    sp = SparseTensor.from_csr(rowptr, col, None, sparse_sizes=(m, m),
                               build_plans="ell")
    plan = sp.storage.ell_plan()
    log(f"[{name}] ELL construction {time.perf_counter()-t0:.1f}s "
        f"plan={type(plan).__name__} pad={plan.pad_ratio():.3f}"
        if plan is not None else f"[{name}] no ELL plan built")
    if plan is None:
        return []
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((m, feat)).astype(np.float32))
    # sp must be a TIMED ARGUMENT: closure capture embeds the 115M-edge
    # plan (3.3 GB with the chunked twin) as HLO literals, which stalls
    # the tunnel compiler for tens of minutes (same lesson as
    # bench_auto_public)
    dt = time_pytree_2pt(
        lambda x, s: spmm(s, x, "sum", Algorithm.PALLAS_ROW_TILE),
        (b, sp), iters=(2, 6), repeats=5)
    from dgsparse_tpu.core.planner import ColChunkedEllPlan

    cp = sp.storage.ell_chunked(feat, 4)
    tag = (f"ELL col-chunked x{cp.nchunks}"
           if isinstance(cp, ColChunkedEllPlan)
           else f"ELL flat (pad {plan.pad_ratio():.2f})")
    return [_row(name, tag, nnz, m, m, feat, dt)]


def bench_reddit_hybrid(name, rowptr, col, feat):
    """Hybrid BELL+ELL benchmark (plan built standalone, lean tensor):
    dense cells on the MXU, residue on bucketed ELL."""
    from dgsparse_tpu.core.planner import (build_hybrid_plan,
                                           materialize_cells_np)
    from dgsparse_tpu.kernels.pallas_spmm import spmm_hybrid
    from dgsparse_tpu.utils.bench import time_pytree_2pt

    m, nnz = len(rowptr) - 1, len(col)
    n = m
    t0 = time.perf_counter()
    plan = build_hybrid_plan(rowptr, col, n)
    if plan is None:
        log(f"[{name}] hybrid plan rejected (dense fraction < 25%)")
        return []
    log(f"[{name}] hybrid plan {time.perf_counter()-t0:.1f}s "
        f"dense={plan.dense_fraction*100:.0f}% pad={plan.pad_ratio():.2f} "
        f"cells={plan.cells.num_cells if plan.cells is not None else 0} "
        f"bell_tiles={plan.bell.num_tiles if plan.bell is not None else 0}")
    w = None
    if plan.cells is not None:
        t0 = time.perf_counter()
        w = {"cells": jnp.asarray(materialize_cells_np(plan.cells, None))}
        log(f"[{name}] cells materialized {time.perf_counter()-t0:.1f}s "
            f"({w['cells'].nbytes / 1e6:.0f} MB)")
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((n, feat)).astype(np.float32))
    rows = []
    for cd, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        # the plan must be an ARGUMENT: closure-captured arrays embed as
        # HLO literal constants, and a 1.3 GB plan blows the remote
        # compiler's request-size limit (observed HTTP 413)
        dt = time_pytree_2pt(
            lambda x, pl, ww, cd=cd: spmm_hybrid(pl, None, x,
                                                 compute_dtype=cd,
                                                 w_slot=ww),
            (b, plan, w), iters=(3, 9), repeats=3)
        rows.append(_row(name, f"PALLAS_HYBRID[{tag}]", nnz, m, n, feat,
                         dt))
    return rows


def bench_attention(name, rowptr, col, feat):
    """Fused slot-space GAT attention (ops/attention.gat_attention) vs the
    edge-space pipeline (coo gathers + edge_softmax + lean SpMM) at scale.
    The fused path never materializes a CSR-edge-order [nnz] intermediate;
    the edge-space pipeline pays ~3 of them plus the per-op slot
    conversions."""
    import jax as _jax

    from dgsparse_tpu import SparseTensor, edge_softmax, spmm
    from dgsparse_tpu.core.planner import (build_hybrid_plan,
                                           materialize_cells_np)
    from dgsparse_tpu.ops.attention import _hybrid_attention, _leaky
    from dgsparse_tpu.utils.bench import time_pytree_2pt

    m, nnz = len(rowptr) - 1, len(col)
    n = m
    t0 = time.perf_counter()
    plan = build_hybrid_plan(rowptr, col, n)
    if plan is None:
        log(f"[{name}] attention: no hybrid plan; skipped")
        return []
    mult = None
    if plan.cells is not None:
        mult = jnp.asarray(materialize_cells_np(plan.cells, None))
    log(f"[{name}] attention plan+cells {time.perf_counter()-t0:.1f}s")
    rng = np.random.default_rng(7)
    s_row = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    s_col = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((n, feat)).astype(np.float32))
    rows = []

    def arow(alg, dt):
        r = {"graph": name, "alg": alg, "op": "attention", "nnz": nnz,
             "feat": feat, "us": round(dt * 1e6, 1),
             "medges_s": round(nnz / dt / 1e6, 1)}
        log(f"[{name}] attention {alg:24s} F={feat:<4d} "
            f"{dt*1e6:10.1f} us  {r['medges_s']:8.1f} Medge/s")
        return r

    dt = time_pytree_2pt(
        lambda sr, sc, xx, pl_, mu: _hybrid_attention(pl_, mu, sr, sc,
                                                      xx, 0.2),
        (s_row, s_col, x, plan, mult), iters=(3, 9), repeats=3)
    rows.append(arow("SLOT_FUSED fwd", dt))

    def fwdbwd(sr, sc, xx, pl_, mu):
        def f(a, b, c):
            out = _hybrid_attention(pl_, mu, a, b, c, 0.2)
            return jnp.vdot(out, xx), out

        (_, out), grads = _jax.value_and_grad(
            f, argnums=(0, 1, 2), has_aux=True)(sr, sc, xx)
        return out + grads[2]

    dt = time_pytree_2pt(fwdbwd, (s_row, s_col, x, plan, mult),
                        iters=(2, 6), repeats=3)
    rows.append(arow("SLOT_FUSED fwd+bwd", dt))

    # edge-space comparator: lean storage (XLA paths), logits by gather.
    # The SparseTensor rides as a timed ARGUMENT — closure-captured
    # storages embed 115M-edge index arrays as HLO constants (observed:
    # 2.3 GB lowering constants, compile-request blowup).
    try:
        sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                                   None, sparse_sizes=(m, n),
                                   build_plans=False)

        def edge_space(sr, sc, xx, spa):
            st = spa.storage
            z = (jnp.take(sr, st.coo_row())
                 + jnp.take(sc, st.col()))
            alpha = edge_softmax(spa, _leaky(z, 0.2))
            return spmm(spa.set_values(alpha), xx, "sum")

        dt = time_pytree_2pt(edge_space, (s_row, s_col, x, sp),
                             iters=(2, 6), repeats=3)
        rows.append(arow("EDGE_SPACE fwd", dt))
    except Exception as ex:
        log(f"[{name}] edge-space comparator failed: "
            f"{type(ex).__name__}: {ex}")
    return rows


def _sddmm_row(name, alg, nnz, m, n, feat, dt):
    if dt <= 0:
        log(f"[{name}] {alg}: degenerate timing; row skipped")
        return {"graph": name, "alg": alg, "op": "sddmm", "nnz": nnz,
                "feat": feat, "us": None, "gflops": None,
                "roofline_frac": None}
    gflops = 2.0 * nnz * feat / dt / 1e9
    # minimal algorithmic traffic: read both dense operands once, write
    # one f32 per edge
    min_bytes = (m + n) * feat * 4 + nnz * 4
    roof = min_bytes / dt / 1e9 / HBM_GBPS
    r = {"graph": name, "alg": alg, "op": "sddmm", "nnz": nnz,
         "feat": feat, "us": round(dt * 1e6, 1),
         "gflops": round(gflops, 2), "roofline_frac": round(roof, 4)}
    log(f"[{name}] sddmm {alg:22s} F={feat:<4d} {dt*1e6:10.1f} us "
        f"{gflops:8.2f} GF/s  roofline {roof*100:5.1f}%")
    return r


def bench_sddmm(name, rowptr, col, feats, hybrid=False):
    """SDDMM north-star measurements (BASELINE.json): the edge-chunked
    XLA formulation everywhere, plus the dense-cell hybrid path on
    clustered graphs; fp32 and bf16 operands. Matches the reference
    harness protocol (example/sddmm/sddmm.cu: correctness check then
    warm timed iterations)."""
    from dgsparse_tpu.kernels import xla as kx
    from dgsparse_tpu.utils.bench import time_pytree_2pt

    m, nnz = len(rowptr) - 1, len(col)
    n = m
    coo = jnp.asarray(np.repeat(np.arange(m, dtype=np.int32),
                                np.diff(rowptr).astype(np.int64)))
    col_j = jnp.asarray(col)
    rng = np.random.default_rng(2)
    rows = []
    hp = None
    if hybrid:
        from dgsparse_tpu.core.planner import build_hybrid_plan

        t0 = time.perf_counter()
        hp = build_hybrid_plan(rowptr, col, n)
        log(f"[{name}] sddmm hybrid plan "
            f"{time.perf_counter()-t0:.1f}s")
    for feat in feats:
        d1 = jnp.asarray(rng.standard_normal((m, feat)).astype(np.float32))
        d2 = jnp.asarray(rng.standard_normal((n, feat)).astype(np.float32))
        # correctness spot check vs the oracle on a prefix
        k = min(nnz, 100000)
        ref = np.einsum(
            "ef,ef->e",
            np.asarray(d1)[np.asarray(coo[:k])],
            np.asarray(d2)[np.asarray(col_j[:k])])
        got = np.asarray(jax.jit(kx.sddmm_chunked)(coo, col_j, d1, d2)[:k])
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
        rp_j = jnp.asarray(rowptr)
        for dt_name, cast in (("f32", lambda x: x),
                              ("bf16", lambda x: x.astype(jnp.bfloat16))):
            dt = time_pytree_2pt(
                lambda a, b, r, c, rp: kx.sddmm_chunked(r, c, a, b,
                                                        rowptr=rp),
                (cast(d1), cast(d2), coo, col_j, rp_j), iters=(5, 15),
                repeats=3)
            rows.append(_sddmm_row(name, f"XLA_CHUNKED[{dt_name}]", nnz,
                                   m, n, feat, dt))
        if hp is not None and hp.cells is not None:
            from dgsparse_tpu.kernels.pallas_sddmm import sddmm_hybrid

            got = np.asarray(jax.jit(
                lambda a, b, p: sddmm_hybrid(p, a, b))(d1, d2, hp)[:k])
            # hybrid emits in CSR edge order too
            np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
            for cd, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
                dt = time_pytree_2pt(
                    lambda a, b, p, cd=cd: sddmm_hybrid(
                        p, a, b, compute_dtype=cd),
                    (d1, d2, hp), iters=(5, 15), repeats=3)
                rows.append(_sddmm_row(name, f"HYBRID_CELLS[{tag}]", nnz,
                                       m, n, feat, dt))
    return rows


def _row(name, alg, nnz, m, n, feat, dt):
    if dt <= 0:
        # two-point difference degenerated (tunnel hiccup mid-repeat);
        # record nothing rather than an infinite GFLOP/s
        log(f"[{name}] {alg}: degenerate timing (dt={dt}); row skipped")
        return {"graph": name, "alg": alg, "nnz": nnz, "feat": feat,
                "us": None, "gflops": None, "roofline_frac": None}
    gflops = 2.0 * nnz * feat / dt / 1e9
    min_bytes = (nnz + m + n) * feat * 4
    roof = min_bytes / dt / 1e9 / HBM_GBPS
    r = {"graph": name, "alg": alg, "nnz": nnz, "feat": feat,
         "us": round(dt * 1e6, 1), "gflops": round(gflops, 2),
         "roofline_frac": round(roof, 4)}
    log(f"[{name}] {alg:24s} F={feat:<4d} {dt*1e6:10.1f} us "
        f"{gflops:8.2f} GF/s  roofline {roof*100:5.1f}%")
    return r


def diag_plans(name, rowptr, col):
    """Host-only plan diagnostics for an adversarial graph: what AUTO
    builds, the bucketed-ELL K-ladder, pad ratios, the chunk-gate
    decision, and the hybrid split — 'record what breaks' (VERDICT r4
    #3) without touching the device."""
    from dgsparse_tpu import SparseTensor
    from dgsparse_tpu.core.planner import build_hybrid_plan

    m, nnz = len(rowptr) - 1, len(col)
    t0 = time.perf_counter()
    sp = SparseTensor.from_csr(rowptr, col, None, sparse_sizes=(m, m),
                               build_plans="ell")
    build_s = time.perf_counter() - t0
    st = sp.storage
    plan = st.ell_plan()
    d = {"graph": name, "diag": "plans", "nnz": int(nnz),
         "from_csr_ell_s": round(build_s, 1),
         "plan": type(plan).__name__ if plan is not None else None}
    if plan is not None and hasattr(plan, "ks"):
        d["k_ladder"] = list(map(int, plan.ks))
        d["rows_per_bucket"] = list(map(int, plan.rbs))
        d["pad_ratio"] = round(float(plan.pad_ratio()), 4)
        slots = sum(rb * k for rb, k in zip(plan.rbs, plan.ks))
        d["max_bucket_slots"] = max(
            rb * k for rb, k in zip(plan.rbs, plan.ks))
        d["total_slots"] = int(slots)
    hp = plan if hasattr(plan, "dense_fraction") else None
    if hp is None:
        t0 = time.perf_counter()
        hp = build_hybrid_plan(rowptr, col, m)
        d["hybrid_build_s"] = round(time.perf_counter() - t0, 1)
    if hp is not None and hasattr(hp, "dense_fraction"):
        d["hybrid_dense_fraction"] = round(float(hp.dense_fraction), 3)
        d["hybrid_pad"] = round(float(hp.pad_ratio()), 3)
        if getattr(hp, "cells", None) is not None:
            d["hybrid_cells"] = int(hp.cells.num_cells)
        res = getattr(hp, "ell", None)  # residue BucketedEllPlan
        if res is not None and hasattr(res, "ks"):
            d["residue_k_ladder"] = list(map(int, res.ks))
            d["residue_pad"] = round(float(res.pad_ratio()), 4)
    cp = st.ell_chunked(64, 4)
    if cp is not None and not hasattr(cp, "nchunks"):
        cp = getattr(cp, "ell", None)  # hybrid: chunked residue inside
    d["chunk_gate_F64"] = (None if cp is None or not hasattr(cp, "nchunks")
                           else
                           {"nchunks": int(cp.nchunks),
                            "pad": round(float(cp.pad_ratio()), 4)
                            if hasattr(cp, "pad_ratio") else None})
    log(f"[{name}] diag: {json.dumps(d)}")
    return [d]


def bench_auto_public(name, rowptr, col, feat):
    """The user path: SparseTensor.from_csr + spmm(AUTO) — verifies the
    public API reaches the hybrid MXU tier at scale (the round-3 AUTO
    selection fix). The sparse tensor is a TIMED ARGUMENT, not a closure
    constant (a 1.3+ GB plan embedded as HLO literals blows the remote
    compiler's request limit)."""
    from dgsparse_tpu import SparseTensor, spmm
    from dgsparse_tpu.utils.bench import time_pytree_2pt

    m, nnz = len(rowptr) - 1, len(col)
    n = m
    t0 = time.perf_counter()
    sp = SparseTensor.from_csr(rowptr, col, None, sparse_sizes=(m, n))
    log(f"[{name}] from_csr {time.perf_counter()-t0:.1f}s "
        f"ell_plan={type(sp.storage.ell_plan()).__name__}")
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((n, feat)).astype(np.float32))
    dt = time_pytree_2pt(lambda x, s: spmm(s, x, "sum"), (b, sp),
                         iters=(3, 9), repeats=3)
    return [_row(name, "AUTO(public)", nnz, m, n, feat, dt)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="arxiv-scale only")
    ap.add_argument("--skip-arxiv", action="store_true")
    ap.add_argument("--only", default=None,
                    help="run one section: hybrid | sddmm-reddit | "
                         "lean | sddmm-arxiv | attention | auto-reddit | "
                         "heavytail")
    ap.add_argument("--out", default="benchmark/results_scale.json")
    args = ap.parse_args()
    results = []

    def flush():
        # incremental writes: a wedged tunnel mid-run must not lose the
        # sections already measured
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    def section(fn, *a):
        try:
            results.extend(fn(*a))
        except Exception as ex:
            log(f"section {fn.__name__} failed: "
                f"{type(ex).__name__}: {ex}")
        flush()

    only = args.only
    if not args.skip_arxiv and only in (None, "sddmm-arxiv"):
        rowptr, col = power_law_graph(169343, 169343, 1166243, seed=3)
        if only is None:
            for feat in (64, 128):
                section(bench_standard, "arxiv-scale", rowptr, col, feat,
                        ["PALLAS_ROW_TILE", "PALLAS_EDGE_TILE",
                         "XLA_SEGMENT"])
        section(bench_sddmm, "arxiv-scale", rowptr, col, (64, 128))

    if not args.quick:
        if only in (None, "hybrid", "sddmm-reddit", "attention",
                    "auto-reddit"):
            # --- reddit scale, clustered (hybrid BELL+ELL target) ---
            rowptr, col = clustered_graph(232965, 232965, 492, seed=4)
            if only == "auto-reddit":
                section(bench_auto_public, "reddit-clustered", rowptr,
                        col, 64)
            if only in (None, "hybrid"):
                section(bench_reddit_hybrid, "reddit-clustered", rowptr,
                        col, 64)
            if only in (None, "sddmm-reddit"):
                section(bench_sddmm, "reddit-clustered", rowptr, col,
                        (64,), True)
            if only in (None, "attention"):
                section(bench_attention, "reddit-clustered", rowptr,
                        col, 64)
        if only == "heavytail":
            # --- reddit scale with a REAL-Reddit-like degree tail
            # (VERDICT r4 #3): max_deg ~20K hubs + preferential columns
            # on top of the community structure; stresses the bucketed-
            # ELL K-ladder, hybrid residue and chunk gates the Poisson
            # generator never did ---
            rowptr, col = heavytail_graph(232965, 232965, 492, seed=6)
            section(diag_plans, "reddit-heavytail", rowptr, col)
            section(bench_auto_public, "reddit-heavytail", rowptr,
                    col, 64)
            section(bench_reddit_hybrid, "reddit-heavytail", rowptr,
                    col, 64)
        if only in (None, "lean"):
            # --- reddit scale, random (lean chunked path) ---
            rowptr, col = clustered_graph(232965, 232965, 492, seed=5,
                                          intra=0.0)
            section(bench_reddit_lean, "reddit-random", rowptr, col, 64)
            section(bench_reddit_ell, "reddit-random", rowptr, col, 64)

    log(f"wrote {args.out}")
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
