"""Decompose the arxiv-scale MAX backward (VERDICT r2 item 7).

Round-2 numbers (results_sweep_reduce.json): arxiv max fwd+bwd 65.8 ms vs
mean 29.4 ms at F=64 — the winner-mask materialization is suspected. This
probe times each component of the ELL max backward on hardware so the fix
targets the measured cost, not the guessed one.
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from dgsparse_tpu import Algorithm, SparseTensor, spmm
    from dgsparse_tpu.utils.bench import time_pytree_2pt
    from dgsparse_tpu.utils.testing import random_csr

    n = 169343
    feat = 64
    import zlib

    rowptr, col, vals = random_csr(
        n, n, avg_degree=6.9, seed=zlib.crc32(b"arxiv-scale") % 97,
        skew=1.3)
    nnz = len(col)
    log(f"graph: {n} nodes, {nnz} edges")
    jax.device_get(jnp.zeros((8,), jnp.float32) + 1.0)

    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(n, n))
    st = sp.storage
    ell = st._ell_fwd
    log(f"ell plan type: {type(ell).__name__}")
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, feat)).astype(np.float32))

    def t(label, fn, args, iters=(6, 18)):
        dt = time_pytree_2pt(fn, args, iters=iters, repeats=3)
        log(f"  [{label:34s}] {dt*1e3:8.2f} ms")
        return dt

    # baselines (recorded 2026-08-17: fwd mean 11.77 / max 11.85,
    # fwd+bwd mean 32.51 / max 67.09 ms — ratio 2.06)
    alg = Algorithm.PALLAS_ROW_TILE
    if "--baselines" in sys.argv:
        t("fwd mean", lambda x: spmm(sp, x, "mean", alg), (b,))
        t("fwd max", lambda x: spmm(sp, x, "max", alg), (b,))

        def fb(red):
            def f(x):
                out, vjp = jax.vjp(lambda y: spmm(sp, y, red, alg), x)
                (dx,) = vjp(out)
                return out + dx
            return f

        t("fwd+bwd mean", fb("mean"), (b,))
        t("fwd+bwd max", fb("max"), (b,))

    # ---- components of the max backward (ELL bucketed path) ----
    from dgsparse_tpu.kernels.pallas_spmm import _ell_buckets, spmm_ell_maxmin
    from dgsparse_tpu.core.planner import HybridPlan

    if isinstance(ell, HybridPlan):
        ell = ell.ell
    buckets, inv_row = _ell_buckets(ell)
    log(f"buckets: {[(c.shape, k) for c, _, _, _, k in buckets][:8]}")
    values = st.values()
    perm = st._csr2csc
    csc_col = st._csc_col

    # forward to get arg residuals
    out, arg = spmm_ell_maxmin(ell, values, b, __import__(
        "dgsparse_tpu.ops.types", fromlist=["ReduceOp"]).ReduceOp.MAX)
    arg = jax.block_until_ready(arg)
    g = out  # use output as cotangent

    def bwd_full(arg_e, g32, dense, vals):
        dv_parts, contrib_parts = [], []
        s0 = 0
        for cols_b, mask_b, eperm_b, rows_b, k in buckets:
            rb = cols_b.shape[0]
            argk = arg_e[s0:s0 + rb]
            s0 += rb
            g_b = g32 if rows_b is None else jnp.take(g32, rows_b, axis=0)
            kio = jnp.arange(k, dtype=argk.dtype)[None, :, None]
            win = jnp.logical_and(argk[:, None, :] == kio,
                                  (mask_b > 0)[:, :, None])
            g_win = jnp.where(win, g_b[:, None, :], 0)
            feats = jnp.take(dense, cols_b.reshape(-1), axis=0)
            feats = feats.reshape(rb, k, -1)
            dv_parts.append(jnp.sum(g_win * feats, axis=-1).reshape(-1))
            v_b = jnp.take(vals, jnp.maximum(eperm_b, 0))
            contrib_parts.append((g_win * v_b[:, :, None]).reshape(rb * k, -1))
        dv_flat = jnp.concatenate(dv_parts) if len(dv_parts) > 1 \
            else dv_parts[0]
        d_values = jnp.take(dv_flat, ell.inv)
        contrib_flat = jnp.concatenate(contrib_parts, axis=0) \
            if len(contrib_parts) > 1 else contrib_parts[0]
        contrib_csc = jnp.take(contrib_flat, jnp.take(ell.inv, perm), axis=0)
        d_dense = jax.ops.segment_sum(contrib_csc, csc_col, num_segments=n,
                                      indices_are_sorted=True)
        return d_values, d_dense

    t("bwd full (current formulation)", bwd_full, (arg, g, b, values))

    # component: contrib materialization only (consumed by perm gather)
    def comp_contrib(arg_e, g32, vals):
        parts = []
        s0 = 0
        for cols_b, mask_b, eperm_b, rows_b, k in buckets:
            rb = cols_b.shape[0]
            argk = arg_e[s0:s0 + rb]
            s0 += rb
            g_b = g32 if rows_b is None else jnp.take(g32, rows_b, axis=0)
            kio = jnp.arange(k, dtype=argk.dtype)[None, :, None]
            win = jnp.logical_and(argk[:, None, :] == kio,
                                  (mask_b > 0)[:, :, None])
            g_win = jnp.where(win, g_b[:, None, :], 0)
            v_b = jnp.take(vals, jnp.maximum(eperm_b, 0))
            parts.append((g_win * v_b[:, :, None]).reshape(rb * k, -1))
        flat = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        return jnp.take(flat, jnp.take(ell.inv, perm), axis=0)

    t("  contrib+perm gather", comp_contrib, (arg, g, values))

    # component: segment_sum alone over a precomputed contrib_csc
    contrib_csc = jax.jit(comp_contrib)(arg, g, values)
    contrib_csc = jax.block_until_ready(contrib_csc)
    t("  segment_sum alone", lambda c: jax.ops.segment_sum(
        c, csc_col, num_segments=n, indices_are_sorted=True),
      (contrib_csc,))

    # alternative d_dense: one-hot MXU segment matmul over the bwd ESC plan
    # (same kernel the sum forward uses, fed [slot, F] contributions
    # directly instead of w * gathered rows)
    plan_bwd = st._plan_bwd
    if plan_bwd is not None:
        from dgsparse_tpu.kernels.pallas_spmm import segment_matmul

        # static composed permutation: bwd slot -> fwd flat ELL slot
        pb_ep = np.asarray(jax.device_get(plan_bwd.eperm))   # bwd slot->csc e
        perm_h = np.asarray(jax.device_get(perm))            # csc e -> csr e
        inv_h = np.asarray(jax.device_get(ell.inv))          # csr e -> slot
        comp = np.where(pb_ep >= 0, inv_h[perm_h[np.maximum(pb_ep, 0)]], 0)
        valid = jnp.asarray((pb_ep >= 0).astype(np.float32))[:, None]
        comp = jnp.asarray(comp.astype(np.int32))

        def comp_contrib_flat(arg_e, g32, vals):
            parts = []
            s0 = 0
            for cols_b, mask_b, eperm_b, rows_b, k in buckets:
                rb = cols_b.shape[0]
                argk = arg_e[s0:s0 + rb]
                s0 += rb
                g_b = g32 if rows_b is None else jnp.take(g32, rows_b,
                                                          axis=0)
                kio = jnp.arange(k, dtype=argk.dtype)[None, :, None]
                win = jnp.logical_and(argk[:, None, :] == kio,
                                      (mask_b > 0)[:, :, None])
                g_win = jnp.where(win, g_b[:, None, :], 0)
                v_b = jnp.take(vals, jnp.maximum(eperm_b, 0))
                parts.append((g_win * v_b[:, :, None]).reshape(rb * k, -1))
            return jnp.concatenate(parts, axis=0) if len(parts) > 1 \
                else parts[0]

        def alt_esc(arg_e, g32, vals):
            flat = comp_contrib_flat(arg_e, g32, vals)
            csl = jnp.take(flat, comp, axis=0) * valid
            return segment_matmul(csl, plan_bwd.lrow, plan_bwd.tile_rb,
                                  plan_bwd.num_tiles, plan_bwd.edge_tile,
                                  plan_bwd.row_block,
                                  plan_bwd.num_row_blocks
                                  * plan_bwd.row_block)[:n]

        t("  contrib+d_dense via ESC matmul", alt_esc, (arg, g, values))


if __name__ == "__main__":
    main()
