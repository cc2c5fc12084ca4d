"""End-to-end GCN training-step benchmark (VERDICT r3 #9): the
reference's test_dgl.py:104-112 protocol — full fwd+bwd+adam update of a
2-layer GCN under one jit — as a RECORDED benchmark with steps/s and an
MFU/roofline estimate for the whole step, on Cora-shaped and
arxiv-scale graphs (BASELINE.json's "full 2-layer GCN training step").

Timing uses the two-point on-device protocol (utils.bench
time_pytree_2pt) so the tunnel's per-dispatch latency cancels; the
reference's wall-clock epoch loop is also reported for comparability
with test_dgl.py.

Run: python benchmark/bench_train.py [--quick]
Writes benchmark/results_train.json.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgsparse_tpu.utils.cache import enable

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

V5E_PEAK_FLOPS = 197e12     # bf16; fp32 MXU ~98 TF/s
V5E_FP32_FLOPS = 98.5e12
HBM_GBPS = 819.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


CONFIGS = [
    # name, nodes, lognormal-mu-degree, in_feat, hidden, classes, model
    # (cora: test_dgl.py trains 1433->16->7 on 2708 nodes / 10556 edges;
    # the lognormal generator's realized mean is mu*exp(sigma^2/2), so mu
    # is pre-divided to land near the real edge counts. The GIN rows are
    # the reference test_GIN.py protocol: 2-layer GIN, sum and max
    # aggregators — max exercises the argmax-residual backward in a full
    # training step.)
    ("cora-shaped", 2708, 2.4, 1433, 16, 7, "gcn"),
    ("arxiv-scale", 169_343, 4.2, 128, 256, 40, "gcn"),
    ("cora-shaped-gin-sum", 2708, 2.4, 1433, 16, 7, "gin-sum"),
    ("cora-shaped-gin-max", 2708, 2.4, 1433, 16, 7, "gin-max"),
    ("arxiv-scale-gin-max", 169_343, 4.2, 128, 256, 40, "gin-max"),
    # reddit-scale: real Reddit's shape (233K nodes, 114.6M edges,
    # 602->64->41) on the clustered generator — the deployment-target row
    # BASELINE.json names; the backward runs the column-chunked hybrid_t
    # plans. deg is avg Poisson degree here, not a lognormal mu.
    ("reddit-scale", 232_965, 492.0, 602, 64, 41, "gcn-reddit"),
]


def run_config(name, nodes, deg, in_feat, hidden, classes, model_kind,
               epochs):
    import optax

    from dgsparse_tpu.nn import GCN, GIN, get_gcn_dcsr_from_edge_index
    from dgsparse_tpu.utils.bench import time_pytree_2pt
    from dgsparse_tpu.utils.testing import random_csr

    if model_kind == "gcn-reddit":
        # Community-clustered CSR at real-Reddit shape; GCN normalization
        # computed directly on the CSR (no edge-order lexsort at 115M —
        # the generator already emits sorted CSR). Self-loops are APPENDED
        # per row before normalization so the protocol matches every other
        # GCN row and the reference (fill_diag in
        # dgsparse/nn/gcnconv.py:37-50) — D^-1/2 (A+I) D^-1/2.
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from bench_scale import clustered_graph

        from dgsparse_tpu import SparseTensor

        rowptr, col = clustered_graph(nodes, nodes, deg, seed=0)
        # fill_diag SETS the diagonal (dgsparse/nn/gcnconv.py): drop any
        # generator-emitted (r,r) entries first, else ~1/194 of rows get
        # a doubled diagonal after the append below
        rows64 = np.repeat(np.arange(nodes, dtype=np.int64),
                           np.diff(rowptr))
        keep = col.astype(np.int64) != rows64
        col = col[keep]
        old_deg = np.bincount(rows64[keep], minlength=nodes)
        rowptr = np.zeros(nodes + 1, np.int64)
        np.cumsum(old_deg, out=rowptr[1:])
        del keep
        # vectorized self-loop insertion at the end of each row: old entry
        # at flat position p in row r moves to p + r; the loop for row r
        # lands at rowptr[r+1] + r (two writes over nnz + nodes elements)
        rows64 = np.repeat(np.arange(nodes, dtype=np.int64), old_deg)
        col2 = np.empty(len(col) + nodes, dtype=col.dtype)
        col2[np.arange(len(col), dtype=np.int64) + rows64] = col
        col2[rowptr[1:].astype(np.int64) + np.arange(nodes)] = np.arange(
            nodes, dtype=col.dtype)
        rowptr = (rowptr.astype(np.int64)
                  + np.arange(nodes + 1, dtype=np.int64)).astype(np.int32)
        col = col2
        degs = (old_deg + 1).astype(np.float64)
        dinv = 1.0 / np.sqrt(degs)
        del rows64
        coo_row = np.repeat(np.arange(nodes, dtype=np.int64), np.diff(rowptr))
        vals = (dinv[coo_row] * dinv[col]).astype(np.float32)
        del coo_row
        import time as _t

        t0 = _t.perf_counter()
        adj = SparseTensor.from_csr(rowptr, col, vals,
                                    sparse_sizes=(nodes, nodes))
        log(f"{name}: from_csr {_t.perf_counter() - t0:.1f}s")
        nnz = len(col)
        rng = np.random.default_rng(1)
        model_kind = "gcn-pre"
    else:
        rowptr, col, _ = random_csr(nodes, nodes, avg_degree=deg, seed=0,
                                    skew=1.0, with_empty_rows=False)
        nnz = len(col)
        rng = np.random.default_rng(1)
    if model_kind == "gcn":
        coo_row = np.repeat(np.arange(nodes, dtype=np.int32),
                            np.diff(rowptr))
        adj = get_gcn_dcsr_from_edge_index(np.stack([coo_row, col]), nodes)
    elif model_kind == "gcn-pre":
        pass
    else:
        from dgsparse_tpu import SparseTensor

        adj = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                                    None, sparse_sizes=(nodes, nodes))
    x = jnp.asarray(rng.standard_normal((nodes, in_feat)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, classes, nodes))

    if model_kind in ("gcn", "gcn-pre"):
        model = GCN(hidden_features=hidden, out_features=classes)
    else:
        model = GIN(hidden_features=hidden, out_features=classes,
                    aggregator_type=model_kind.split("-")[1])
    params = model.init(jax.random.key(0), x, adj)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, x, adj)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    # ---- reference-style wall-clock epochs (test_dgl.py:104-112)
    import time

    jit_step = jax.jit(step)
    params2, opt2, loss = jit_step(params, opt_state)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    p, o = params2, opt2
    for _ in range(epochs):
        p, o, loss = jit_step(p, o)
    jax.block_until_ready(loss)
    wall = (time.perf_counter() - t0) / epochs
    final_loss = float(loss)

    # ---- two-point on-device step time (dispatch-latency-free).
    # 115M-edge steps run ~1 s each: shorter loops there keep the bench
    # bounded while the two-point subtraction still cancels dispatch.
    it = (2, 8) if nnz > 20_000_000 else (10, 50)
    dt = time_pytree_2pt(lambda p, o: step(p, o)[:2], (params, opt_state),
                         iters=it, repeats=3)

    # FLOP model for the full step: dense layers fwd 2*N*(Fin*H + H*C),
    # SpMM fwd 2*nnz*(H + C); backward ~2x forward (dX + dW per matmul,
    # d_dense + d_values per SpMM); adam update negligible.
    dense_f = 2.0 * nodes * (in_feat * hidden + hidden * classes)
    spmm_f = 2.0 * nnz * (hidden + classes)
    step_flops = 3.0 * (dense_f + spmm_f)
    mfu = step_flops / dt / V5E_FP32_FLOPS
    # minimal HBM traffic: params+grads+adam state (4 passes of P) +
    # activations fwd/bwd (~4 passes of N*(Fin+H+C)) + SpMM gathers
    nbytes = 4 * (4 * sum(int(np.prod(v.shape))
                          for v in jax.tree.leaves(params))
                  + 4 * nodes * (in_feat + hidden + classes)
                  + 4 * 2 * nnz * (hidden + classes) // 2)
    hbm_frac = (nbytes / HBM_GBPS / 1e9) / dt
    log(f"{name}: N={nodes} nnz={nnz} {in_feat}->{hidden}->{classes}  "
        f"step {dt*1e3:.3f} ms ({1/dt:.1f} steps/s), wall "
        f"{wall*1e3:.3f} ms/epoch, MFU {mfu*100:.2f}% fp32, "
        f"~{hbm_frac*100:.1f}% HBM roofline, loss {final_loss:.4f}")
    return {"config": name, "nodes": nodes, "nnz": int(nnz),
            "dims": [in_feat, hidden, classes],
            "step_ms": round(dt * 1e3, 3),
            "steps_per_s": round(1 / dt, 2),
            "wall_ms_per_epoch": round(wall * 1e3, 3),
            "mfu_fp32_pct": round(mfu * 100, 2),
            "hbm_roofline_pct": round(hbm_frac * 100, 1),
            "final_loss": round(final_loss, 4),
            "step_gflops": round(step_flops / dt / 1e9, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", help="substring filter on config name")
    args = ap.parse_args()
    selected = [cfg for cfg in CONFIGS
                if not (args.quick and cfg[1] > 10_000)
                and not (args.only and args.only not in cfg[0])]
    if not selected:
        ap.error(f"filter combination (--quick={args.quick}, "
                 f"--only={args.only!r}) selects no configs; refusing to "
                 f"overwrite results_train.json with zero rows")
    backend = jax.default_backend()
    rows = []
    for cfg in selected:
        epochs = 20 if not args.quick else 5
        if cfg[1] > 200_000:
            epochs = 5  # ~1 s/step at 115M edges
        row = run_config(*cfg, epochs=epochs)
        row["backend"] = backend  # per-row: merged files can mix sessions
        rows.append(row)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_train.json")
    if args.only and os.path.exists(out):
        with open(out) as fh:
            prev_doc = json.load(fh)
        prev = prev_doc.get("rows", [])
        prev_backend = prev_doc.get("backend", "unknown")
        names = {r["config"] for r in rows}
        kept = [r for r in prev if r["config"] not in names]
        for r in kept:  # label carried-over rows with THEIR backend
            r.setdefault("backend", prev_backend)
        if any(r.get("backend") != backend for r in kept):
            log(f"note: merged rows span backends "
                f"({sorted({r.get('backend') for r in kept} | {backend})}); "
                f"per-row 'backend' fields disambiguate")
        rows = kept + rows
    with open(out, "w") as fh:
        json.dump({"backend": backend, "rows": rows}, fh, indent=1)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
