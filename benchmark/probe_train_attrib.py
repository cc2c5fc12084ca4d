"""Attribute the arxiv-scale GCN training step (VERDICT r4 #7).

bench_train.py records the full jitted fwd+bwd+adam 2-layer GCN step at
42.9 ms (arxiv-scale, 128->256->40), but the isolated SpMM rows sum to
well under half of that. This probe closes the gap two ways, same
session:

1. MEASURED stage ladder — time nested sub-pipelines with the identical
   two-point array-carry harness and difference them:
     fwd-only, value_and_grad (no adam), full step,
     each SpMM fwd in isolation at its true width (H=256, C=40),
     each SpMM fwd+bwd pair, the dense matmuls, adam alone.
2. OPTIMIZED-HLO buffer audit of the full step (the §1c-bis method):
   every materialized buffer >= 4 MB grouped by operator, so un-fused
   extra passes show up directly.

Run on TPU: python benchmark/probe_train_attrib.py
Writes benchmark/results_train_attrib.json.
Reference protocol analog: /root/reference/test/test_dgl.py:104-112.
"""

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgsparse_tpu.utils.cache import enable

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_SHAPE = re.compile(r"(bf16|f32|f16|s32|u32|s8|u8|pred)\[([\d,]*)\]")


def _bytes_of(shape_str):
    m = _SHAPE.search(shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * {"bf16": 2, "f16": 2, "s8": 1, "u8": 1,
                "pred": 1}.get(dt, 4)


NODES, IN_F, HID, CLS = 169_343, 128, 256, 40
HBM_GBPS = 819.0


def main():
    import optax

    from dgsparse_tpu import SparseTensor, spmm
    from dgsparse_tpu.nn import GCN
    from dgsparse_tpu.utils.bench import time_pytree_2pt
    from dgsparse_tpu.utils.testing import random_csr

    jax.device_get(jnp.zeros((8,), jnp.float32) + 1.0)
    rowptr, col, _ = random_csr(NODES, NODES, avg_degree=6.45, seed=0,
                                skew=1.0, with_empty_rows=False)
    nnz = len(col)
    adj = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                                None, sparse_sizes=(NODES, NODES))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((NODES, IN_F)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, CLS, NODES))
    model = GCN(hidden_features=HID, out_features=CLS)
    params = model.init(jax.random.key(0), x, adj)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    log(f"arxiv-scale: nnz={nnz} dims {IN_F}->{HID}->{CLS}")

    def loss_fn(p):
        logits = model.apply(p, x, adj)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    def vgrad(params):
        return jax.value_and_grad(loss_fn)(params)

    rows = {}

    def t(label, fn, args, iters=(10, 50)):
        dt = time_pytree_2pt(fn, args, iters=iters, repeats=3)
        log(f"  [{label:28s}] {dt*1e3:8.3f} ms")
        rows[label] = round(dt * 1e3, 3)
        return dt

    # ---- stage ladder ----
    t("full step (fwd+bwd+adam)", lambda p, o: step(p, o)[:2],
      (params, opt_state))
    t("value_and_grad (no adam)", lambda p: vgrad(p)[1], (params,))
    t("forward only", lambda p: model.apply(p, x, adj), (params,))
    t("adam update alone",
      lambda g, o: tx.update(g, o)[0], (jax.tree.map(jnp.zeros_like,
                                                     params), opt_state))

    # isolated SpMMs at the step's true widths
    xh = jnp.asarray(rng.standard_normal((NODES, HID)).astype(np.float32))
    xc = jnp.asarray(rng.standard_normal((NODES, CLS)).astype(np.float32))
    t("spmm fwd F=256", lambda v: spmm(adj, v, "sum"), (xh,))
    t("spmm fwd F=40", lambda v: spmm(adj, v, "sum"), (xc,))
    ct_h = jnp.asarray(rng.standard_normal(xh.shape).astype(np.float32))
    ct_c = jnp.asarray(rng.standard_normal(xc.shape).astype(np.float32))

    def fb(v, ct):
        out, vjp = jax.vjp(lambda u: spmm(adj, u, "sum"), v)
        return out, vjp(ct)[0]

    t("spmm fwd+bwd F=256", fb, (xh, ct_h))
    t("spmm fwd+bwd F=40", fb, (xc, ct_c))

    # dense layers at the step's widths (fwd only; bwd ~2x)
    w1 = jnp.asarray(rng.standard_normal((IN_F, HID)).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((HID, CLS)).astype(np.float32))
    t("dense x@W1 [N,128]x[128,256]", lambda a, w: a @ w, (x, w1))
    t("dense h@W2 [N,256]x[256,40]", lambda a, w: a @ w, (xh, w2))

    # softmax CE + mean over 169K x 40 logits
    t("softmax CE loss", lambda lg: optax.
      softmax_cross_entropy_with_integer_labels(lg, y).mean(), (xc,))

    # ---- optimized-HLO buffer audit of the full step ----
    lowered = jax.jit(lambda p, o: step(p, o)[:2]).lower(params, opt_state)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    entry = []
    in_entry = False
    for line in hlo.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            break
        if in_entry:
            entry.append(line)
    bufs = {}
    total = 0
    for line in entry:
        b = _bytes_of(line)
        if b >= 4 << 20:
            op = line.split("=", 1)[-1].strip().split(" ", 1)[-1]
            op = op.split("(")[0].strip()
            key = f"{op} {_SHAPE.search(line).group(0)}"
            bufs[key] = bufs.get(key, 0) + 1
            total += b
    log(f"entry buffers >=4MB: {len(bufs)} kinds, {total/1e6:.0f} MB total")
    for k, v in sorted(bufs.items()):
        log(f"    {v:2d} x {k}")

    # roofline: minimal step traffic
    params_n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    min_bytes = 4 * (4 * params_n + 4 * NODES * (IN_F + HID + CLS)
                     + 2 * nnz * (HID + CLS) * 4 // 2)
    step_ms = rows["full step (fwd+bwd+adam)"]
    summary = {
        "hbm_roofline_pct_full_step": round(
            min_bytes / (step_ms / 1e3) / 1e9 / HBM_GBPS * 100, 1),
        "hlo_entry_buffers_mb": round(total / 1e6),
        "spmm_pair_sum_ms": round(
            rows["spmm fwd+bwd F=256"] + rows["spmm fwd+bwd F=40"], 3),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_train_attrib.json")
    with open(out, "w") as fh:
        json.dump({"backend": jax.default_backend(), "nnz": int(nnz),
                   "stage_ms": rows, "summary": summary}, fh, indent=1)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
