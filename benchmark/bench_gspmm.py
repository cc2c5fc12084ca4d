"""gspmm semiring + edge_softmax + GAT step benchmark (VERDICT r2 #10).

Reference published point: gspmm-fp `u_sub_e_sum` on p2p-Gnutella31 =
0.0004 s single call, RTX 3090 (/root/reference/example/README.md:86-91).

Measures: u_mul_e_sum / u_sub_e_sum / copy_u_sum / u_mul_e_max /
edge_softmax / 4-head GAT train step, at p2p and arxiv scale, with the
two-point on-device harness. Writes benchmark/results_gspmm.json.
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


def load_p2p():
    from dgsparse_tpu.utils.testing import load_mtx

    mtx = "/root/reference/example/data/p2p-Gnutella31.mtx"
    rowptr, col, vals, (m, n) = load_mtx(mtx)
    return rowptr, col, m


def arxiv_scale():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_scale import power_law_graph

    rowptr, col = power_law_graph(169343, 169343, 1166243, seed=3)
    return rowptr, col, 169343


def main():
    from dgsparse_tpu import SparseTensor, edge_softmax, gspmm
    from dgsparse_tpu.utils.bench import time_pytree_2pt

    results = []
    out_path = "benchmark/results_gspmm.json"
    for name, loader, feat in (("p2p-Gnutella31", load_p2p, 64),
                               ("arxiv-scale", arxiv_scale, 64)):
        rowptr, col, m = loader()
        nnz = len(col)
        rng = np.random.default_rng(0)
        vals = jnp.asarray(
            np.abs(rng.standard_normal(nnz)).astype(np.float32) + 0.1)
        sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                                   vals, sparse_sizes=(m, m))
        x = jnp.asarray(rng.standard_normal((m, feat)).astype(np.float32))
        logits = jnp.asarray(rng.standard_normal(nnz).astype(np.float32))
        log(f"[{name}] nnz={nnz}")

        cases = {
            "u_mul_e_sum": lambda x: gspmm(sp, x, "sum", "mul"),
            "u_sub_e_sum": lambda x: gspmm(sp, x, "sum", "sub"),
            "copy_u_sum": lambda x, s2=SparseTensor.from_csr(
                jnp.asarray(rowptr), jnp.asarray(col), None,
                sparse_sizes=(m, m)): gspmm(s2, x, "sum", "mul"),
            "u_mul_e_max": lambda x: gspmm(sp, x, "max", "mul"),
        }
        for op, fn in cases.items():
            try:
                dt = time_pytree_2pt(fn, (x,), iters=(20, 60), repeats=3)
                gf = 2 * nnz * feat / dt / 1e9
                log(f"  {op:16s} {dt*1e6:10.1f} us  {gf:7.2f} GF/s")
                results.append({"graph": name, "op": op, "feat": feat,
                                "us": round(dt * 1e6, 1),
                                "gflops": round(gf, 2)})
            except Exception as ex:
                log(f"  {op} failed: {type(ex).__name__}: {ex}")

        try:
            dt = time_pytree_2pt(lambda lg: edge_softmax(sp, lg),
                                 (logits,), iters=(20, 60), repeats=3)
            log(f"  {'edge_softmax':16s} {dt*1e6:10.1f} us")
            results.append({"graph": name, "op": "edge_softmax",
                            "feat": 1, "us": round(dt * 1e6, 1)})
        except Exception as ex:
            log(f"  edge_softmax failed: {type(ex).__name__}: {ex}")
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    # 4-head GAT full train step (fwd+bwd+adam) on a Cora-shaped graph —
    # comparable to docs/BENCHMARKS.md §6
    import optax

    from dgsparse_tpu.nn import GAT, get_gcn_dcsr_from_edge_index
    from dgsparse_tpu.utils.testing import random_csr

    m = 2708
    rowptr, col, _ = random_csr(m, m, avg_degree=4.0, seed=0,
                                with_empty_rows=False)
    coo = np.repeat(np.arange(m, dtype=np.int32), np.diff(rowptr))
    adj = get_gcn_dcsr_from_edge_index(np.stack([coo, col]), m)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((m, 128)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 7, m).astype(np.int32))
    model = GAT(hidden_features=16, out_features=7, num_heads=4)
    params = model.init(jax.random.key(0), x, adj)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(p, x, adj)
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(logp, y[:, None], 1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    dt = time_pytree_2pt(
        lambda p, o, x, y: step(p, o, x, y)[2], (params, opt_state, x, y),
        iters=(10, 30), repeats=3)
    log(f"  GAT 4-head train step (cora-shaped): {dt*1e3:.2f} ms")
    results.append({"graph": "cora-shaped", "op": "gat4_train_step",
                    "feat": 128, "us": round(dt * 1e6, 1)})
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {out_path}")


if __name__ == "__main__":
    main()
