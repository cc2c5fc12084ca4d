"""Decompose arxiv-scale SDDMM (VERDICT r2 item 2 perf closure).

results_scale_r3.json: XLA_CHUNKED[f32] @F=64 = 30.0 ms for 1.17M edges —
~6x over the two-row-gather floor (~2 x 1.17M x ~2 ns + passes). This
probe times each component of the 2-gather XLA formulation and lowering
variants so the fix targets the measured cost.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgsparse_tpu.utils.cache import enable

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from probe_cells import log  # noqa: E402


def main():
    from dgsparse_tpu.utils.bench import time_pytree_2pt
    from bench_scale import power_law_graph

    m = n = 169343
    feat = 64
    rowptr, col = power_law_graph(m, n, 1166243, seed=3)
    nnz = len(col)
    coo_row = np.repeat(np.arange(m, dtype=np.int32), np.diff(rowptr))
    log(f"graph {m} nodes {nnz} edges F={feat}")
    jax.device_get(jnp.zeros((8,), jnp.float32) + 1.0)

    rng = np.random.default_rng(0)
    d1 = jnp.asarray(rng.standard_normal((m, feat)).astype(np.float32))
    d2 = jnp.asarray(rng.standard_normal((n, feat)).astype(np.float32))
    row_j = jnp.asarray(coo_row)
    col_j = jnp.asarray(col)

    def t(label, fn, args, iters=(6, 18)):
        dt = time_pytree_2pt(fn, args, iters=iters, repeats=3)
        log(f"  [{label:36s}] {dt*1e3:8.2f} ms ({dt/nnz*1e9:.2f} ns/edge)")
        return dt

    # full op (current formulation)
    def full(a, b, r, c):
        return jnp.einsum("ef,ef->e", jnp.take(a, r, axis=0),
                          jnp.take(b, c, axis=0))

    t("full einsum 2-gather", full, (d1, d2, row_j, col_j))

    # mul+sum lowering instead of einsum
    def full_mulsum(a, b, r, c):
        return (jnp.take(a, r, axis=0) * jnp.take(b, c, axis=0)).sum(
            axis=1)

    t("full mul+sum 2-gather", full_mulsum, (d1, d2, row_j, col_j))

    # one gather only, consumed by a row-sum into per-edge scalars
    t("gather d2 only + rowsum", lambda b, c: jnp.take(
        b, c, axis=0).sum(axis=1), (d2, col_j))
    # sorted-index gather (d1 via coo_row, sorted/repeated)
    t("gather d1 only + rowsum (sorted)", lambda a, r: jnp.take(
        a, r, axis=0).sum(axis=1), (d1, row_j))

    # d1 expanded via repeat-from-rowptr instead of gather: segment
    # boundaries are static per structure
    deg = np.diff(rowptr).astype(np.int32)
    deg_j = jnp.asarray(deg)

    def full_repeat(a, b, c, dg):
        a_e = jnp.repeat(a, dg, axis=0, total_repeat_length=nnz)
        return (a_e * jnp.take(b, c, axis=0)).sum(axis=1)

    t("repeat-d1 + gather-d2 mul+sum", full_repeat,
      (d1, d2, col_j, deg_j))

    # 2D output: pad edges to x128 and emit [nnz/128, 128] to dodge the
    # 1-D output relayout
    pad = (-nnz) % 1024
    rp = jnp.asarray(np.concatenate([coo_row, np.zeros(pad, np.int32)]))
    cp = jnp.asarray(np.concatenate([col, np.zeros(pad, np.int32)]))

    def full_2d(a, b, r, c):
        prod = jnp.take(a, r, axis=0) * jnp.take(b, c, axis=0)
        return prod.sum(axis=1).reshape(-1, 128)

    t("padded 2-D output mul+sum", full_2d, (d1, d2, rp, cp))

    # dot_general per-edge: batch dot over edge dim
    def full_dot(a, b, r, c):
        ae = jnp.take(a, r, axis=0)
        be = jnp.take(b, c, axis=0)
        return jax.lax.dot_general(
            ae, be, (((1,), (1,)), ((0,), (0,))))

    t("batched dot_general", full_dot, (d1, d2, row_j, col_j))

    # bf16 tables (both sides), f32 accumulate via einsum preferred type
    d1h = d1.astype(jnp.bfloat16)
    d2h = d2.astype(jnp.bfloat16)

    def full_bf16(a, b, r, c):
        prod = (jnp.take(a, r, axis=0).astype(jnp.float32)
                * jnp.take(b, c, axis=0).astype(jnp.float32))
        return prod.sum(axis=1)

    t("bf16 tables mul+sum", full_bf16, (d1h, d2h, row_j, col_j))


if __name__ == "__main__":
    main()
