"""Empirical algorithm selection: time every applicable schedule on the
real device and return the fastest.

The static AUTO heuristic (ops/spmm._resolve_algorithm, the analog of the
reference's gespmmAlgSel, src/ge-spmm/gespmm.cc:13-24) picks by structure
statistics; this picks by measurement — the right tool when one graph will
be multiplied thousands of times (training). Timing uses the on-device
fori_loop chain (utils/bench.time_on_device), so tunnel/dispatch overhead
does not pollute the choice.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dgsparse_tpu.core.formats import SparseTensor
from dgsparse_tpu.ops.spmm import spmm
from dgsparse_tpu.ops.types import Algorithm, as_reduce


def _candidates(sparse: SparseTensor, reduce) -> list:
    st = sparse.storage
    cands = [Algorithm.XLA_SEGMENT]
    if st.plan() is not None:
        cands.append(Algorithm.PALLAS_EDGE_TILE)
    if st.ell_plan() is not None:
        cands.append(Algorithm.PALLAS_ROW_TILE)
    if st.bell_plan() is not None and reduce.value in ("sum", "mean"):
        cands.append(Algorithm.PALLAS_BELL)
    return cands


def tune_spmm(sparse: SparseTensor, feat: int, reduce="sum",
              dtype=jnp.float32, iters: int = 20, with_grad: bool = False,
              seed: int = 0) -> Tuple[Algorithm, dict]:
    """Measure every applicable algorithm for `spmm(sparse, [N, feat])` and
    return (best_algorithm, {algorithm: seconds}).

    with_grad=True times the full fwd+bwd (training workloads); the
    forward-only and trained rankings can differ (e.g. ELL vs ESC for
    max/min on p2p are 1.33x apart forward-only but within 5% trained).
    """
    from dgsparse_tpu.utils.bench import time_on_device

    reduce = as_reduce(reduce)
    n = sparse.sparse_sizes()[1]
    m = sparse.sparse_sizes()[0]
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, feat)).astype(dtype))
    ct = jnp.asarray(rng.standard_normal((m, feat)).astype(dtype))
    vals = sparse.values_or_ones()

    times = {}
    for alg in _candidates(sparse, reduce):
        try:
            if with_grad:
                grad = jax.grad(
                    lambda v, b: jnp.vdot(
                        spmm(sparse.set_values(v), b, reduce, alg), ct),
                    argnums=(0, 1))

                def body(s, grad=grad):
                    gv, gb = grad(vals * s, x)
                    return gv.sum() + gb.sum()
            else:
                def body(s, alg=alg):
                    return spmm(sparse, x * s, reduce, alg)[0, 0]
            times[alg] = time_on_device(body, iters=iters)
        except Exception:  # e.g. kernel constraints on this backend
            continue
    if not times:
        return Algorithm.XLA_SEGMENT, times
    best = min(times, key=times.get)
    return best, times


def tune_report(sparse: SparseTensor, feats=(32, 128), reduce="sum",
                with_grad: bool = False) -> str:
    """Human-readable tuning table across feature widths."""
    lines = []
    for f in feats:
        best, times = tune_spmm(sparse, f, reduce, with_grad=with_grad)
        row = ", ".join(f"{a.name}={t * 1e6:.0f}us"
                        for a, t in sorted(times.items(),
                                           key=lambda kv: kv[1]))
        lines.append(f"F={f} reduce={reduce} best={best.name}: {row}")
    return "\n".join(lines)
