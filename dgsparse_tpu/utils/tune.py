"""Empirical algorithm selection: time every applicable schedule on the
real device, return the fastest, and PERSIST the choice.

The static AUTO heuristic (ops/spmm._resolve_algorithm, the analog of the
reference's gespmmAlgSel, src/ge-spmm/gespmm.cc:13-24) picks by structure
statistics; this picks by measurement — the right tool when one graph will
be multiplied thousands of times (training). Results are cached on disk
keyed by (structure hash, feat, reduce, backend, fwd/trained): a second
process picks the tuned schedule with zero re-timing, and `spmm(...,
algorithm=AUTO)` consults the cache before falling back to the heuristic.
"""

import hashlib
import json
import os
import threading
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dgsparse_tpu.core.formats import SparseTensor
from dgsparse_tpu.ops.spmm import spmm
from dgsparse_tpu.ops.types import Algorithm, as_reduce

_CACHE_PATH = os.environ.get(
    "DGSPARSE_TUNE_CACHE",
    os.path.expanduser("~/.cache/dgsparse_tpu/tune.json"))
_LOCK = threading.Lock()
_CACHE: Optional[dict] = None


def structure_key(sparse: SparseTensor) -> str:
    """Stable hash of the sparsity structure. Samples up to 64K entries of
    rowptr/col (a perf-cache collision only costs speed, never
    correctness) plus exact (M, N, nnz). Storage precomputes this at
    construction (`_tune_key`) with the identical recipe."""
    st = sparse.storage
    if getattr(st, "_tune_key", None) is not None:
        return st._tune_key
    m, n = sparse.sparse_sizes()
    nnz = sparse.nnz
    h = hashlib.blake2b(digest_size=12)
    h.update(f"{m},{n},{nnz}".encode())
    for arr in (st.rowptr(), st.col()):
        a = np.asarray(jax.device_get(arr))
        step = max(len(a) // 65536, 1)
        h.update(np.ascontiguousarray(a[::step]).tobytes())
    return h.hexdigest()


def lookup_key(skey: Optional[str], feat: int, reduce,
               with_grad: bool = False) -> Optional[Algorithm]:
    """Dict-lookup-only variant of cached_algorithm for trace-time use
    (spmm's AUTO): no device access, ~microseconds."""
    if skey is None:
        return None
    hit = _load().get(_entry_key(skey, feat, reduce, with_grad))
    if hit is None:
        return None
    try:
        return Algorithm[hit["alg"]]
    except KeyError:
        return None


def _entry_key(skey: str, feat: int, reduce, with_grad: bool) -> str:
    return (f"{skey}|f{feat}|{reduce.value}|{jax.default_backend()}|"
            f"{'trained' if with_grad else 'fwd'}")


def _load() -> dict:
    global _CACHE
    with _LOCK:
        if _CACHE is None:
            try:
                with open(_CACHE_PATH) as f:
                    _CACHE = json.load(f)
            except Exception:
                _CACHE = {}
        return _CACHE


def _store(key: str, alg: Algorithm, times: dict) -> None:
    cache = _load()
    with _LOCK:
        cache[key] = {"alg": alg.name,
                      "times_us": {a.name: round(t * 1e6, 1)
                                   for a, t in times.items()}}
        try:
            os.makedirs(os.path.dirname(_CACHE_PATH), exist_ok=True)
            tmp = _CACHE_PATH + ".tmp"
            with open(tmp, "w") as f:
                json.dump(cache, f, indent=1)
            os.replace(tmp, _CACHE_PATH)
        except Exception:
            pass


def cached_algorithm(sparse: SparseTensor, feat: int, reduce="sum",
                     with_grad: bool = False) -> Optional[Algorithm]:
    """Previously tuned algorithm for this (structure, feat, reduce), or
    None. Zero device work."""
    reduce = as_reduce(reduce)
    key = _entry_key(structure_key(sparse), feat, reduce, with_grad)
    hit = _load().get(key)
    if hit is None:
        return None
    try:
        return Algorithm[hit["alg"]]
    except KeyError:
        return None


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
              dtype=jnp.float32, iters=(20, 60), with_grad: bool = False,
              seed: int = 0, use_cache: bool = True,
              ) -> Tuple[Algorithm, dict]:
    """Measure every applicable algorithm for `spmm(sparse, [N, feat])` and
    return (best_algorithm, {algorithm: seconds}).

    with_grad=True times the full fwd+bwd (training workloads); the
    forward-only and trained rankings can differ. Timing is two-point
    on-device with array-carry chaining (utils/bench.time_pytree_2pt) so neither dispatch
    nor the tunnel's fixed latency pollutes the ranking. The winner is
    persisted; a later call (any process) with the same structure returns
    it instantly."""
    from dgsparse_tpu.utils.bench import time_pytree_2pt

    reduce = as_reduce(reduce)
    skey = structure_key(sparse)
    key = _entry_key(skey, feat, reduce, with_grad)
    if use_cache:
        hit = _load().get(key)
        if hit is not None:
            try:
                return Algorithm[hit["alg"]], {
                    Algorithm[a]: t / 1e6
                    for a, t in hit.get("times_us", {}).items()}
            except KeyError:
                pass

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
                # array-carry chain + nonlinear loss: carried inputs keep
                # the backward loop-variant, and out*out keeps the FORWARD
                # alive (grad of a linear vdot loss discards the primal
                # and XLA drops the forward entirely — PERF_GUIDE rule 5)
                def body(v, b, alg=alg):
                    def loss(v_, b_):
                        out = spmm(sparse.set_values(v_), b_, reduce, alg)
                        return jnp.vdot(out * out, ct)

                    return jax.value_and_grad(loss, argnums=(0, 1))(v, b)

                times[alg] = time_pytree_2pt(body, (vals, x), iters=iters)
            else:
                times[alg] = time_pytree_2pt(
                    lambda b, alg=alg: spmm(sparse, b, reduce, alg), (x,),
                    iters=iters)
        except Exception:  # e.g. kernel constraints on this backend
            continue
    if not times:
        return Algorithm.XLA_SEGMENT, times
    best = min(times, key=times.get)
    _store(key, best, times)
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
