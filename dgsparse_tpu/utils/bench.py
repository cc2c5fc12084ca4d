"""Timing + profiling utilities (SURVEY.md §5 aux subsystems).

The reference times with cudaEvent GpuTimer (example/util/sp_util.hpp:141)
and `time.time()+torch.cuda.synchronize` loops (benchmark/bench_spmm_time.py).
TPU equivalents: `jax.block_until_ready` wall timing and `jax.profiler`
traces. The GFLOPS formula matches the reference: 2*nnz*N/time
(example/ge-spmm/spmm.cu:162-164).
"""

import contextlib
import time
from typing import Callable

import jax
import numpy as _np


def _sync(x):
    """Force COMPLETION of a (scalar-ish) computation.

    jax.block_until_ready is NOT sufficient on the tunneled axon backend:
    after a service restart it was observed to return before the device
    finished (a 100x 2048^3 matmul chain "measured" 33 ms via
    block_until_ready vs 346 ms via result fetch). Fetching the value is
    the only portable completion barrier, so every timing helper syncs by
    device_get of its (scalar) result."""
    return jax.device_get(x)


def time_fn(fn: Callable, *args, warmup: int = 10, iters: int = 100) -> float:
    """Mean wall time per call, synchronized (GpuTimer analog). Includes
    host dispatch; prefer time_on_device for pure kernel time on remote/
    tunneled devices."""
    for _ in range(warmup):
        r = fn(*args)
    jax.tree.map(_sync, r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.tree.map(_sync, r)
    return (time.perf_counter() - t0) / iters


def time_on_device(op: Callable, *args, iters: int = 50) -> float:
    """Per-iteration time of `op(scale, *args)` looped ON DEVICE inside one
    jit call (lax.fori_loop; `scale` is a f32 scalar threading a data
    dependency between iterations — multiply an input by it). Excludes
    per-call host dispatch — the analog of the reference's on-GPU cudaEvent
    timing (example/util/sp_util.hpp:141-169)."""
    import jax.numpy as jnp

    @jax.jit
    def run(s):
        def body(i, s):
            out = op(s, *args)
            # consume the FULL output: feeding back a single element lets
            # XLA slice/DCE the computation under measurement (observed:
            # a gradient chain consuming gv[0] measured 0.05 ms for real
            # ~24 ms of work). The added reduction is noise by comparison.
            return 1.0 + 0.0 * jnp.sum(out)

        return jax.lax.fori_loop(0, iters, body, s)

    _sync(run(jnp.float32(1.0)))
    t0 = time.perf_counter()
    _sync(run(jnp.float32(1.0)))
    return (time.perf_counter() - t0) / iters


def time_on_device_2pt(op: Callable, *args, iters=(50, 250),
                       repeats: int = 3) -> float:
    """Two-point on-device timing: run the fori_loop chain at two iteration
    counts and solve out the fixed per-dispatch cost.

    The tunneled TPU adds a FIXED latency per dispatched computation that
    varies by session (measured 1.3 ms .. 29 ms!). A single-count
    measurement reports (fixed + N*real)/N — at N=50 and 29 ms that is
    +580 us/iter of pure artifact (this polluted every round-1 number,
    including the '3.83 ns/row gather ceiling'). The difference of two
    counts cancels the fixed term exactly."""
    import jax.numpy as jnp

    n1, n2 = iters

    def make(n):
        @jax.jit
        def run(s):
            def body(i, s):
                out = op(s, *args)
                # consume the FULL output (see time_on_device)
                return 1.0 + 0.0 * jnp.sum(out)

            return jax.lax.fori_loop(0, n, body, s)

        return run

    r1, r2 = make(n1), make(n2)
    _sync(r1(jnp.float32(1.0)))
    _sync(r2(jnp.float32(1.0)))
    diffs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(r1(jnp.float32(1.0)))
        t1 = time.perf_counter()
        _sync(r2(jnp.float32(1.0)))
        t2 = time.perf_counter()
        diffs.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return max(_robust_min(diffs), 0.0)





def time_pytree_2pt(fn: Callable, args: tuple, iters=(50, 250),
                    repeats: int = 3) -> float:
    """Two-point on-device timing of fn(*args) with ARRAY-CARRY chaining.

    The scalar-scaling convention (op(x * s)) is UNSOUND for gradients of
    linear ops: grad wrt a weight whose cotangent is a closure constant is
    loop-INVARIANT and XLA hoists the whole backward out of the loop
    (observed: a real 2+ ms spconv fwd+bwd measured 0). Here every float
    input is a loop carry, multiplied by (1 + 2^-20) per iteration —
    nothing is invariant and no scalar factor can be algebraically pulled
    through the computation. Integer leaves (indices) pass through
    untouched. Outputs are consumed in full via a carried accumulator.
    The two iteration counts cancel the tunnel's fixed dispatch latency."""
    import jax.numpy as jnp

    def _bump(a):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            # the factor must be representable != 1.0 in a's OWN dtype:
            # 1 + 2^-20 rounds to exactly 1.0 in bf16/f16, making the
            # carry loop-invariant and letting XLA hoist the whole body
            # (observed: a 10 ms bf16 spmm "measured" 2.8 us)
            eps = 2.0 ** -20 if jnp.finfo(a.dtype).nmant >= 20 else 2.0 ** -7
            return a * jnp.asarray(1.0 + eps, a.dtype)
        return a

    def _consume(out):
        leaves = [x for x in jax.tree.leaves(out)
                  if hasattr(x, "dtype")
                  and jnp.issubdtype(x.dtype, jnp.floating)]
        return sum((jnp.sum(x.astype(jnp.float32)) * 1e-30 for x in leaves),
                   jnp.float32(0.0))

    def make(n):
        @jax.jit
        def run(args):
            def body(i, c):
                a, acc = c
                out = fn(*a)
                return jax.tree.map(_bump, a), acc + _consume(out)

            return jax.lax.fori_loop(0, n, body,
                                     (args, jnp.float32(0.0)))[1]

        return run

    n1, n2 = iters
    r1, r2 = make(n1), make(n2)
    _sync(r1(args))
    _sync(r2(args))
    diffs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(r1(args))
        t1 = time.perf_counter()
        _sync(r2(args))
        t2 = time.perf_counter()
        diffs.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return max(_robust_min(diffs), 0.0)


def _robust_min(diffs):
    """Min over two-point differences, DISCARDING glitch-deflated ones.

    A transient device/tunnel stall during the SHORT loop inflates t1-t0
    and deflates the difference — min() then keeps the artifact (observed
    2026-08-20: a p2p F=64 forward 'measured' 210 us between two runs of
    the same op at 536/676 us; gather-bound forwards are flat in F, so
    the number was impossible). Keep diffs within 0.6x of the median and
    take their min: robust to one glitch either way at repeats=3 while
    preserving min's usual noise rejection."""
    med = sorted(diffs)[len(diffs) // 2]
    kept = [d for d in diffs if d >= 0.6 * med]
    return min(kept) if kept else med


def spmm_gflops(nnz: int, feat: int, seconds: float) -> float:
    """2*nnz*N/t (example/ge-spmm/spmm.cu:162-164)."""
    return 2.0 * nnz * feat / seconds / 1e9


def roofline_fraction(bytes_accessed: int, seconds: float,
                      hbm_gbps: float = 819.0) -> float:
    """Fraction of HBM roofline achieved (v5e ~819 GB/s by default)."""
    return bytes_accessed / seconds / 1e9 / hbm_gbps


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/dgsparse_trace"):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
