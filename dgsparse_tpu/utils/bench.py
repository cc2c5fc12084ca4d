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


def time_fn(fn: Callable, *args, warmup: int = 10, iters: int = 100) -> float:
    """Median-free mean wall time per call, synchronized (GpuTimer analog)."""
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


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
