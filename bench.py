"""Headline benchmark: CSR SpMM GFLOP/s on p2p-Gnutella31, feat=32, fp32.

Mirrors the reference harness (example/ge-spmm/spmm.cu: correctness check
vs reference impl, warmup + timed iterations, GFLOPS = 2*nnz*N/t) on the
same bundled graph the reference publishes numbers for. Baseline to beat:
GE-SpMM alg0 on V100 = 207.23 GFLOP/s (example/README.md:49-50, see
BASELINE.md).

Each candidate algorithm is measured in a SUBPROCESS with a timeout so a
hung device/compile can never take down the whole benchmark; children
write stage markers (init/construction/compile/timing) so a timeout is
attributed to the stage it hung in. Outage discipline (round 5 — the
round-4 capture burned 26 minutes of blind retries inside one device
outage and recorded only the XLA fallback):

  1. a 60 s PRE-FLIGHT child that only initializes the backend runs
     before any measurement child; if it fails, the parent waits and
     re-probes instead of burning an algorithm's timeout budget;
  2. a child that dies in the 'backend-init' stage is treated as a
     device outage, not an algorithm failure: the alg is rotated to the
     END of the queue and re-gated behind a fresh pre-flight;
  3. the final JSON line never silently reports the fallback as "the"
     number while a faster algorithm failed only in backend-init — it
     carries "device_outage": true plus the list of unmeasured algs.

The parent prints exactly ONE JSON line (best successful measurement)
to stdout.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

BASELINE_GFLOPS = 207.23  # GE-SpMM seqreduce row-balance, V100 (BASELINE.md)
MTX = "/root/reference/example/data/p2p-Gnutella31.mtx"
FEAT = 32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_graph():
    if os.path.exists(MTX):
        from dgsparse_tpu.utils.testing import load_mtx

        rowptr, col, vals, (m, n) = load_mtx(MTX)
        log(f"loaded {MTX}: M={m} nnz={len(col)}")
        return rowptr, col, vals, m, n
    from dgsparse_tpu.utils.testing import random_csr

    m = n = 62586
    rowptr, col, vals = random_csr(m, n, avg_degree=147892 / m, seed=0,
                                   skew=1.0)
    log(f"reference mtx missing; synthetic M={m} nnz={len(col)}")
    return rowptr, col, np.abs(vals), m, n


def _mark(stage_path: str, stage: str) -> None:
    with open(stage_path, "w") as f:
        f.write(stage)


def child(algorithm_name: str, out_path: str) -> None:
    from dgsparse_tpu.utils.cache import enable as enable_cache

    enable_cache()
    stage_path = out_path + ".stage"
    _mark(stage_path, "backend-init")
    import jax
    import jax.numpy as jnp

    from dgsparse_tpu import Algorithm, SparseTensor, spmm
    from dgsparse_tpu.utils.testing import spmm_oracle

    alg = Algorithm[algorithm_name]
    rowptr, col, vals, m, n = load_graph()
    nnz = len(col)
    # Backend/tunnel init is NOT construction: warm it with one tiny
    # round-trip first so the construction number is plan-build only
    # (round-2 capture billed 261 s of cold backend setup to
    # "construction" because the timer started before any device touch).
    t0 = time.perf_counter()
    jax.device_get(jnp.zeros((8,), jnp.float32) + 1.0)
    log(f"[{algorithm_name}] backend init {time.perf_counter() - t0:.2f}s")
    _mark(stage_path, "construction")
    t0 = time.perf_counter()
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(m, n))
    jax.device_get(sp.storage.col()[-1])
    log(f"[{algorithm_name}] construction {time.perf_counter() - t0:.2f}s")

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, FEAT)).astype(np.float32))
    backend = jax.default_backend()
    ref = spmm_oracle(rowptr, col, vals, np.asarray(b), "sum")

    # The ROW_TILE schedule has a lane-packed variant whose SIGN flips
    # between sessions (packed won 553 vs 702 us on 2026-08-18, lost 933
    # vs 766 on 2026-08-20 — benchmark/results_r5_probe.json), so the
    # persisted tripwire default can be stale for the capture session.
    # A/B BOTH variants here and report the session's best — the analog
    # of the reference harness sweeping its algorithm variants
    # (example/ge-spmm/spmm.cu:171-184).
    if algorithm_name == "PALLAS_ROW_TILE":
        from dgsparse_tpu.kernels.pallas_spmm import set_lane_pack

        variants = [("packed", True), ("unpacked", False)]
    else:
        variants = [("", None)]

    from dgsparse_tpu.utils.bench import time_pytree_2pt

    best = None
    for tag, pack in variants:
        if pack is not None:
            set_lane_pack(pack)
        # full-output correctness check (not a prefix slice)
        _mark(stage_path, "compile+correctness")
        fn = jax.jit(lambda x: spmm(sp, x, "sum", alg))
        out = np.asarray(jax.device_get(fn(b)))
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)
        log(f"[{algorithm_name}] correctness OK on {backend} "
            f"(full output{', ' + tag if tag else ''})")

        # TWO-POINT on-device timing with array-carry chaining
        # (lax.fori_loop at two iteration counts; the difference cancels
        # the tunnel's fixed per-dispatch latency — measured 1.3..29 ms
        # depending on session; a single-count loop at N=100 would
        # overstate kernel time by up to +290 us/iter, which is what
        # polluted the round-1 number).
        _mark(stage_path, "timing")
        dt = time_pytree_2pt(lambda x: spmm(sp, x, "sum", alg), (b,),
                             iters=(50, 250), repeats=3)
        gflops = 2.0 * nnz * FEAT / dt / 1e9
        log(f"[{algorithm_name}{'/' + tag if tag else ''}] "
            f"{dt * 1e6:.1f} us, {gflops:.2f} GFLOP/s")
        rec = {"alg": algorithm_name, "backend": backend,
               "us": dt * 1e6, "gflops": gflops}
        if tag:
            rec["variant"] = tag
        if best is None or rec["gflops"] > best["gflops"]:
            best = rec
        # persist after EVERY variant: if a later variant crashes or
        # hangs past the child timeout, the parent still collects the
        # measurement already made (a lost packed number cost the
        # round-4 capture dearly; never discard completed work)
        with open(out_path, "w") as f:
            json.dump(best, f)
    with open(out_path, "w") as f:
        json.dump(best, f)
    _mark(stage_path, "done")


def preflight_child() -> None:
    """Backend init only — a cheap canary for device availability."""
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    jax.device_get(jnp.zeros((8,), jnp.float32) + 1.0)
    log(f"[preflight] backend {jax.default_backend()} up in "
        f"{time.perf_counter() - t0:.2f}s")


def _device_up(timeout: int = 60) -> bool:
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--preflight"],
            timeout=timeout, check=False,
            stdout=sys.stderr, stderr=sys.stderr,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _wait_for_device(max_probes: int = 6, wait_s: int = 45) -> bool:
    """Probe until the backend initializes; bounded total ~10 min."""
    for i in range(max_probes):
        if _device_up():
            return True
        log(f"[preflight] device unavailable (probe {i + 1}/{max_probes}); "
            f"waiting {wait_s}s...")
        time.sleep(wait_s)
    return _device_up()


INIT_WATCHDOG_S = 150  # healthy backend inits measure 6-32 s


def _read_stage(stage_path: str) -> str:
    if os.path.exists(stage_path):
        with open(stage_path) as f:
            return f.read().strip()
    return "not-started"


def _run_child(alg: str, timeout: int, out_path: str):
    """One child invocation.

    Returns (result_dict_or_None, failure_cause, failure_stage). A child
    that sits in the 'backend-init' stage past INIT_WATCHDOG_S is killed
    early — it has not touched an algorithm yet, and burning the full alg
    timeout inside a device outage is what cost round 4 its capture. Post-
    init stages always get the full timeout (killing a child mid-device-op
    can wedge the tunnel; an init that never completed holds no device op).
    """
    stage_path = out_path + ".stage"
    if os.path.exists(stage_path):
        os.unlink(stage_path)
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child",
         alg, out_path],
        stdout=sys.stderr, stderr=sys.stderr,
    )
    t0 = time.monotonic()
    rc = None
    while True:
        try:
            rc = proc.wait(timeout=5)
            break
        except subprocess.TimeoutExpired:
            pass
        elapsed = time.monotonic() - t0
        stage = _read_stage(stage_path)
        if (stage in _OUTAGE_STAGES and elapsed > INIT_WATCHDOG_S) or \
                elapsed > timeout:
            proc.kill()
            proc.wait()
            rc = "timeout"
            break
    stage = _read_stage(stage_path)
    if os.path.exists(out_path):
        with open(out_path) as f:
            return json.load(f), None, None
    took = time.monotonic() - t0
    cause = (f"timed out after {took:.0f}s in stage '{stage}'"
             if rc == "timeout" else f"exited rc={rc} in stage '{stage}'")
    log(f"[{alg}] FAILED: {cause}")
    return None, cause, stage


# Stages where a failure means "the device/tunnel was down", not "the
# algorithm is broken": nothing algorithm-specific has run yet.
_OUTAGE_STAGES = ("backend-init", "not-started")


def main():
    results = []
    failures = {}        # alg -> list of failure causes
    outage_only = set()  # algs whose every failure was backend-init
    queue = [("PALLAS_ROW_TILE", 540),  # times TWO lane-pack variants
             ("PALLAS_EDGE_TILE", 360),
             ("XLA_SEGMENT", 240)]
    attempts = {alg: 0 for alg, _ in queue}
    MAX_ATTEMPTS = 3
    DEADLINE_S = 2100  # 35 min global cap on the whole capture
    t_start = time.monotonic()
    with tempfile.TemporaryDirectory() as td:
        if not _wait_for_device():
            log("[preflight] device never came up; attempting children "
                "anyway (they carry their own timeouts)")
        while queue:
            alg, timeout = queue.pop(0)
            if (attempts[alg] > 0
                    and time.monotonic() - t_start > DEADLINE_S):
                log(f"[{alg}] global deadline reached; skipping retry")
                continue
            attempts[alg] += 1
            out_path = os.path.join(td, f"{alg}.json")
            res, cause, stage = _run_child(alg, timeout, out_path)
            if res is not None:
                results.append(res)
                outage_only.discard(alg)
                continue
            failures.setdefault(alg, []).append(cause)
            if stage in _OUTAGE_STAGES:
                # Device outage, not an algorithm failure: re-gate behind
                # a fresh pre-flight and retry this alg AFTER the others,
                # giving the device time to recover.
                outage_only.add(alg)
                if attempts[alg] < MAX_ATTEMPTS:
                    log(f"[{alg}] backend-init failure -> rotating to end "
                        f"of queue (attempt {attempts[alg]}/{MAX_ATTEMPTS})")
                    queue.append((alg, timeout))
                if not _wait_for_device():
                    log("[preflight] device still down after probe window")
            else:
                # Real (post-init) failure: one immediate retry, then give
                # up on this alg. This alg's LAST failure was not an
                # outage — it must not be reported as "lost purely to
                # device outage" even if an earlier attempt was.
                outage_only.discard(alg)
                if attempts[alg] < 2:
                    log(f"[{alg}] post-init failure; retrying once...")
                    attempts[alg] += 1
                    res, cause2, _ = _run_child(alg, timeout, out_path)
                    if res is not None:
                        results.append(res)
                        outage_only.discard(alg)
                    else:
                        failures[alg].append(cause2)

    for alg, causes in failures.items():
        log(f"[{alg}] failures: {json.dumps(causes)}")
    unmeasured = sorted(a for a in attempts
                        if not any(r["alg"] == a for r in results))
    if results:
        best = max(results, key=lambda r: r["gflops"])
        record = {
            "metric": f"spmm_sum GFLOP/s (p2p-Gnutella31, feat={FEAT}, "
                      f"fp32, {best['backend']}, alg={best['alg']})",
            "value": round(best["gflops"], 2),
            "unit": "GFLOP/s",
            "vs_baseline": round(best["gflops"] / BASELINE_GFLOPS, 4),
        }
        # Honesty clause: if a (historically faster) alg was lost purely
        # to device outage, say so in the record rather than letting the
        # fallback masquerade as the framework's best.
        lost_to_outage = [a for a in unmeasured if a in outage_only]
        if lost_to_outage:
            record["device_outage"] = True
            record["unmeasured_algs"] = lost_to_outage
        print(json.dumps(record))
    else:
        print(json.dumps({
            "metric": f"spmm_sum GFLOP/s (p2p-Gnutella31, feat={FEAT}, "
                      f"fp32) — ALL MEASUREMENTS FAILED (device "
                      f"unavailable)",
            "value": 0.0,
            "unit": "GFLOP/s",
            "vs_baseline": 0.0,
            "device_outage": True,
        }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3])
    elif len(sys.argv) > 1 and sys.argv[1] == "--preflight":
        preflight_child()
    else:
        main()
