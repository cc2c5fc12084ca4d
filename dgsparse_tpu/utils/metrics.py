"""Op-level dispatch counters (observability surface).

The reference has printf-only observability (SURVEY.md §5). Here every op
records, at TRACE time, which kernel schedule the dispatcher chose and the
static workload shape — so a user can ask "which schedules is my model
actually running?" without reading XLA dumps:

    from dgsparse_tpu.utils import metrics
    metrics.enable()
    ... build/jit/run model ...
    print(metrics.summary())

Counters increment when a dispatch decision happens — once per trace for
jitted code (the decision is static), once per call for eager code. That
is the honest TPU semantics: under jit there IS no per-call dispatch.
Zero overhead when disabled (one bool check per op trace).
"""

import threading
from typing import Dict

_lock = threading.Lock()
_enabled = False
_counters: Dict[tuple, int] = {}


def enable() -> None:
    global _enabled
    _enabled = True


def disable() -> None:
    global _enabled
    _enabled = False


def reset() -> None:
    with _lock:
        _counters.clear()


def record(op: str, **tags) -> None:
    """Called by op dispatchers; no-op unless enabled."""
    if not _enabled:
        return
    key = (op,) + tuple(sorted(tags.items()))
    with _lock:
        _counters[key] = _counters.get(key, 0) + 1


def counters() -> Dict[tuple, int]:
    with _lock:
        return dict(_counters)


def summary() -> str:
    with _lock:
        items = sorted(_counters.items())
    if not items:
        return "(no dispatches recorded — is metrics.enable() on?)"
    lines = []
    for (op, *tags), n in items:
        tag_s = " ".join(f"{k}={v}" for k, v in tags)
        lines.append(f"{op:14s} x{n:<5d} {tag_s}")
    return "\n".join(lines)
