"""Systematic input validation, opt-in (failure-detection surface).

The reference's error handling is printf-and-exit macros
(include/cuda/cuda_util.cuh:116-134) plus scattered asserts. Here every
public op validates its SparseTensor when the mode is on — either via
`DGSPARSE_TPU_VALIDATE=1` in the environment or `debug.set_validate(True)`
— raising typed ValueErrors with the failing invariant *before* any
device work. Off by default: validation walks host copies of the index
arrays (O(nnz)), which is too expensive for a per-step training path but
exactly right for bring-up, data-pipeline debugging, and CI.
"""

import os

_validate = [os.environ.get("DGSPARSE_TPU_VALIDATE", "0") not in
             ("0", "", "false", "False")]


def set_validate(on: bool) -> None:
    _validate[0] = bool(on)


def validate_enabled() -> bool:
    return _validate[0]


def maybe_validate(sparse) -> None:
    """Called by op entry points; no-op unless enabled or the tensor is
    traced (validation needs concrete arrays)."""
    if not _validate[0]:
        return
    import jax

    if isinstance(sparse.storage.col(), jax.core.Tracer):
        return
    sparse.validate()
