"""Checkpoint/restore for model params + optimizer state (orbax-backed).

The reference has no checkpointing at all (SURVEY.md §5 — its only
serialization is test fixtures); on TPU this is table stakes for training,
so a minimal orbax wrapper is provided.
"""

import os
from typing import Any, Optional

import jax


def save(path: str, state: Any) -> None:
    """Save a pytree (params / opt state / whatever) to `path`."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree saved with `save`. `template` (a pytree of like
    shapes/dtypes) restores to concrete arrays matching it."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, template) \
            if hasattr(ocp.utils, "to_shape_dtype_struct") else template
        return ckptr.restore(path, target)
    return ckptr.restore(path)
