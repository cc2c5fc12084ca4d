"""Persistent XLA compilation cache setup.

On the tunneled TPU used here, every compile is a remote round-trip that
can take tens of seconds; enabling JAX's persistent cache makes recompiles
of identical programs instant across processes. Call early, before first
compile."""

import os


def enable(path: str = "/root/.cache/jax_comp") -> None:
    import jax

    try:
        # TPU-only: CPU AOT cache entries are machine-feature-sensitive and
        # can SIGILL when loaded on a different host.
        if jax.default_backend() != "tpu":
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
