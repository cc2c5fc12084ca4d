"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Mirrors the reference's test philosophy (pytest + oracle comparison,
test/test_spmm.py) but needs no accelerator: XLA paths run on CPU, Pallas
kernels run in interpret mode, and multi-chip sharding tests use 8 virtual
host devices. Set DGSPARSE_TEST_TPU=1 to run the suite on a real TPU
(compiled Pallas) instead.

NOTE: under the axon TPU tunnel, JAX_PLATFORMS=cpu alone is ignored; the
jax.config update below is what actually forces CPU.
"""

import os

_ON_TPU = os.environ.get("DGSPARSE_TEST_TPU", "") == "1"

if not _ON_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
else:
    # persistent compile cache: the on-TPU suite compiles hundreds of
    # kernel shapes at 20-40 s each through the tunnel on a cold run
    from dgsparse_tpu.utils.cache import enable as _enable_cache

    _enable_cache()
jax.config.update("jax_enable_x64", False)

# Pallas kernels run in interpret mode off-TPU.
from dgsparse_tpu.kernels import pallas_spmm  # noqa: E402

pallas_spmm.set_interpret(jax.default_backend() != "tpu")
