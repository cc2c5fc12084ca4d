"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Mirrors the reference's test philosophy (pytest + oracle comparison,
test/test_spmm.py) but needs no accelerator: XLA paths run on CPU, Pallas
kernels run in interpret mode, and multi-chip sharding tests use
xla_force_host_platform_device_count=8.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
