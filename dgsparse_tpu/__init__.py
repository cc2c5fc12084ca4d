"""dgsparse_tpu — a TPU-native sparse kernel library for GNNs and point clouds.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
dgSPARSE-Lib (reference: /root/reference, a single-GPU CUDA library):

- CSR SpMM with sum/max/min/mean reductions and full autodiff
  (reference: src/spmm.cpp, src/cuda/spmm_cuda.cu)
- SDDMM producing per-edge values (reference: src/sddmm/)
- Generalized semiring SpMM, the `u_*_e_*` op grid (reference: src/gspmm-fp/)
- Submanifold / strided 3D sparse convolution with a rulebook builder
  (reference: src/spconv.cpp, src/cuda/sparse_mapping.cu)
- SparseTensor/Storage CSR container with an eagerly cached CSC view
  (reference: dgsparse/tensor.py, dgsparse/storage.py)
- GCN / GIN / GAT modules (reference: dgsparse/nn/)
- NEW (no reference equivalent): row-block sharded multi-chip execution via
  jax.sharding / shard_map over a TPU mesh.

Design stance: sparsity structure is planned on the host once (binning,
padding, tiling into MXU-shaped blocks); every device step is static-shape
gathers + dense dots + segment reductions, jitted end-to-end. Autograd is
jax.custom_vjp instead of torch::autograd::Function.
"""

__version__ = "0.1.0"

from dgsparse_tpu.core.formats import SparseTensor, Storage
from dgsparse_tpu.core.transform import csr2csc, coo2csr, csr2coo
from dgsparse_tpu.core import ftransform
from dgsparse_tpu.ops.types import ReduceOp, ComputeOp, Algorithm
from dgsparse_tpu.ops.spmm import spmm, spmm_sum, spmm_mean, spmm_max, spmm_min
from dgsparse_tpu.ops.spmm_mh import spmm_multihead
from dgsparse_tpu.ops.spmm_coo import spmm_coo
from dgsparse_tpu.ops.slot import (SlotValues, sddmm_slots, edge_softmax_slots,
                                   spmm_slots, slots_to_edges, edges_to_slots)
from dgsparse_tpu.ops.sddmm import sddmm, sddmm_coo
from dgsparse_tpu.ops.gspmm import gspmm, GSpMM_u_e, GSpMM_u
from dgsparse_tpu.ops.attention import gat_attention
from dgsparse_tpu.ops.edge_softmax import edge_softmax

def version() -> dict:
    """Build/runtime info (reference parity: dgsparse._C.cuda_version(),
    src/version.cpp:11-21 — here: jax/backend/native-lib versions)."""
    import jax

    from dgsparse_tpu import native

    return {
        "dgsparse_tpu": __version__,
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "native": native.load().dg_version() if native.available() else None,
    }


def self_check(require_native: bool = False) -> None:
    """Post-install smoke test: plan construction + one SpMM on a tiny
    graph, checked against a pure-numpy oracle. Used by the conda recipe's
    `test.commands` and the docker HEALTHCHECK (packaging parity with the
    reference's `test: imports:` block, conda/dgsparse/meta.yaml:32-34 —
    ours additionally runs a numeric op, since a JAX install can import
    fine yet have a broken backend).

    require_native=True additionally asserts the C++ host library loaded
    (for installs that built it — docker/conda — where a silent numpy
    fallback would contradict the packaging)."""
    import numpy as np
    import jax.numpy as jnp

    if require_native:
        from dgsparse_tpu import native as _native

        if not _native.available():
            raise RuntimeError(
                "native host library (libdgsparse_host.so) did not load — "
                "this install was built with it; check package data "
                "shipped (dgsparse_tpu/libdgsparse_host.so)")

    rowptr = np.array([0, 2, 3, 3, 5], np.int32)
    col = np.array([1, 3, 0, 2, 2], np.int32)
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0], np.float32)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(4, 4))
    x = np.arange(8, dtype=np.float32).reshape(4, 2)
    out = np.asarray(spmm(sp, jnp.asarray(x), "sum"))
    ref = np.zeros((4, 2), np.float32)
    for r in range(4):
        for e in range(rowptr[r], rowptr[r + 1]):
            ref[r] += vals[e] * x[col[e]]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


__all__ = [
    "SparseTensor",
    "self_check",
    "Storage",
    "ftransform",
    "version",
    "csr2csc",
    "coo2csr",
    "csr2coo",
    "ReduceOp",
    "ComputeOp",
    "Algorithm",
    "spmm",
    "spmm_sum",
    "spmm_mean",
    "spmm_max",
    "spmm_min",
    "spmm_multihead",
    "spmm_coo",
    "SlotValues",
    "sddmm_slots",
    "edge_softmax_slots",
    "spmm_slots",
    "slots_to_edges",
    "edges_to_slots",
    "sddmm",
    "sddmm_coo",
    "gspmm",
    "GSpMM_u_e",
    "GSpMM_u",
    "edge_softmax",
    "gat_attention",
    "__version__",
]
