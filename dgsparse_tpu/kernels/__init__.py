"""Kernel layer: XLA segment-op fallback/oracle + Pallas TPU kernels.

- `xla`: gather + segment reductions (reference semantics; runs anywhere).
- `pallas_spmm`: ESC one-hot segment matmul, ELL / bucketed-ELL
  row-balance, BELL fully-in-MXU 2D kernel, `segment_matmul` primitive.
- `pallas_sddmm`: one-sided-gather SDDMM.
- `pallas_spmm_maxmin`: segmented-scan MAX/MIN with argmax residuals.

Kernel selection happens in the ops layer via `Algorithm` (AUTO resolves
per structure at trace time).
"""

from dgsparse_tpu.kernels import xla  # noqa: F401
