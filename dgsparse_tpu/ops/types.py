"""Op enums: reduction, semiring compute, and algorithm selection.

Reference parity: REDUCEOP/COMPUTEOP enums (include/gspmm.h:13-14) and the
`algorithm` integer threaded through every reference spmm op
(dgsparse/spmm.py:5-28) plus the standalone library's `gespmmAlg_t`
(src/ge-spmm/gespmm.h:18-30). On TPU the algorithm is resolved statically at
trace time: it picks which jitted implementation (XLA segment-op path or a
Pallas kernel schedule) is compiled.
"""

import enum


class ReduceOp(enum.Enum):
    SUM = "sum"
    MAX = "max"
    MIN = "min"
    MEAN = "mean"


class ComputeOp(enum.Enum):
    """Semiring combine `compute(edge_val, node_feat)`.

    Matches reference semantics (include/gspmm.h:67-91): SUB is
    ``feat - edge`` and DIV is ``feat / edge`` (b-a / b/a with a=edge, b=feat).
    """

    ADD = "add"
    SUB = "sub"
    MUL = "mul"
    DIV = "div"


class Algorithm(enum.IntEnum):
    """Kernel schedule selector, resolved at trace time.

    The reference's integer algorithms (src/cuda/spmm_cuda.cu:36-165) map GPU
    load-balancing strategies; the TPU equivalents are tiling schedules:

    - AUTO: heuristic by feature width / graph shape (≈ gespmmAlgSel,
      src/ge-spmm/gespmm.cc:13-24).
    - XLA_SEGMENT: pure XLA gather + segment reduction (always-correct
      fallback and oracle).
    - PALLAS_ROW_TILE: padded-ELL row-balance schedule — gather + masked
      K-step weighted sum with NO segment reduction (≈ seqreduce
      row-balance); used when the structure is degree-regular (max_deg
      close to avg), otherwise falls back to the edge-tile schedule.
    - PALLAS_EDGE_TILE: Pallas kernel over fixed-size, row-block-aligned edge
      tiles with in-kernel segment reduction via one-hot MXU matmul
      (≈ nnz-balance; the row-block quantization plays the role of the
      reference spconv qkpos 128-quantization).
    - PALLAS_BELL: fully in-MXU blocked-ELL kernel over (row-block x
      column-window) 2D tiles — no gather/scatter at all; for dense-ish
      graphs (≈ the row-caching flagship, src/ge-spmm/csrspmm_rowcaching.cu,
      re-thought for the MXU).
    """

    AUTO = -1
    XLA_SEGMENT = 0
    PALLAS_ROW_TILE = 1
    PALLAS_EDGE_TILE = 2
    PALLAS_BELL = 3


# Integer aliases accepted wherever the reference accepted `algorithm: int`.
def as_algorithm(algorithm) -> Algorithm:
    if isinstance(algorithm, Algorithm):
        return algorithm
    return Algorithm(int(algorithm))


def as_reduce(op) -> ReduceOp:
    if isinstance(op, ReduceOp):
        return op
    return ReduceOp(str(op).lower())


def as_compute(op) -> ComputeOp:
    if isinstance(op, ComputeOp):
        return op
    return ComputeOp(str(op).lower())
