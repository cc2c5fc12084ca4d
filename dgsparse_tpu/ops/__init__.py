from dgsparse_tpu.ops import (  # noqa: F401
    attention,
    edge_softmax,
    gspmm,
    sddmm,
    segment,
    spconv,
    spmm,
    spmm_mh,
    types,
)
from dgsparse_tpu.ops.attention import gat_attention  # noqa: F401
from dgsparse_tpu.ops.segment import sorted_segment_sum  # noqa: F401
from dgsparse_tpu.ops.spmm_mh import spmm_multihead  # noqa: F401
from dgsparse_tpu.ops.spconv import (  # noqa: F401
    SparseConvTensor,
    SpConvPlan,
    build_rulebook,
    inverse_plan,
)
