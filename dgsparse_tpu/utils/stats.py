"""Graph structure statistics for load-balance heuristics.

Reference parity: calc_vari (row-degree variance, src/util/cuda_util.cuh:98,
unused there); here it actually feeds the Algorithm AUTO heuristic /
planner diagnostics.
"""

from typing import Dict

import numpy as np


def degree_stats(rowptr) -> Dict[str, float]:
    """Mean/variance/max of row degrees + imbalance ratio."""
    import jax

    rowptr = np.asarray(jax.device_get(rowptr))
    deg = np.diff(rowptr).astype(np.float64)
    mean = float(deg.mean()) if len(deg) else 0.0
    return {
        "num_rows": int(len(deg)),
        "nnz": int(rowptr[-1]) if len(rowptr) else 0,
        "mean_degree": mean,
        "degree_variance": float(deg.var()) if len(deg) else 0.0,
        "max_degree": float(deg.max()) if len(deg) else 0.0,
        "empty_rows": int((deg == 0).sum()),
        "imbalance": float(deg.max() / mean) if mean else 0.0,
    }
