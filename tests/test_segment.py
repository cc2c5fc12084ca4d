"""sorted_segment_sum public utility."""

import jax
import jax.numpy as jnp
import numpy as np

from dgsparse_tpu.ops.segment import sorted_segment_sum
from dgsparse_tpu.ops import segment as segmod
from dgsparse_tpu.kernels.pallas_spmm import segment_matmul


def test_matches_xla_segment_sum():
    rng = np.random.default_rng(0)
    n, s, f = 1000, 137, 64
    ids = np.sort(rng.integers(0, s, n)).astype(np.int32)
    data = rng.standard_normal((n, f)).astype(np.float32)
    out = sorted_segment_sum(jnp.asarray(data), ids, s)
    ref = jax.ops.segment_sum(jnp.asarray(data), jnp.asarray(ids),
                              num_segments=s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_path_directly():
    """Exercise the plan+kernel path even off-TPU (interpret mode)."""
    rng = np.random.default_rng(1)
    n, s, f = 600, 90, 32
    ids = np.sort(rng.integers(0, s, n)).astype(np.int32)
    data = rng.standard_normal((n, f)).astype(np.float32)
    plan = segmod._plan_from_segments(ids, s)
    f_pad = 128
    dp = np.zeros((n, f_pad), np.float32)
    dp[:, :f] = data
    valid = np.asarray(plan.eperm) >= 0
    gathered = np.zeros((plan.padded_edges, f_pad), np.float32)
    gathered[valid] = dp[np.asarray(plan.eperm)[valid]]
    out = segment_matmul(jnp.asarray(gathered), plan.lrow, plan.tile_rb,
                         plan.num_tiles, plan.edge_tile, plan.row_block, s)
    ref = np.zeros((s, f_pad), np.float32)
    np.add.at(ref, ids, dp)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_unsorted_raises():
    import pytest

    ids = np.array([3, 1, 2], np.int32)
    data = np.ones((3, 4), np.float32)
    if jax.default_backend() == "tpu":
        with pytest.raises(ValueError):
            sorted_segment_sum(jnp.asarray(data), ids, 4)
