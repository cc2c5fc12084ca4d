"""Coverage for utility modules: timers, transforms, gcn_norm, pad_nodes."""

import jax
import jax.numpy as jnp
import numpy as np

from dgsparse_tpu.core.transform import csr2coo, expand_rowptr
from dgsparse_tpu.dist import pad_nodes
from dgsparse_tpu.nn.gcn import gcn_norm_from_edge_index
from dgsparse_tpu.utils.bench import (roofline_fraction, spmm_gflops,
                                      time_on_device)
from dgsparse_tpu.utils.stats import degree_stats
from dgsparse_tpu.utils.testing import random_csr


def test_time_on_device_runs():
    x = jnp.ones((64, 64))
    t = time_on_device(lambda s, a: a * s + 1.0, x, iters=5)
    assert t > 0


def test_gflops_roofline():
    assert abs(spmm_gflops(1000, 64, 1e-3) - 2 * 1000 * 64 / 1e-3 / 1e9) \
        < 1e-9
    assert 0 < roofline_fraction(819e9, 1.0) <= 1.001


def test_csr2coo_jit_path():
    rowptr, col, _ = random_csr(40, 30, 3.0, seed=1)

    @jax.jit
    def f(rp, c):
        return csr2coo(rp, c)

    row, c = f(jnp.asarray(rowptr), jnp.asarray(col))
    ref = np.repeat(np.arange(40), np.diff(rowptr))
    np.testing.assert_array_equal(np.asarray(row), ref)


def test_gcn_norm_formula():
    # triangle graph 0-1-2-0, no self loops added manually
    edge_index = np.array([[0, 1, 1, 2, 2, 0],
                           [1, 0, 2, 1, 0, 2]])
    rowptr, col, vals = gcn_norm_from_edge_index(edge_index, 3,
                                                 add_self_loops=True)
    # with self loops every node has degree 3 -> all values 1/3
    np.testing.assert_allclose(vals, np.full(9, 1 / 3), rtol=1e-6)
    assert rowptr[-1] == 9


def test_degree_stats():
    rowptr = np.array([0, 2, 2, 5], np.int32)
    s = degree_stats(rowptr)
    assert s["num_rows"] == 3 and s["nnz"] == 5
    assert s["empty_rows"] == 1 and s["max_degree"] == 3


def test_pad_nodes():
    x = jnp.ones((10, 4))
    assert pad_nodes(x, 4).shape == (12, 4)
    assert pad_nodes(x, 5).shape == (10, 4)
    assert float(pad_nodes(x, 4)[10:].sum()) == 0


def test_tune_spmm():
    from dgsparse_tpu import SparseTensor
    from dgsparse_tpu.utils.testing import random_csr
    from dgsparse_tpu.utils.tune import tune_report, tune_spmm

    rowptr, col, vals = random_csr(900, 800, avg_degree=6, seed=1)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(900, 800))
    best, times = tune_spmm(sp, 8, "sum", iters=(2, 6), use_cache=False)
    assert best in times and len(times) >= 2
    assert all(t >= 0 for t in times.values())
    rep = tune_report(sp, feats=(8,), reduce="sum")
    assert "best=" in rep


def test_metrics_records_dispatch_decisions():
    import jax.numpy as jnp
    import numpy as np

    from dgsparse_tpu import Algorithm, SparseTensor, spmm
    from dgsparse_tpu.utils import metrics
    from dgsparse_tpu.utils.testing import random_csr

    rowptr, col, vals = random_csr(64, 64, avg_degree=3.0, seed=1)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(64, 64))
    x = jnp.asarray(np.ones((64, 8), np.float32))
    metrics.reset()
    metrics.enable()
    try:
        spmm(sp, x, "sum", Algorithm.XLA_SEGMENT)
        spmm(sp, x, "sum", Algorithm.XLA_SEGMENT)
    finally:
        metrics.disable()
    cs = metrics.counters()
    keys = [k for k in cs if k[0] == "spmm"]
    assert keys and cs[keys[0]] == 2
    assert "XLA_SEGMENT" in str(keys[0])
    assert "spmm" in metrics.summary()
    metrics.reset()
    assert metrics.counters() == {}


def test_validate_mode_catches_bad_structure():
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from dgsparse_tpu import SparseTensor, spmm
    from dgsparse_tpu.utils import debug

    sp = SparseTensor.from_csr(
        jnp.asarray(np.array([0, 1, 2], np.int32)),
        jnp.asarray(np.array([1, 0], np.int32)),
        None, sparse_sizes=(2, 2))
    # corrupt the column indices AFTER construction (a data-pipeline bug)
    sp.storage._col = jnp.asarray(np.array([5, 0], np.int32))
    x = jnp.ones((2, 4), jnp.float32)
    debug.set_validate(True)
    try:
        with pytest.raises(ValueError, match="col indices out of range"):
            spmm(sp, x, "sum")
    finally:
        debug.set_validate(False)
