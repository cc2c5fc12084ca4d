"""ftransform parity, version API, SAGE model, checkpointing."""

import jax
import jax.numpy as jnp
import numpy as np

import dgsparse_tpu
from dgsparse_tpu import SparseTensor, ftransform
from dgsparse_tpu.utils.testing import random_csr


def _sp(seed=0, m=60, n=50):
    rowptr, col, values = random_csr(m, n, avg_degree=4.0, seed=seed)
    return SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                                 jnp.asarray(values),
                                 sparse_sizes=(m, n)), rowptr, col, values


def test_ftransform_csr2csc():
    import scipy.sparse as sps

    sp, rowptr, col, values = _sp()
    colptr, row, vals_t = ftransform.csr2csc(sp)
    csc = sps.csr_matrix((values, col, rowptr), shape=sp.shape).tocsc()
    np.testing.assert_array_equal(np.asarray(colptr), csc.indptr)
    np.testing.assert_array_equal(np.asarray(row), csc.indices)
    np.testing.assert_allclose(np.asarray(vals_t), csc.data, rtol=1e-6)


def test_version():
    v = dgsparse_tpu.version()
    assert v["dgsparse_tpu"] == dgsparse_tpu.__version__
    assert "jax" in v and "backend" in v


def test_sage_trains():
    from tests.test_nn import _train, make_graph
    from dgsparse_tpu.nn import SAGE

    adj, x, y, c = make_graph(seed=8)
    losses = _train(SAGE(hidden_features=32, out_features=c), adj, x, y)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses[::10]


def test_checkpoint_roundtrip(tmp_path):
    from dgsparse_tpu.utils import checkpoint

    state = {"w": jnp.arange(12.0).reshape(3, 4), "step": jnp.asarray(7)}
    p = str(tmp_path / "ckpt")
    checkpoint.save(p, state)
    restored = checkpoint.restore(p, template=state)
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.asarray(state["w"]))
    assert int(restored["step"]) == 7
