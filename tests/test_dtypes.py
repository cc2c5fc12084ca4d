"""dtype handling: bf16 feature matrices through every op/kernel path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgsparse_tpu import Algorithm, SparseTensor, gspmm, sddmm, spmm
from dgsparse_tpu.utils.testing import random_csr, spmm_oracle


def make(feat=32, seed=0, m=200, n=180):
    rowptr, col, values = random_csr(m, n, avg_degree=6.0, seed=seed)
    rng = np.random.default_rng(seed + 1)
    dense = rng.standard_normal((n, feat)).astype(np.float32)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(values), sparse_sizes=(m, n))
    return sp, rowptr, col, values, dense


@pytest.mark.parametrize("alg", [Algorithm.XLA_SEGMENT,
                                 Algorithm.PALLAS_EDGE_TILE])
def test_spmm_bf16(alg):
    sp, rowptr, col, values, dense = make()
    xb = jnp.asarray(dense).astype(jnp.bfloat16)
    out = spmm(sp, xb, "sum", alg)
    assert out.dtype == jnp.bfloat16
    ref = spmm_oracle(rowptr, col, values, dense, "sum")
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32), ref,
                               rtol=0.05, atol=0.1)


def test_spmm_bf16_grad_dtypes():
    sp, rowptr, col, values, dense = make()
    xb = jnp.asarray(dense).astype(jnp.bfloat16)
    v = jnp.asarray(values)

    def loss(v_, x_):
        return spmm(sp.set_values(v_), x_, "sum").astype(jnp.float32).sum()

    gv, gx = jax.grad(loss, argnums=(0, 1))(v, xb)
    assert gv.dtype == v.dtype
    assert gx.dtype == xb.dtype
    assert np.isfinite(np.asarray(gv, np.float32)).all()


def test_sddmm_mixed():
    sp, rowptr, col, values, dense = make(feat=16)
    d1 = jnp.asarray(np.random.default_rng(3)
                     .standard_normal((200, 16)).astype(np.float32))
    out32 = sddmm(sp, d1, jnp.asarray(dense))
    assert out32.dtype == jnp.float32
    assert np.isfinite(np.asarray(out32)).all()
