"""Format-transform entry points on SparseTensor.

Reference parity: dgsparse/ftransform.py:6-10 — `csr2csc(sparse)` returning
(colptr, row, values_t). Here the CSC view is already cached on the Storage
(computed once at construction), so this is a zero-cost accessor plus the
value permutation.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dgsparse_tpu.core.formats import SparseTensor


def csr2csc(sparse: SparseTensor) -> Tuple[jax.Array, jax.Array,
                                           Optional[jax.Array]]:
    """(colptr, row, values_transposed) — reference ftransform.csr2csc."""
    st = sparse.storage
    values_t = None
    if sparse.has_value and st.values() is not None:
        values_t = jnp.take(st.values(), st.csr2csc())
    return st.colptr(), st.row(), values_t


def csr2coo(sparse: SparseTensor) -> Tuple[jax.Array, jax.Array,
                                           Optional[jax.Array]]:
    """(row, col, values) in CSR edge order."""
    st = sparse.storage
    return st.coo_row(), st.col(), st.values()
