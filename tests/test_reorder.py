"""RCM reordering: bandwidth shrinks, SpMM results permute consistently,
BELL cells fill better on local graphs."""

import jax.numpy as jnp
import numpy as np

from dgsparse_tpu import SparseTensor, spmm_sum
from dgsparse_tpu.core.planner import build_bell_plan
from dgsparse_tpu.core.reorder import bandwidth, permute_csr, rcm_permutation


def geometric_graph(n=800, radius=0.06, seed=0):
    """Random geometric graph scattered in the unit square with SHUFFLED
    ids (locality exists but labels hide it)."""
    rng = np.random.default_rng(seed)
    pts = rng.random((n, 2))
    # grid binning for neighbor search
    edges = []
    cell = {}
    g = int(1 / radius)
    ids = (pts * g).astype(int)
    for i, (cx, cy) in enumerate(ids):
        cell.setdefault((cx, cy), []).append(i)
    for i, (cx, cy) in enumerate(ids):
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for j in cell.get((cx + dx, cy + dy), ()):
                    if i != j and np.sum((pts[i] - pts[j]) ** 2) < radius ** 2:
                        edges.append((i, j))
    edges = np.array(edges, np.int64)
    shuffle = rng.permutation(n)
    u, v = shuffle[edges[:, 0]], shuffle[edges[:, 1]]
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    rowptr = np.zeros(n + 1, np.int64)
    np.add.at(rowptr, u + 1, 1)
    return np.cumsum(rowptr).astype(np.int32), v.astype(np.int32), n


def test_rcm_reduces_bandwidth_and_helps_bell():
    rowptr, col, n = geometric_graph()
    vals = np.random.default_rng(1).standard_normal(len(col)).astype(
        np.float32)
    bw0 = bandwidth(rowptr, col)
    perm = rcm_permutation(rowptr, col)
    assert sorted(perm.tolist()) == list(range(n))
    rp2, col2, vals2 = permute_csr(rowptr, col, vals, perm)
    bw1 = bandwidth(rp2, col2)
    assert bw1 < bw0 * 0.5, (bw0, bw1)

    pad0 = build_bell_plan(rowptr, col, n).pad_ratio()
    pad1 = build_bell_plan(rp2, col2, n).pad_ratio()
    assert pad1 < pad0, (pad0, pad1)


def test_permute_preserves_spmm():
    rowptr, col, n = geometric_graph(seed=3)
    rng = np.random.default_rng(4)
    vals = rng.standard_normal(len(col)).astype(np.float32)
    x = rng.standard_normal((n, 16)).astype(np.float32)

    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(n, n))
    out = np.asarray(spmm_sum(sp, jnp.asarray(x), 0))

    perm = rcm_permutation(rowptr, col)
    rp2, col2, vals2 = permute_csr(rowptr, col, vals, perm)
    sp2 = SparseTensor.from_csr(jnp.asarray(rp2), jnp.asarray(col2),
                                jnp.asarray(vals2), sparse_sizes=(n, n))
    out2 = np.asarray(spmm_sum(sp2, jnp.asarray(x[perm]), 0))
    np.testing.assert_allclose(out2, out[perm], rtol=1e-4, atol=1e-5)
