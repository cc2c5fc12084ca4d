"""A/B lane-pack formulations for the F<128 ELL K-sum on the headline
graph: (a) unpacked, (b) packed with materialized wp (current
_gather_ksum_packed), (c) mul-first packed — multiply by w in the
[rb*k2, f] 32-lane space, THEN reshape to 128 lanes for the K-sum, so no
[rb, k2/g, 128] weight repeat is ever materialized.

Usage: python benchmark/probe_lanepack2.py [feat=32]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgsparse_tpu.utils.cache import enable

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _round_up(x, m):
    return (x + m - 1) // m * m


def main():
    from dgsparse_tpu import SparseTensor
    from dgsparse_tpu.kernels.pallas_spmm import _ell_recombine
    from dgsparse_tpu.utils.bench import time_pytree_2pt
    from dgsparse_tpu.utils.testing import load_mtx

    feat = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    jax.device_get(jnp.zeros((8,), jnp.float32) + 1.0)
    mtx = "/root/reference/example/data/p2p-Gnutella31.mtx"
    rowptr, col, vals, (m, n) = load_mtx(mtx)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(m, n))
    st = sp.storage
    plan = st._ell_fwd
    w_slot = st.vslot()["ell"] if st.vslot() else None
    if isinstance(w_slot, dict):
        w_slot = w_slot.get("ell")
    nnz = len(col)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, feat)).astype(np.float32))
    f = feat
    g = 128 // f

    def run(variant, dense):
        outs = []
        o2 = 0
        for cols, mask, eperm, _rows, k in plan.bucket_views():
            rb, k = cols.shape
            w = jax.lax.slice(w_slot, (o2,), (o2 + rb * k,)).reshape(rb, k)
            o2 += rb * k
            if variant == "unpacked" or k == 0:
                gathered = jnp.take(dense, cols.reshape(-1), axis=0)
                gathered = gathered.reshape(rb, k, f)
                outs.append((w.astype(gathered.dtype)[:, :, None] *
                             gathered).sum(axis=1, dtype=jnp.float32)
                            .astype(dense.dtype))
                continue
            k2 = _round_up(k, g)
            if k2 != k:
                cols = jnp.pad(cols, ((0, 0), (0, k2 - k)), mode="edge")
                w = jnp.pad(w, ((0, 0), (0, k2 - k)))
            gathered = jnp.take(dense, cols.reshape(-1), axis=0)
            if variant == "packed_wp":
                gp = gathered.reshape(rb, k2 // g, g * f)
                wp = jnp.repeat(w.reshape(rb, k2 // g, g), f, axis=2)
                acc = (wp.astype(gp.dtype) * gp).sum(axis=1,
                                                     dtype=jnp.float32)
            else:  # mulfirst
                wg = w.reshape(-1, 1).astype(gathered.dtype) * gathered
                acc = wg.reshape(rb, k2 // g, g * f).sum(
                    axis=1, dtype=jnp.float32)
            outs.append(acc.reshape(rb, g, f).sum(axis=1)
                        .astype(dense.dtype))
        return _ell_recombine(plan, jnp.concatenate(outs, axis=0))

    ref = None
    for variant in ("unpacked", "packed_wp", "mulfirst"):
        fn = jax.jit(lambda x, v=variant: run(v, x))
        out = np.asarray(jax.device_get(fn(b)))
        if ref is None:
            ref = out
        else:
            err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-30)
            assert err < 1e-5, (variant, err)
        dt = time_pytree_2pt(fn, (b,), iters=(50, 250), repeats=3)
        gf = 2 * nnz * f / dt / 1e9
        log(f"p2p F={f} {variant:10s}: {dt*1e6:8.1f} us  {gf:6.2f} GF/s")


if __name__ == "__main__":
    main()
