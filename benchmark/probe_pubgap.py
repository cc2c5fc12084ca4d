"""Why is the public spmm(PALLAS_ROW_TILE) slower than a bare
spmm_bucketed_ell loop over the same plan? Times, in ONE process/session:
(a) public spmm, (b) direct kernels.spmm_bucketed_ell call, (c) the
probe_lanepack2-style manual bucket loop. p2p F=32."""

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


def main():
    from dgsparse_tpu import Algorithm, SparseTensor, spmm
    from dgsparse_tpu.kernels import pallas_spmm as kp
    from dgsparse_tpu.utils.bench import time_pytree_2pt
    from dgsparse_tpu.utils.testing import load_mtx

    jax.device_get(jnp.zeros((8,), jnp.float32) + 1.0)
    rowptr, col, vals, (m, n) = load_mtx(
        "/root/reference/example/data/p2p-Gnutella31.mtx")
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(m, n))
    st = sp.storage
    plan = st._ell_fwd
    w_slot = st.vslot()["ell"]
    nnz = len(col)
    f = 32
    b = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((n, f)).astype(np.float32))
    log(f"plan type: {type(plan).__name__}, w_slot: "
        f"{None if w_slot is None else getattr(w_slot, 'shape', w_slot)}")

    from dgsparse_tpu.ops.types import ReduceOp

    def manual(dense):
        # probe_lanepack2's winning formulation, verbatim
        g = 128 // f
        outs = []
        o2 = 0
        for cols, mask, eperm, _rows, _k in plan.bucket_views():
            rb, k = cols.shape
            w = jax.lax.slice(w_slot, (o2,), (o2 + rb * k,)).reshape(rb, k)
            o2 += rb * k
            k2 = (k + g - 1) // g * g
            if k2 != k:
                cols = jnp.pad(cols, ((0, 0), (0, k2 - k)), mode="edge")
                w = jnp.pad(w, ((0, 0), (0, k2 - k)))
            gathered = jnp.take(dense, cols.reshape(-1), axis=0)
            gp = gathered.reshape(rb, k2 // g, g * f)
            wp = jnp.repeat(w.reshape(rb, k2 // g, g), f, axis=2)
            acc = (wp.astype(gp.dtype) * gp).sum(axis=1, dtype=jnp.float32)
            outs.append(acc.reshape(rb, g, f).sum(axis=1)
                        .astype(dense.dtype))
        return kp._ell_recombine(plan, jnp.concatenate(outs, axis=0))

    cands = {
        "public spmm": lambda x: spmm(sp, x, "sum",
                                      Algorithm.PALLAS_ROW_TILE),
        "direct bucketed_ell": lambda x: kp.spmm_bucketed_ell(
            plan, sp.storage.values(), x, ReduceOp.SUM, w_slot=w_slot),
        "direct, no w_slot": lambda x: kp.spmm_bucketed_ell(
            plan, sp.storage.values(), x, ReduceOp.SUM, w_slot=None),
        "manual probe2 loop": manual,
    }
    ref = None
    for name, fn in cands.items():
        jf = jax.jit(fn)
        out = np.asarray(jax.device_get(jf(b)))
        if ref is None:
            ref = out
        else:
            err = np.abs(out - ref).max() / np.abs(ref).max()
            assert err < 1e-5, (name, err)
        dt = time_pytree_2pt(jf, (b,), iters=(50, 250), repeats=3)
        log(f"{name:22s}: {dt*1e6:8.1f} us  {2*nnz*f/dt/1e9:6.2f} GF/s")


if __name__ == "__main__":
    main()
