"""Is a gather with long sequential index runs slower than a random
permutation gather? Decides how to lay out the zeros block in inv_row."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgsparse_tpu.utils.cache import enable

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def dev_time(fn, x, iters=50):
    @jax.jit
    def timed(s):
        def body(i, s):
            out = fn(x * s)
            return 1.0 + 0.0 * jnp.sum(out)
        return jax.lax.fori_loop(0, iters, body, s)

    jax.block_until_ready(timed(jnp.float32(1.0)))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(timed(jnp.float32(1.0)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    m = 62586
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((m, 32)).astype(np.float32))

    # (a) fully random permutation
    pa = jnp.asarray(rng.permutation(m).astype(np.int32))
    # (b) r2 inv_row shape: 16.4K scattered + 46.2K one sequential run
    ne = np.sort(rng.choice(m, 16387, replace=False))
    inv = np.empty(m, np.int32)
    inv[ne] = rng.permutation(16387).astype(np.int32)
    emp = np.setdiff1d(np.arange(m), ne)
    inv[emp] = 16387 + np.arange(len(emp), dtype=np.int32)
    pb = jnp.asarray(inv)
    # (c) same but zeros-block targets shuffled
    inv2 = inv.copy()
    inv2[emp] = 16387 + rng.permutation(len(emp)).astype(np.int32)
    pc = jnp.asarray(inv2)
    # (d) identity (pure sequential)
    pd = jnp.asarray(np.arange(m, dtype=np.int32))

    for name, p in (("random perm", pa), ("runs (r2 inv_row)", pb),
                    ("shuffled zeros", pc), ("identity", pd)):
        dt = dev_time(lambda x, p=p: jnp.take(x, p, axis=0), src)
        print(f"{name:22s} {dt*1e6:8.1f} us ({dt/m*1e9:5.2f} ns/row)",
              flush=True)


if __name__ == "__main__":
    main()
