"""Lane-pack regression tripwire (VERDICT r3 #10): the packed-K-sum
default for F<=32 rests on within-session A/Bs whose ~5 % margin is
smaller than the tunnel's session-to-session spread (±10-20 %,
docs/BENCHMARKS.md §1) — so this TPU-suite guard re-runs the interleaved
A/B (N=5 rounds) and PERSISTS the measured sign via
kernels.pallas_spmm.record_lane_pack_default; auto mode honours the
recorded sign, flipping the default back if a future change inverts it.

Runs only on a real TPU backend (skipped on CPU/interpret CI).
"""

import os

import numpy as np
import pytest

MTX = "/root/reference/example/data/p2p-Gnutella31.mtx"


def test_lane_pack_flag_file_roundtrip(tmp_path, monkeypatch):
    """Unit test of the flag plumbing (runs everywhere): the persisted
    sign overrides auto mode on TPU-like gates."""
    from dgsparse_tpu.kernels import pallas_spmm as kp

    path = tmp_path / "lanepack.json"
    monkeypatch.setattr(kp, "_LANE_PACK_FLAG_PATH", str(path))
    monkeypatch.setattr(kp, "_LANE_PACK_FILE", [0])
    kp.record_lane_pack_default(False, {"src": "unit"})
    assert kp._lane_pack_file_flag() is False
    # fresh read from disk
    monkeypatch.setattr(kp, "_LANE_PACK_FILE", [0])
    assert kp._lane_pack_file_flag() is False
    kp.record_lane_pack_default(True, {"src": "unit"})
    assert kp._lane_pack_file_flag() is True


@pytest.mark.tpu
def test_lane_pack_ab_guard():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("lane-pack A/B needs the real TPU")
    import jax.numpy as jnp

    from dgsparse_tpu import Algorithm, SparseTensor, spmm
    from dgsparse_tpu.kernels import pallas_spmm as kp
    from dgsparse_tpu.utils.bench import time_pytree_2pt
    from dgsparse_tpu.utils.testing import load_mtx, random_csr

    if os.path.exists(MTX):
        rowptr, col, vals, (m, n) = load_mtx(MTX)
    else:
        m = n = 62586
        rowptr, col, vals = random_csr(m, n, avg_degree=2.4, seed=0)
    sp = SparseTensor.from_csr(jnp.asarray(rowptr), jnp.asarray(col),
                               jnp.asarray(vals), sparse_sizes=(m, n))
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, 32)).astype(np.float32))

    def measure():
        return time_pytree_2pt(
            lambda x: spmm(sp, x, "sum", Algorithm.PALLAS_ROW_TILE), (b,),
            iters=(20, 100), repeats=1)

    wins = 0
    pairs = []
    try:
        for _ in range(5):         # interleaved so session drift cancels
            kp.set_lane_pack(False)
            t_off = measure()
            kp.set_lane_pack(True)
            t_on = measure()
            pairs.append((t_off, t_on))
            wins += t_on < t_off
    finally:
        kp.set_lane_pack(None)
    pack_default = wins >= 3
    kp.record_lane_pack_default(pack_default, {
        "wins": wins, "rounds": len(pairs),
        "pairs_us": [[round(a * 1e6, 1), round(b_ * 1e6, 1)]
                     for a, b_ in pairs]})
    # the guard records rather than fails — but a 5/5 inversion against
    # the shipped default deserves a loud signal
    assert not (wins == 0), \
        f"lane-pack lost every interleaved round: {pairs}"
