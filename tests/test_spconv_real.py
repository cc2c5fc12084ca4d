"""spconv on the REAL MinkUNet/SemanticKITTI rulebooks the reference
bundles (example/data/sample-data/fp32/minkunet-semantickitti/*.pth,
loaded by /root/reference/test/test_spconv.py:106-118).

The reference test runs these fixtures but its correctness assert is
commented out (test_spconv.py:151-158); here the comparison against a
vectorized version of its `cpu_compute` oracle (test_spconv.py:17-53) is
ENABLED. Skipped when the reference tree (and torch) are unavailable.
"""

import glob
import os

import numpy as np
import pytest

FIXTURE_DIR = ("/root/reference/example/data/sample-data/fp32/"
               "minkunet-semantickitti")


def _fixtures():
    return sorted(glob.glob(os.path.join(FIXTURE_DIR, "*.pth")))


def _load(path):
    torch = pytest.importorskip("torch")
    d = torch.load(path, map_location="cpu", weights_only=False)
    return {k: (v.numpy() if hasattr(v, "numpy") else v)
            for k, v in d.items()}


def _oracle(feats, kernel, data):
    """Vectorized cpu_compute (reference test_spconv.py:17-53)."""
    k_vol = kernel.shape[0]
    out_nnz = int(data["out_nnz"])
    kpos = np.asarray(data["kpos"], np.int64)
    knnz = np.asarray(data["knnz"], np.int64)
    imap = np.asarray(data["imap"], np.int64)
    omap = np.asarray(data["omap"], np.int64)
    out = np.zeros((out_nnz, kernel.shape[2]), np.float64)
    for k in range(k_vol):
        s, n = int(kpos[k]), int(knnz[k])
        if n == 0:
            continue
        np.add.at(out, omap[s:s + n],
                  feats[imap[s:s + n]].astype(np.float64)
                  @ kernel[k].astype(np.float64))
    mid = (k_vol - 1) // 2
    if int(data["in_nnz"]) == out_nnz and int(knnz[mid]) == 0:
        # separate_mid fixtures with no explicit center map
        out += feats.astype(np.float64) @ kernel[mid].astype(np.float64)
    return out.astype(np.float32)


@pytest.mark.parametrize("path", _fixtures() or ["<missing>"])
def test_spconv_real_rulebook(path):
    if not os.path.exists(path):
        pytest.skip("reference sample-data fixtures not available")
    import jax
    import jax.numpy as jnp

    from dgsparse_tpu.ops.spconv import plan_from_reference_rulebook, spconv

    data = _load(path)
    plan = plan_from_reference_rulebook(data)
    assert plan.k_vol == int(data["k_vol"])
    assert plan.num_in == int(data["in_nnz"])
    assert plan.num_out == int(data["out_nnz"])
    assert plan.separate_mid == (int(data["in_nnz"]) == int(data["out_nnz"]))
    # per-offset counts and 128-quantized scan match the reference layout
    # (identity center tap strips to the dense separate_mid path)
    mid = (plan.k_vol - 1) // 2
    for k, (got, want) in enumerate(zip(plan.knnz, data["knnz"])):
        if plan.separate_mid and k == mid:
            assert got == 0
        else:
            assert got == int(want)
    assert all(q % 128 == 0 for q in plan.qkpos)

    rng = np.random.default_rng(0)
    c_in, c_out = int(data["c_in"]), int(data["c_out"])
    feats = rng.standard_normal((plan.num_in, c_in)).astype(np.float32)
    kernel = rng.standard_normal(
        (plan.k_vol, c_in, c_out)).astype(np.float32) / np.sqrt(c_in)

    out = np.asarray(jax.device_get(
        spconv(jnp.asarray(feats), jnp.asarray(kernel), plan)))
    ref = _oracle(feats, kernel, data)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-2, atol=1e-4)


def test_spconv_real_gradients():
    """fwd+bwd on the real rulebook: dX / dW vs numerical structure
    (adjoint identity <spconv(x), ct> == <x, spconv^T(ct)>)."""
    paths = _fixtures()
    if not paths:
        pytest.skip("reference sample-data fixtures not available")
    import jax
    import jax.numpy as jnp

    from dgsparse_tpu.ops.spconv import plan_from_reference_rulebook, spconv

    data = _load(paths[0])
    plan = plan_from_reference_rulebook(data)
    rng = np.random.default_rng(1)
    c_in, c_out = int(data["c_in"]), int(data["c_out"])
    feats = jnp.asarray(
        rng.standard_normal((plan.num_in, c_in)).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal(
        (plan.k_vol, c_in, c_out)).astype(np.float32) / np.sqrt(c_in))
    ct = jnp.asarray(rng.standard_normal(
        (plan.num_out, c_out)).astype(np.float32))

    loss = lambda x, w: jnp.vdot(spconv(x, w, plan), ct)  # noqa: E731
    dx, dw = jax.grad(loss, argnums=(0, 1))(feats, kernel)
    # adjoint check: <dx, feats> + <dw, kernel> == 2 * loss for a linear op
    lhs = float(jnp.vdot(dx, feats) + jnp.vdot(dw, kernel))
    rhs = 2.0 * float(loss(feats, kernel))
    assert abs(lhs - rhs) <= 1e-2 * max(1.0, abs(rhs))
