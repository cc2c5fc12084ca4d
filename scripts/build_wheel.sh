#!/usr/bin/env bash
# Wheel build smoke — the TPU analog of the reference's docker wheel
# pipeline (/root/reference/docker/install/build_wheel.sh). Offline-safe:
# no build isolation (uses the environment's setuptools), no index access.
# The native host library is compiled by setup.py's BuildWithNative and,
# when g++ is unavailable, the package falls back to numpy planners.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT="${1:-dist}"
rm -rf "$OUT"
python -m pip wheel --no-build-isolation --no-deps -w "$OUT" .
WHEEL=$(ls "$OUT"/dgsparse_tpu-*.whl)
echo "built: $WHEEL"

# install into a scratch prefix and import-check from OUTSIDE the repo
# (catches files missing from package_data / wrong module layout)
SCRATCH=$(mktemp -d)
python -m pip install --no-deps --target "$SCRATCH" "$WHEEL" -q
(cd /tmp && PYTHONPATH="$SCRATCH" python - << 'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import dgsparse_tpu
import jax.numpy as jnp
import numpy as np
sp = dgsparse_tpu.SparseTensor.from_csr(
    jnp.asarray(np.array([0, 1, 2], np.int32)),
    jnp.asarray(np.array([1, 0], np.int32)),
    jnp.asarray(np.array([2.0, 3.0], np.float32)), sparse_sizes=(2, 2))
out = dgsparse_tpu.spmm(sp, jnp.eye(2, dtype=jnp.float32), "sum")
assert np.allclose(np.asarray(out), [[0, 2], [3, 0]]), out
print("wheel import + spmm smoke OK:", dgsparse_tpu.version())
EOF
)
rm -rf "$SCRATCH"
