#!/bin/bash
# Build the dgsparse-tpu image (role analog of reference docker/build.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
docker build -f docker/Dockerfile \
    --build-arg JAX_VERSION="${JAX_VERSION:-0.4.35}" \
    -t "dgsparse-tpu:${TAG:-latest}" .
