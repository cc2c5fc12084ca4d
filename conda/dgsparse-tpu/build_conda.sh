#!/bin/bash
# Variant-matrix driver: builds one conda package per (python, jax,
# tpu-variant) combination. Role analog of the reference's
# conda/dgsparse/build_conda.sh (python × torch × cuda matrix) with the
# accelerator axis re-based: TPU runtimes ship as `libtpu` wheels keyed
# to the jax version, and a `cpu` variant covers dev machines
# (JAX_PLATFORMS=cpu — all Pallas kernels run in interpret mode there).
#
#   ./build_conda.sh 3.11 0.4.35 tpu
#   ./build_conda.sh 3.11 0.4.35 cpu
set -euo pipefail

export PYTHON_VERSION=$1
export JAX_VERSION=$2
export TPU_VARIANT=$3   # "tpu" or "cpu"

export CONDA_JAX_CONSTRAINT="jax==${JAX_VERSION}"
case "$TPU_VARIANT" in
  tpu)
    # libtpu wheels use their own (date-based) versioning, do not track
    # jax's version numbers, and are not on conda-forge — so there is NO
    # conda-level libtpu pin (a "libtpu==${JAX_VERSION}.*" run dep could
    # never resolve). The TPU runtime comes from pip at deploy time:
    #   pip install "jax[tpu]==${JAX_VERSION}" \
    #     -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
    # which resolves the libtpu build matched to that jax release (the
    # same mechanism docker/Dockerfile uses).
    export CONDA_LIBTPU_CONSTRAINT=""
    ;;
  cpu)
    export CONDA_LIBTPU_CONSTRAINT=""
    ;;
  *)
    echo "unknown variant: $TPU_VARIANT (want tpu|cpu)" >&2
    exit 1
    ;;
esac

conda build . -c conda-forge --output-folder "${OUTPUT_FOLDER:-./out}"
