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
    # libtpu is pinned by the jax release; the jax[tpu] extra resolves
    # the exact build. Conda-side we pin the matching libtpu-nightly cut.
    export CONDA_LIBTPU_CONSTRAINT="libtpu==${JAX_VERSION}.*"
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
