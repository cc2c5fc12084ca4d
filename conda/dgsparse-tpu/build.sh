#!/bin/bash
# Conda build script: compile the native host library, then install the
# package. Role analog of /root/reference/conda/dgsparse/build.sh (which
# runs `pip install .` with CUDA arch flags); here the only native
# artifact is the device-independent C++ planner/rulebook library.
set -euo pipefail

make -C native -j"$(nproc)"
"$PYTHON" -m pip install . --no-deps --no-build-isolation -vv
