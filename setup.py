"""Build script: packages dgsparse_tpu and compiles the native host library.

TPU analog of the reference's setup.py (torch CUDAExtension matrix,
setup.py:26-124): instead of nvcc-compiled torch extensions, the only native
artifact is the host-side planner/rulebook library, built with g++ and
loaded via ctypes (no Python ABI dependency). The device kernels are
JAX/Pallas and need no compilation at install time.
"""

import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        try:
            subprocess.run(["make", "-C", "native"], check=True)
        except Exception as e:  # toolchain-less installs still work
            print(f"warning: native library build skipped ({e}); "
                  "numpy fallbacks will be used")
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
