"""Build script for pmesh_tpu.

The reference ships four Cython/C extensions compiled at install time
(reference setup.py:18-44).  The TPU rebuild keeps the device compute
path in JAX/XLA/Pallas (no extension needed) and hosts the host-bound
native components (Gadget-compatible white noise, invariant mode
index) in one C++ shared library, ``pmesh_tpu/native/librt.so``.

The library is an ordinary ctypes .so, not a CPython extension, so it
is built here with a tiny custom command instead of ``Extension``
(pybind11-free by design; see pmesh_tpu/native/runtime.py).  It is
also rebuilt on demand at import time whenever the sources are newer,
so an in-place source checkout works with no build step at all.
"""
import subprocess
import sys
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class build_py_with_native(build_py):
    def run(self):
        here = Path(__file__).parent
        sys.path.insert(0, str(here))
        from pmesh_tpu.native import runtime
        try:
            runtime.build()
        except subprocess.CalledProcessError as e:
            raise SystemExit(
                "native runtime build failed:\n%s" % e.stderr.decode())
        super().run()


setup(cmdclass={"build_py": build_py_with_native})
