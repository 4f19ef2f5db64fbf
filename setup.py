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
import importlib.util
import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


def _load_runtime():
    # load native/runtime.py directly — importing the pmesh_tpu
    # package would pull in jax, which is absent in an isolated
    # PEP 517 build environment
    path = Path(__file__).parent / "pmesh_tpu" / "native" / "runtime.py"
    spec = importlib.util.spec_from_file_location("_pmesh_native_rt",
                                                  path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class build_py_with_native(build_py):
    def run(self):
        try:
            _load_runtime().build()
        except subprocess.CalledProcessError as e:
            raise SystemExit(
                "native runtime build failed:\n%s" % e.stderr.decode())
        super().run()


setup(cmdclass={"build_py": build_py_with_native})
