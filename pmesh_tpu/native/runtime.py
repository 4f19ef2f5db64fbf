"""ctypes bindings to the native C++ runtime library.

The library (librt) hosts the host-bound native components of the
framework — the parts the reference implements in C/Cython
(SURVEY.md section 2, components #3, #6-#13):

- Gadget/N-GenIC bit-compatible white-noise generation (ranlxd1 +
  seed-table scheme), OpenMP-parallel over columns;
- the scale-invariant inside-out mode index.

Built on demand with g++ (no pip deps); the .so is cached next to the
sources and rebuilt when any source is newer.
"""
import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src")
_LIB = os.path.join(_HERE, "librt.so")

_SOURCES = ["ranlxd.cc", "whitenoise.cc", "invariant.cc"]

_lock = threading.Lock()
_lib = None


def _needs_build():
    if not os.path.exists(_LIB):
        return True
    so_mtime = os.path.getmtime(_LIB)
    for s in _SOURCES + ["ranlxd.h"]:
        if os.path.getmtime(os.path.join(_SRC, s)) > so_mtime:
            return True
    return False


def build():
    """(Re)build librt.so with g++ -O3 -fopenmp."""
    cmd = (["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
            "-std=c++17", "-o", _LIB]
           + [os.path.join(_SRC, s) for s in _SOURCES])
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if _needs_build():
            build()
        lib = ctypes.CDLL(_LIB)
        lib.pmesh_rt_whitenoise_fill.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_uint32, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p]
        lib.pmesh_rt_ranlxd_fill.argtypes = [
            ctypes.c_uint32, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double)]
        lib.pmesh_rt_invariant_index.argtypes = [
            ctypes.c_int, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
        return lib


def _i64(arr):
    a = np.ascontiguousarray(arr, dtype=np.int64)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def whitenoise_fill(Nmesh, shape, start, seed, unitary, dtype='complex128'):
    """Fill a (start, shape) block of the global hermitian mode cube
    with Gadget-compatible white noise; returns a numpy complex array.

    The generator only supports 3-d meshes (as in the reference,
    _whitenoise_imp.c:14-16); lower dimensions fall back to a
    partition-invariant numpy generator in pmesh_tpu.whitenoise.
    """
    lib = _load()
    Nmesh = tuple(int(n) for n in Nmesh)
    shape = tuple(int(n) for n in shape)
    start = tuple(int(n) for n in start)
    assert len(Nmesh) == 3, "gadget whitenoise is 3-d only"
    is_f32 = np.dtype(dtype) == np.dtype('complex64')
    out = np.zeros(shape, dtype=np.dtype(dtype))
    _, Np = _i64(Nmesh)
    Nk, Np = _i64(Nmesh)
    sk, sp = _i64(start)
    zk, zp = _i64(shape)
    lib.pmesh_rt_whitenoise_fill(Np, sp, zp, seed, int(bool(unitary)),
                                 int(is_f32), out.ctypes.data)
    return out


def ranlxd(seed, n):
    """n doubles from a ranlxd1 stream (test hook)."""
    lib = _load()
    out = np.zeros(n, dtype='f8')
    lib.pmesh_rt_ranlxd_fill(seed, n,
                             out.ctypes.data_as(
                                 ctypes.POINTER(ctypes.c_double)))
    return out


def invariant_index(x, Nmesh, compressed=True, maxlength=None):
    """Scale-invariant inside-out index of integer mode vectors.

    Mirrors pmesh.invariant.get_index (reference invariant.py:4-41).
    """
    lib = _load()
    x = np.asarray(x)
    assert x.ndim >= 2
    ndim = x.shape[-1]
    oldshape = x.shape[:-1]
    xf, xp = _i64(x.reshape(-1, ndim))
    Nm = np.broadcast_to(np.asarray(Nmesh), (ndim,))
    Nk, Np = _i64(Nm)
    out = np.zeros(xf.shape[0], dtype=np.int64)
    ml = -1 if maxlength is None else int(maxlength)
    lib.pmesh_rt_invariant_index(
        ndim, xf.shape[0], xp, Np, int(bool(compressed)), ml,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out.reshape(oldshape)
