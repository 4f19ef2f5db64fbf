"""Scale-invariant inside-out mode indexing.

API mirror of pmesh.invariant (reference invariant.py:4-41): maps
integer mode vectors to an inside-out (Linf-shell ordered)
scale-invariant linear index, with hermitian-compressed last axis
support and Nyquist folded positive.  Computation is done by the
native C++ runtime (pmesh_tpu/native/src/invariant.cc), OpenMP
parallel over query points (the reference uses a per-point C call
from a cython loop, _invariant.pyx:36-50).
"""
import numpy as np

from .native import runtime

__all__ = ["get_index"]


def get_index(x, Nmesh, compressed=True, maxlength=None):
    """Return the scale-invariant index of integer mode vectors.

    Parameters
    ----------
    x : array_like (..., d)
        integer mode coordinates in [-Nmesh//2, Nmesh//2).
    Nmesh : array_like
        mesh size, broadcast to (d,).
    compressed : bool
        if True the last axis stores only the non-negative half;
        modes with a negative last component index to -1.
    maxlength : int or None
        indices >= maxlength return -1 (early-exit fast path).

    Returns
    -------
    ind : array_like (...)
        inside-out index; modes closer to zero in Linf distance
        always have smaller indices. -1 if out of range.
    """
    x = np.asarray(x)
    assert np.ndim(x) >= 2
    return runtime.invariant_index(x, Nmesh, compressed=compressed,
                                   maxlength=maxlength)
