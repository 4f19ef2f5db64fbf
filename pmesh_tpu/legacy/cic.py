"""Deprecated standalone CIC painter/readout.

Mirror of pmesh/cic.py:11-137 (chunked numpy CIC paint/readout with
the mode='ignore'/'raise'/'wrap' boundary semantics); delegates to the
vectorized window ops.
"""
import warnings

import numpy as np
import jax.numpy as jnp

from ..ops import paint as _paint_ops

warnings.warn("legacy.cic is deprecated; use pmesh_tpu.window.CIC",
              DeprecationWarning)

__all__ = ["paint", "readout"]


def _mode_args(mode, period, shape):
    if mode == 'wrap':
        return np.broadcast_to(period if period is not None
                               else shape, len(shape))
    if mode in ('ignore', 'raise'):
        return 0
    raise ValueError("mode must be wrap, ignore or raise")


def paint(pos, mesh, weights=1.0, mode="raise", period=None,
          transform=None):
    """CIC paint; returns the updated mesh (functional: the input is
    not modified, unlike the reference's in-place accumulate)."""
    mesh = jnp.asarray(mesh)
    pos = np.asarray(pos)
    if transform is not None:
        pos = np.asarray(transform(pos))
    p = _mode_args(mode, period, mesh.shape)
    return _paint_ops.paint(mesh, pos, mass=weights, window='linear',
                            period=p)


def readout(mesh, pos, mode="raise", period=None, transform=None,
            out=None):
    mesh = jnp.asarray(mesh)
    pos = np.asarray(pos)
    if transform is not None:
        pos = np.asarray(transform(pos))
    p = _mode_args(mode, period, mesh.shape)
    return _paint_ops.readout(mesh, pos, window='linear', period=p)
