"""Deprecated standalone TSC painter/readout (mirror of
pmesh/tsc.py); delegates to the vectorized quadratic window."""
import warnings

import numpy as np
import jax.numpy as jnp

from ..ops import paint as _paint_ops
from .cic import _mode_args

warnings.warn("legacy.tsc is deprecated; use pmesh_tpu.window.TSC",
              DeprecationWarning)

__all__ = ["paint", "readout"]


def paint(pos, mesh, weights=1.0, mode="raise", period=None,
          transform=None):
    mesh = jnp.asarray(mesh)
    pos = np.asarray(pos)
    if transform is not None:
        pos = np.asarray(transform(pos))
    p = _mode_args(mode, period, mesh.shape)
    return _paint_ops.paint(mesh, pos, mass=weights,
                            window='quadratic', period=p)


def readout(mesh, pos, mode="raise", period=None, transform=None,
            out=None):
    mesh = jnp.asarray(mesh)
    pos = np.asarray(pos)
    if transform is not None:
        pos = np.asarray(transform(pos))
    p = _mode_args(mode, period, mesh.shape)
    return _paint_ops.readout(mesh, pos, window='quadratic', period=p)
