"""Deprecated stateful ParticleMesh (the v0 API).

Mirror of pmesh/particlemesh.py:19-375: a state machine with internal
``real``/``complex`` buffers and the canonical sequence

    pm.clear(); pm.paint(pos); pm.r2c();
    pm.transfer([...]); pm.c2r([...]); pm.readout(pos)

implemented as a thin stateful wrapper over the functional pm API.
The push/pop complex stack and built-in phase timers are preserved.
"""
import warnings

import numpy as np
import jax.numpy as jnp

from ..pm import ParticleMesh as _ModernPM, RealField
from ..utils.timers import Timers

warnings.warn("legacy.particlemesh.ParticleMesh is deprecated; "
              "switch to pmesh_tpu.pm.ParticleMesh",
              DeprecationWarning)

__all__ = ["ParticleMesh"]


class ParticleMesh(object):

    def __init__(self, BoxSize, Nmesh, paintbrush='cic', comm=None,
                 np=None, verbose=False, dtype='f8'):
        self.Nmesh = Nmesh
        self.BoxSize_scalar = BoxSize
        self._pm = _ModernPM(BoxSize=BoxSize, Nmesh=[Nmesh] * 3,
                             dtype=dtype, resampler=paintbrush,
                             comm=comm)
        self.comm = self._pm.comm
        self.BoxSize = self._pm.BoxSize
        self.verbose = verbose
        self.T = Timers()
        self.real = jnp.zeros((Nmesh,) * 3, dtype=self._pm._rtype)
        self.complex = None
        self._stack = []
        # coordinate lists (particlemesh.py docstring: w/k/x/r)
        self.k = self._pm.create_coords('complex')
        self.w = [ki * (L / n) for ki, L, n in
                  zip(self.k, self.BoxSize, self._pm.Nmesh)]
        self.x = self._pm.create_coords('real')
        self.r = [xi * (n / L) for xi, L, n in
                  zip(self.x, self.BoxSize, self._pm.Nmesh)]

    def transform(self, x):
        """Simulation units -> local grid units (particlemesh.py:165)."""
        return (self._pm.affine.scale * np.asarray(x)
                + self._pm.affine.translate)

    def transform0(self, x):
        """Simulation units -> global grid units."""
        return self._pm.affine.scale * np.asarray(x)

    def decompose(self, pos):
        return self._pm.decompose(pos)

    def clear(self):
        with self.T['Clear']:
            self.real = jnp.zeros_like(self.real)

    def paint(self, pos, mass=1.0):
        with self.T['Paint']:
            out = self._pm.create(type=RealField, value=self.real)
            out = self._pm.paint(pos, mass=mass, hold=True, out=out)
            self.real = out.value

    def r2c(self, pos=None, mass=1.0):
        """Forward transform of the painted canvas; with pos given,
        clear+paint+transform in one call (particlemesh.py:267)."""
        if pos is not None:
            self.clear()
            self.paint(pos, mass)
        with self.T['R2C']:
            field = self._pm.create(type=RealField, value=self.real)
            self.complex = field.r2c().value

    def push(self):
        """Save the current complex field on a stack
        (particlemesh.py:297)."""
        self._stack.append(self.complex)

    def pop(self):
        self.complex = self._stack.pop()

    def transfer(self, transfer_functions):
        """Apply a chain of legacy TransferFunction callables
        (particlemesh.py:316): each is f(pm, complex) -> complex."""
        with self.T['Transfer']:
            c = self.complex
            for tfunc in transfer_functions:
                c = tfunc(self, c)
            self.complex = c

    def c2r(self, transfer_functions=[]):
        """Apply transfers to a copy of complex, then inverse
        transform into real (particlemesh.py:355).  complex is
        preserved."""
        c = self.complex
        for tfunc in transfer_functions:
            c = tfunc(self, c)
        with self.T['C2R']:
            field = self._pm.create(type='complex', value=c)
            self.real = field.c2r().value

    def readout(self, pos):
        with self.T['Readout']:
            field = self._pm.create(type=RealField, value=self.real)
            return field.readout(pos)
