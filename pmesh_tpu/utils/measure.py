"""Measurement utilities: snapshot power spectra and strain tensors.

Rebuild of utils/powerspectrum.py (snapshot P(k) script) and
utils/strain.py (strain tensor via double-SuperLanzcos transfer
readouts, strain.py:36-57) on the new API.
"""
import numpy as np
import jax.numpy as jnp

from ..pm import ParticleMesh
from ..ops.power import fftpower
from ..ops import transfer as tf
from ..ops import paint as _paint_ops

__all__ = ["snapshot_power", "strain_tensor"]


def snapshot_power(pos, BoxSize, Nmesh, resampler='tsc',
                   compensate=True, Nbins=None):
    """P(k) of a particle snapshot: paint, CIC/TSC-decompensate,
    bin; shot noise subtracted (utils/powerspectrum.py)."""
    pm = ParticleMesh(BoxSize=BoxSize, Nmesh=[Nmesh] * pos.shape[-1],
                      resampler=resampler)
    layout = pm.decompose(pos)
    rho = pm.paint(pos, layout=layout)
    if compensate:
        comp = rho.r2c().apply(pm.resampler.get_compensation(),
                               kind='circular')
        rho = comp.c2r()
    N = pos.shape[0]
    return fftpower(rho, Nbins=Nbins,
                    remove_shotnoise=float(np.prod(pm.BoxSize)) / N)


def strain_tensor(pos, BoxSize, Nmesh, smoothing=None, order=1):
    """The symmetric strain (tidal) tensor at particle positions:
    d^2 phi / dx_a dx_b of the density potential, via double
    differentiation transfers (reference utils/strain.py:36-57).

    Returns (N, 6) in the order (00, 01, 02, 11, 12, 22).
    """
    pm = ParticleMesh(BoxSize=BoxSize, Nmesh=[Nmesh] * 3,
                      resampler='cic')
    layout = pm.decompose(pos)
    rho = pm.paint(pos, layout=layout)
    rhok = rho.r2c()
    if smoothing is not None:
        rhok = rhok.apply(tf.gaussian(smoothing))
    phik = rhok.apply(tf.poisson())

    a = pm.affine
    pairs = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    meshes = []
    for (i, j) in pairs:
        def second(k, v, i=i, j=j):
            return -v * k[i] * k[j]
        meshes.append(phik.apply(second).c2r().value)
    vals = _paint_ops.readout(tuple(meshes), pos,
                              window=pm.resampler.window,
                              scale=a.scale, translate=a.translate,
                              period=a.period)
    return jnp.stack(vals, axis=-1)
