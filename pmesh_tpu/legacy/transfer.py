"""Deprecated slab-wise transfer function library.

Mirror of pmesh/transfer.py (TransferFunction: NormalizeDC 38,
RemoveDC 57, Trilinear 68, SuperLanzcos 74, Gaussian 96, Constant 113,
Inspect 121, PowerSpectrum 132, Laplace 185, Poisson 207).

The chain convention is preserved — each entry is ``f(pm, complex) ->
complex`` consumed by legacy.particlemesh.ParticleMesh.transfer — but
the math runs as fused whole-array jnp ops on the circular frequency
coordinates ``pm.w`` instead of per-slab numpy loops.  Functional:
entries return the new complex array (jax arrays are immutable).
"""
import warnings

import numpy as np
import jax.numpy as jnp

warnings.warn("legacy.transfer.TransferFunction is deprecated; use "
              "pmesh_tpu.ops.transfer with Field.apply",
              DeprecationWarning)

__all__ = ["TransferFunction"]


def _w2(pm):
    return sum(wi ** 2 for wi in pm.w)


class TransferFunction:

    @staticmethod
    def NormalizeDC(pm, complex):
        """Divide by the DC amplitude (the mean)."""
        dc = jnp.abs(complex.reshape(-1)[0])
        return complex / dc

    @staticmethod
    def RemoveDC(pm, complex):
        mask = _w2(pm) > 0
        return complex * mask

    @staticmethod
    def Trilinear(pm, complex):
        """Divide out the CIC (trilinear) window: sinc^2 per axis."""
        tf = 1.0
        for wi in pm.w:
            tf = tf * jnp.sinc(wi / (2 * np.pi)) ** 2
        return complex / tf

    @staticmethod
    def SuperLanzcos(dir, order=3):
        """i * D(w_dir) with the smooth super-lanczos difference
        kernel 1/6 (8 sin w - sin 2w); order=0 gives plain i*w."""
        def SuperLanzcosDir(pm, complex):
            wi = pm.w[dir] * 1.0
            if order == 0:
                return complex * (wi * 1j)
            tmp = 1 / 6.0 * (8 * jnp.sin(wi) - jnp.sin(2 * wi))
            return complex * (tmp * 1j)
        return SuperLanzcosDir

    @staticmethod
    def Gaussian(smoothing):
        """exp(-0.5 w^2 s^2), s in mesh units."""
        sm2 = smoothing ** 2

        def GaussianS(pm, complex):
            return complex * jnp.exp(-0.5 * _w2(pm) * sm2)
        return GaussianS

    @staticmethod
    def Constant(C):
        def Constant_(pm, complex):
            return complex * C
        return Constant_

    @staticmethod
    def Inspect(name, *indices):
        def Inspect_(pm, complex):
            V = ['%s = %s' % (str(i), str(complex[tuple(i)]))
                 for i in indices]
            print(name, ','.join(V))
            return complex
        return Inspect_

    @staticmethod
    def PowerSpectrum(wout, psout):
        """Binned |delta|^2 over |w| (reference transfer.py:132-183);
        run after NormalizeDC/RemoveDC.  Results are written into the
        provided host arrays: psout = P/N, wout = mean w per bin."""
        wedges = np.linspace(0, np.pi, len(psout) + 1)

        def PS(pm, complex):
            wmag = jnp.sqrt(_w2(pm))
            wmag = jnp.broadcast_to(wmag, complex.shape)
            p = (complex.real ** 2 + complex.imag ** 2)
            # hermitian double-count weighting along the last axis
            i_last = pm.k[-1] * 0  # reuse shape
            import jax
            nb = len(psout)
            binid = jnp.digitize(wmag.reshape(-1),
                                 jnp.asarray(wedges)) - 1
            binid = jnp.where((binid < 0) | (binid >= nb), nb, binid)
            psum = jax.ops.segment_sum(p.reshape(-1), binid,
                                       num_segments=nb + 1)
            wsum = jax.ops.segment_sum(wmag.reshape(-1), binid,
                                       num_segments=nb + 1)
            nsum = jax.ops.segment_sum(
                jnp.ones_like(wmag).reshape(-1), binid,
                num_segments=nb + 1)
            n = np.maximum(np.asarray(nsum[:nb]), 1)
            psout[:] = np.asarray(psum[:nb]) / n
            wout[:] = np.asarray(wsum[:nb]) / n
            return complex
        return PS

    @staticmethod
    def Laplace(pm, complex):
        """complex *= -w^2 (with the zero mode killed)."""
        w2 = _w2(pm)
        return complex * jnp.where(w2 == 0, 0.0, -w2)

    @staticmethod
    def Poisson(pm, complex):
        """complex /= -w^2 (with the zero mode killed)."""
        w2 = _w2(pm)
        safe = jnp.where(w2 == 0, 1.0, w2)
        return jnp.where(w2 == 0, 0.0, complex / (-safe))
