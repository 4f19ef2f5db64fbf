"""2LPT grid initial conditions (the GridIC app).

Rebuild of nbody/genic.py: Zel'dovich displacements via a
Poisson + SuperLanzcos-differentiation transfer chain read out at the
(optionally shifted) particle grid (genic.py:122-131), plus the 2LPT
source built from diagonal/off-diagonal strain products
(genic.py:136-158), with the 3/7 scaling of the second-order term.

The modern path is models.fastpm.Solver.lpt (plain ik/k^2 kernels);
GridIC reproduces the legacy finite-difference kernel variant and the
(P, stats) output of the reference.
"""
import numpy as np
import jax.numpy as jnp

from ..pm import ParticleMesh, RealField
from ..ops import transfer as tf
from ..ops import paint as _paint_ops

__all__ = ["GridIC"]


def GridIC(PowerSpectrum, BoxSize, Ngrid, D1, seed=None, shift=0.5,
           order=1, dlinear=None, compat='gadget'):
    """Generate 2LPT grid ICs.

    Parameters
    ----------
    PowerSpectrum : callable P(k) (z=0, (Mpc/h)^3)
    D1 : float
        linear growth to the starting time.
    order : int
        SuperLanzcos differentiation order (reference genic.py order).
    dlinear : ComplexField or None
        linear overdensity to use; if None, generated from whitenoise
        with `seed`.

    Returns
    -------
    P : dict with Position, ZA, 2LPT, ID
    stats : dict
    """
    pm = ParticleMesh(BoxSize=BoxSize, Nmesh=[Ngrid] * 3)
    Q, ID = pm.generate_uniform_particle_grid(shift=shift,
                                              return_id=True)

    if dlinear is None:
        gauss = pm.generate_whitenoise(seed, type='complex',
                                       compat=compat)

        def amplitude(k, v):
            kmag = k.normp(2) ** 0.5
            wt = (PowerSpectrum(kmag) / k.BoxSize.prod()) ** 0.5 * D1
            wt = jnp.where(kmag == 0, 0.0, wt)
            # cut at the nyquist (genic.py:109-110)
            knyq = np.pi * Ngrid / BoxSize
            wt = jnp.where(kmag >= knyq, 0.0, wt)
            return v * wt
        dlinear = gauss.apply(amplitude)

    layout = pm.decompose(Q)
    a = pm.affine

    def read(comp):
        return _paint_ops.readout(comp.c2r().value, Q,
                                  window=pm.resampler.window,
                                  scale=a.scale, translate=a.translate,
                                  period=a.period)

    # potential = delta / k^2
    phik = dlinear.apply(tf.poisson())

    # ZA displacement: -grad phi (genic.py:122-131)
    ZA = jnp.stack([read(phik.apply(tf.gradient(d, order=order)))
                    for d in range(3)], axis=-1)
    ZA = -ZA

    # 2LPT source from strain products (genic.py:136-158)
    def strain(a_, b_):
        def filt(k, v):
            return -v * k[a_] * k[b_] / k.normp(2, zeromode=1.0)
        return dlinear.apply(filt).c2r().value

    s00, s11, s22 = strain(0, 0), strain(1, 1), strain(2, 2)
    field = (s00 * s11 + s11 * s22 + s22 * s00
             - strain(0, 1) ** 2
             - strain(0, 2) ** 2
             - strain(1, 2) ** 2)
    srck = pm.create(type=RealField, value=field).r2c()

    LPT2 = jnp.stack([
        read(srck.apply(tf.poisson()).apply(tf.gradient(d, order=0)))
        for d in range(3)], axis=-1)
    LPT2 = -LPT2 * (3.0 / 7)

    P = {
        'Position': jnp.remainder(Q + ZA * 0, BoxSize),  # unperturbed grid
        'Q': Q,
        'ZA': ZA,
        '2LPT': LPT2,
        'ID': ID,
        # linear overdensity at the particles (the reference snapshot's
        # ICDensity block, gravpm.py:23-31)
        'ICDensity': read(dlinear),
    }
    stats = dict(
        BoxSize=BoxSize,
        Ngrid=Ngrid,
        stdZA=float(jnp.sqrt(jnp.mean(jnp.sum(ZA ** 2, axis=-1))))
        / BoxSize * Ngrid,
        std2LPT=float(jnp.sqrt(jnp.mean(jnp.sum(LPT2 ** 2, axis=-1))))
        / BoxSize * Ngrid,
    )
    return P, stats
