"""Power spectrum estimation on the mesh.

The binned P(k) estimator of the reference (transfer.py:132-183
PowerSpectrum transfer; utils/powerspectrum.py; FFTPower usage in
examples/nbody.py:290-308), done the XLA way: one |k|-digitize plus
two segment-sums over the whole spectrum, with hermitian-compression
weights so each independent mode counts once.
"""
import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["fftpower", "measure_power"]


def _hermitian_weights(comp):
    """Per-mode multiplicity of the compressed half spectrum: modes
    whose conjugate is not stored count twice (pm.py:908-918)."""
    i = comp.i
    if not comp.compressed:
        return jnp.ones(comp.value.shape, dtype=comp.value.real.dtype)
    last = i[-1]
    w = jnp.where((last != 0) & (last != comp.Nmesh[-1] // 2), 2.0, 1.0)
    return jnp.broadcast_to(w, comp.value.shape)


def measure_power(comp, kedges=None, Nbins=None, dk=None, kmin=0.0,
                  remove_shotnoise=0.0):
    """Spherically averaged power spectrum of a ComplexField.

    Parameters
    ----------
    comp : BaseComplexField
        the (already density-contrast normalized) fourier field.
    kedges : array or None
        bin edges in k units; default linear bins of width dk (or the
        fundamental mode) up to the Nyquist.
    remove_shotnoise : float
        shot noise power to subtract (BoxSize^ndim / N).

    Returns
    -------
    k, power, nmodes : arrays
        mean k, mean P(k) (BoxSize^ndim volume normalization), and
        independent mode counts per bin.
    """
    BoxSize = comp.BoxSize
    knyq = np.pi * np.min(comp.Nmesh / BoxSize)
    kfun = 2 * np.pi / np.max(BoxSize)
    if kedges is None:
        if dk is None:
            dk = kfun
        if Nbins is None:
            kedges = np.arange(kmin, knyq + dk / 2, dk)
        else:
            kedges = np.linspace(kmin, knyq, Nbins + 1)
    kedges = np.asarray(kedges)

    k = comp.pm._apply_coords(type(comp), 'wavenumber')
    kmag = jnp.sqrt(sum(ki ** 2 for ki in k))
    kmag = jnp.broadcast_to(kmag, comp.value.shape)

    w = _hermitian_weights(comp)
    p = (comp.value.real ** 2 + comp.value.imag ** 2) * w

    nb = len(kedges) - 1
    binid = jnp.digitize(kmag.reshape(-1), jnp.asarray(kedges)) - 1
    binid = jnp.where((binid < 0) | (binid >= nb), nb, binid)

    psum = jax.ops.segment_sum(p.reshape(-1), binid, num_segments=nb + 1)
    ksum = jax.ops.segment_sum((kmag * w).reshape(-1), binid,
                               num_segments=nb + 1)
    nsum = jax.ops.segment_sum(w.reshape(-1), binid, num_segments=nb + 1)

    vol = float(np.prod(BoxSize))
    nmodes = nsum[:nb]
    power = jnp.where(nmodes > 0, psum[:nb] / jnp.maximum(nmodes, 1), 0.0) \
        * vol - remove_shotnoise
    kmean = jnp.where(nmodes > 0, ksum[:nb] / jnp.maximum(nmodes, 1), 0.0)
    return kmean, power, nmodes


def fftpower(real, kedges=None, Nbins=None, dk=None, kmin=0.0,
             normalize=True, remove_shotnoise=0.0):
    """P(k) of a RealField: promote to density contrast, transform,
    bin. The FFTPower-equivalent one-stop call."""
    if normalize:
        mean = real.cmean()
        real = real.pm.create(type=type(real),
                              value=real.value / mean - 1.0)
    comp = real.r2c()
    return measure_power(comp, kedges=kedges, Nbins=Nbins, dk=dk,
                         kmin=kmin, remove_shotnoise=remove_shotnoise)
