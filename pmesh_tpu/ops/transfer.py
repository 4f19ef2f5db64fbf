"""The transfer-function library.

Functional re-exposition of the reference's pmesh/transfer.py
catalog (Laplace 185, Poisson 207, Gaussian 96, SuperLanzcos 74,
Trilinear CIC-decompensation 68, NormalizeDC 37, RemoveDC 57,
Constant 113) plus the k-space force/potential/displacement kernels
used by the FastPM example (examples/nbody.py:154-181).

Every entry returns ``filter(k, v)`` closures usable with
``ComplexField.apply(filter)`` — evaluated as one fused whole-array
XLA op instead of the reference's slab loop.
"""
import numpy as np
import jax.numpy as jnp

__all__ = ["laplace", "poisson", "gaussian", "constant", "remove_dc",
           "normalize_dc", "super_lanzcos_diff", "cic_decompensate",
           "gradient", "force_transfer", "pot_transfer", "dx1_transfer",
           "lowpass", "longrange"]


def laplace():
    """v / k^2 with the zero mode suppressed (transfer.py:185-205)."""
    def filter(k, v):
        k2 = k.normp(2, zeromode=1.0)
        mask = k.normp(2) > 0
        return v / k2 * mask
    return filter


def poisson():
    """-v / k^2: the gravitational potential of a density contrast
    (transfer.py:207-227)."""
    def filter(k, v):
        k2 = k.normp(2, zeromode=1.0)
        mask = k.normp(2) > 0
        return -v / k2 * mask
    return filter


pot_transfer = poisson


def gaussian(smoothing):
    """exp(-0.5 k^2 s^2) (transfer.py:96-111)."""
    def filter(k, v):
        k2 = k.normp(2)
        return v * jnp.exp(-0.5 * k2 * smoothing ** 2)
    return filter


lowpass = gaussian


def longrange(r_split):
    """The long-range force split exp(-k^2 r_split^2) used by
    TreePM-style solvers; identity when r_split == 0."""
    if r_split == 0:
        return lambda k, v: v
    def filter(k, v):
        return v * jnp.exp(-k.normp(2) * r_split ** 2)
    return filter


def constant(C):
    """v * C (transfer.py:113-130)."""
    def filter(k, v):
        return v * C
    return filter


def remove_dc():
    """Zero the k == 0 mode (transfer.py:57-66)."""
    def filter(k, v):
        mask = k.normp(2) > 0
        return v * mask
    return filter


def normalize_dc():
    """Divide by the DC mode so the field becomes 1 + delta
    (transfer.py:37-55). Note: requires the DC mode be nonzero."""
    def filter(k, v):
        dc = v.reshape(-1)[0]  # k==0 is always the first entry
        return v / dc.real
    return filter


def super_lanzcos_diff(dir, order=1):
    """Super-Lanczos smooth differentiation kernel along `dir`
    (transfer.py:74-94; the order-1 form 1/6 (8 sin w - sin 2w)).

    Use with kind='circular' (w in [-pi, pi)); returns i * D(w) * v
    with the conversion to wavenumber left to the caller, or use
    :func:`gradient` for the full gradient kernel in k units.
    """
    def filter(w, v):
        wd = w[dir]
        if order == 0:
            kd = wd
        else:
            kd = 1.0 / 6.0 * (8 * jnp.sin(wd) - jnp.sin(2 * wd))
        return v * 1j * kd
    return filter


def gradient(dir, order=1):
    """i k_dir v, optionally with the super-lanzcos finite-difference
    form (order=1, the FastPM force kernel, examples/nbody.py:162-169).
    Use with kind='wavenumber'."""
    def filter(k, v):
        if order == 0:
            kd = k[dir]
        else:
            cellsize = _cellsize_from(k, dir)
            w = k[dir] * cellsize
            kd = 1.0 / (6.0 * cellsize) * (8 * jnp.sin(w)
                                           - jnp.sin(2 * w))
        return v * 1j * kd
    return filter


def _cellsize_from(k, dir):
    # k carries BoxSize/Nmesh via the attached attributes
    return float(k.BoxSize[dir] / k.Nmesh[dir])


def force_transfer(dir, order=1):
    """The full PM force kernel: i k_d / k^2 with optional
    super-lanzcos differentiation (examples/nbody.py:162-169)."""
    def filter(k, v):
        k2 = k.normp(2, zeromode=1.0)
        if order == 0:
            kd = k[dir]
        else:
            cellsize = _cellsize_from(k, dir)
            w = k[dir] * cellsize
            kd = 1.0 / (6.0 * cellsize) * (8 * jnp.sin(w)
                                           - jnp.sin(2 * w))
        return 1j * kd / k2 * v
    return filter


def dx1_transfer(dir):
    """Zel'dovich displacement kernel i k_d / k^2
    (examples/nbody.py:154-160)."""
    def filter(k, v):
        k2 = k.normp(2, zeromode=1.0)
        return 1j * k[dir] / k2 * v
    return filter


def cic_decompensate(order=2):
    """Divide out the CIC window: the Trilinear deconvolution of
    transfer.py:68-72.  Use kind='circular'."""
    def filter(w, v):
        tf = 1.0
        for wd in w:
            s = jnp.sinc(wd / (2 * np.pi))
            tf = tf * s ** order
        return v / tf
    return filter
