"""Mesh FFTs with the pmesh normalization convention.

Reference convention (pmesh/pm.py:655-694, 987-1019): the forward
transform is scaled by prod(Nmesh)^-1 ("PFFT normalization, same as
FastPM"), the backward transform is unnormalized, so c2r(r2c(x)) == x:

    r2c(x) = fftn(x) / prod(Nmesh)
    c2r(X) = ifftn(X) * prod(Nmesh)      (numpy ifftn includes 1/N)

Real (r2c/c2r) transforms use the hermitian-compressed half spectrum
(rfftn); complex dtypes run full c2c transforms with the same scaling
(reference: pm.py:1339-1352 chooses PFFT_C2C for complex dtypes).

On a single device these are jnp.fft calls compiled straight to the XLA
FFT; distributed meshes route through parallel/pfft.py's shard_map
pencil algorithm instead.

TPU workaround (measured on v5e via the axon backend): the fused
3-axis IRFFT primitive that ``jnp.fft.irfftn`` lowers to — and that
XLA also re-fuses a manual ifft/ifft/irfft chain into — returns
garbage for >=256^3 half-spectrum inputs (relative error ~0.3; the
forward RFFT-3D, all 1- and 2-axis transforms, and full-width C2C
chains are exact).  ``c2r`` therefore splits the inverse into a
2-axis IFFT and a 1-d IRFFT separated by an optimization barrier so
the broken fusion can never form.
"""
import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["r2c", "c2r", "is_c2c"]


def is_c2c(dtype):
    return jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating)


def r2c(value, norm=None):
    """Forward transform, scaled by prod(Nmesh)^-1."""
    shape = value.shape
    if norm is None:
        norm = 1.0 / float(np.prod(shape))
    if is_c2c(value.dtype):
        out = jnp.fft.fftn(value)
    else:
        out = jnp.fft.rfftn(value)
    return out * jnp.asarray(norm, dtype=out.real.dtype)


def c2r(value, Nmesh, real_dtype, norm=None):
    """Backward transform, unnormalized (inverse of r2c)."""
    Nmesh = tuple(int(n) for n in Nmesh)
    if norm is None:
        norm = float(np.prod(Nmesh))
    if is_c2c(real_dtype):
        out = jnp.fft.ifftn(value)
        return (out * norm).astype(real_dtype)
    if value.ndim >= 3:
        # never form the broken IRFFT-3D fusion (see module docstring)
        head = tuple(range(value.ndim - 1))
        out = jnp.fft.ifftn(value, axes=head)
        out = jax.lax.optimization_barrier(out)
        out = jnp.fft.irfft(out, n=Nmesh[-1], axis=-1)
    else:
        out = jnp.fft.irfftn(value, s=Nmesh)
    return (out * norm).astype(real_dtype)
