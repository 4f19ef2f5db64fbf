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
import functools

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


@functools.lru_cache(maxsize=None)
def _dft_mat(n, zh, sign):
    """complex DFT matrix (n, zh or n): W[a, b] = exp(sign*2pi i a b / n)."""
    a = np.arange(n)[:, None]
    b = np.arange(zh if zh else n)[None, :]
    return jnp.asarray(np.exp(sign * 2j * np.pi * a * b / n)
                       .astype('c16'))


def _irfft_ab(n, zh):
    """real (zh, n) A/B matrices: x = Hr @ A + Hi @ B recovers the
    real signal from its half spectrum (hermitian weights folded)."""
    k = np.arange(zh)[:, None]
    x = np.arange(n)[None, :]
    w = np.ones((zh, 1))
    w[1:] = 2.0
    if n % 2 == 0 and zh == n // 2 + 1:
        w[-1] = 1.0
    ang = 2 * np.pi * k * x / n
    return (jnp.asarray((w * np.cos(ang))),
            jnp.asarray((-w * np.sin(ang))))


def r2c_matmul(value, norm=None):
    """r2c as per-axis DFT matmuls (einsum -> dot_general): no fft
    thunks at all, so any GSPMD partitioning/layout is legal — the
    transform of choice for pencil-sharded global arrays (2-d process
    grids), where XLA partitions each contraction over the mesh.
    O(N^4) total flops, but the per-device share at the pod scales a
    2-d grid exists for is small, and contractions run on the MXU."""
    shape = value.shape
    if norm is None:
        norm = 1.0 / float(np.prod(shape))
    ctype = jnp.complex128 if value.real.dtype == jnp.float64 \
        else jnp.complex64
    if is_c2c(value.dtype):
        out = value.astype(ctype)
        axes = range(value.ndim - 1, -1, -1)
    else:
        n = shape[-1]
        Wz = _dft_mat(n, n // 2 + 1, -1).astype(ctype)
        out = jnp.einsum('...z,zc->...c', value.astype(ctype), Wz)
        axes = range(value.ndim - 2, -1, -1)
    for ax in axes:
        W = _dft_mat(shape[ax], None, -1).astype(ctype)
        out = jnp.moveaxis(
            jnp.einsum('...z,za->...a', jnp.moveaxis(out, ax, -1),
                       W), -1, ax)
    return out * jnp.asarray(norm, dtype=out.real.dtype)


def c2r_matmul(value, Nmesh, real_dtype, norm=None):
    """inverse of :func:`r2c_matmul` (unnormalized, like c2r)."""
    Nmesh = tuple(int(n) for n in Nmesh)
    if norm is None:
        norm = float(np.prod(Nmesh))
    ctype = value.dtype
    out = value
    head = value.ndim - (0 if is_c2c(real_dtype) else 1)
    for ax in range(head):
        W = (_dft_mat(Nmesh[ax], None, +1).astype(ctype)
             / Nmesh[ax])
        out = jnp.moveaxis(
            jnp.einsum('...z,za->...a', jnp.moveaxis(out, ax, -1),
                       W), -1, ax)
    if is_c2c(real_dtype):
        return (out * norm).astype(real_dtype)
    n = Nmesh[-1]
    A, B = _irfft_ab(n, value.shape[-1])
    rdt = jnp.float64 if ctype == jnp.complex128 else jnp.float32
    out = (jnp.einsum('...c,cz->...z', out.real, A.astype(rdt))
           + jnp.einsum('...c,cz->...z', out.imag, B.astype(rdt)))
    return (out * norm / n).astype(real_dtype)
