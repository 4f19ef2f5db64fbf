"""Distributed FFT: shard_map slab transforms with all_to_all
transposes over ICI.

This replaces the reference's pfft pencil FFT (external C+MPI library;
consumed at pm.py:1393-1441).  Algorithm for a 3-d r2c on a slab
decomposition over mesh axis 'x' (D devices):

  local real block      (Nx/D, Ny, Nz)
  rfft over (y, z)   -> (Nx/D, Ny, Zh)      local, XLA batched FFT
  all_to_all over 'x'-> (Nx, Ny/D, Zh)      one fused ICI transpose
  fft over x         -> (Nx, Ny/D, Zh)      local

yielding the *transposed* complex layout (first axis full, second
sharded) — the same trick as the reference's PFFT_TRANSPOSED_OUT
(pm.py:1409-1411): the inverse transform undoes the transpose, so a
round trip needs exactly two all_to_alls and never reorders back.

The hermitian-compressed axis (z) stays device-local throughout, so
no padding games with the odd Zh = Nz//2+1 are needed.

2-d meshes use the same scheme minus the z FFT; 1-d transforms are
single-device only (as in the reference, pm.py:1316-1317).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

__all__ = ["r2c", "c2r"]


def _is_c2c(dtype):
    return jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def _r2c_sharded(pmesh, value, c2c, norm):
    ndim = value.ndim
    axis = pmesh.axis

    # In 2-d the axis to be compressed is also the one the transpose
    # must split, and Ny//2+1 is odd; run the transform c2c and slice
    # the half spectrum afterwards (2-d is a test/demo path).
    half_slice = None
    if ndim == 2 and not c2c:
        value = value.astype(jnp.complex128 if value.dtype ==
                             jnp.float64 else jnp.complex64)
        half_slice = value.shape[1] // 2 + 1
        c2c = True

    def local(r):
        # FFT every axis except the sharded first one
        if c2c:
            c = jnp.fft.fftn(r, axes=tuple(range(1, ndim)))
        else:
            c = jnp.fft.rfftn(r, axes=tuple(range(1, ndim)))
        # distributed transpose: scatter axis 1, gather axis 0
        c = jax.lax.all_to_all(c, axis, split_axis=1, concat_axis=0,
                               tiled=True)
        c = jnp.fft.fft(c, axis=0)
        return c * jnp.asarray(norm, dtype=c.real.dtype)

    fn = shard_map(local, mesh=pmesh.mesh,
                   in_specs=pmesh.real_spec(ndim),
                   out_specs=pmesh.transposed_spec(ndim))
    out = fn(value)
    if half_slice is not None:
        out = out[:, :half_slice]
    return out


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _c2r_sharded(pmesh, value, Nmesh, real_dtype, norm):
    ndim = value.ndim
    axis = pmesh.axis
    c2c = _is_c2c(real_dtype)

    take_real = False
    if ndim == 2 and not c2c:
        # reconstruct the full spectrum from hermitian symmetry:
        # full[i, N-j] = conj(value[(-i) % Nx, j])
        Ny = Nmesh[1]
        Yh = value.shape[1]
        rows_rev = jnp.roll(value[::-1], 1, axis=0)
        tail = jnp.conj(rows_rev[:, 1:Ny - Yh + 1][:, ::-1])
        value = jnp.concatenate([value, tail], axis=1)
        out_dtype = real_dtype
        real_dtype = jnp.dtype(
            jnp.complex128 if real_dtype == jnp.float64 else jnp.complex64)
        c2c = True
        take_real = True

    def local(c):
        c = jnp.fft.ifft(c, axis=0)
        # inverse distributed transpose: scatter axis 0, gather axis 1
        c = jax.lax.all_to_all(c, axis, split_axis=0, concat_axis=1,
                               tiled=True)
        if c2c:
            r = jnp.fft.ifftn(c, axes=tuple(range(1, ndim)))
            r = r.astype(real_dtype)
        else:
            r = jnp.fft.irfftn(c, axes=tuple(range(1, ndim)),
                               s=tuple(Nmesh[1:]))
            r = r.astype(real_dtype)
        return r * jnp.asarray(norm, dtype=r.real.dtype)

    fn = shard_map(local, mesh=pmesh.mesh,
                   in_specs=pmesh.transposed_spec(ndim),
                   out_specs=pmesh.real_spec(ndim))
    out = fn(value)
    if take_real:
        out = out.real.astype(out_dtype)
    return out


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def _r2c_uneven(pmesh, value, c2c, norm):
    """Slab r2c for extents that do not divide the device count:
    pad-and-slice around the even kernel (the role of the reference's
    uneven pfft edges, pm.py:1319-1327).

    Each axis is transformed while it is LOCAL-COMPLETE, so zero
    padding never enters a DFT: pad axis 0 (dead real rows transform
    to dead spectral rows along axes 1.., and the axis-0 DFT runs on
    the sliced physical extent after the transpose); pad axis 1 only
    AFTER its DFT (dead frequency rows, sliced off at the end)."""
    ndim = value.ndim
    axis = pmesh.axis
    D = pmesh.size
    N0, N1 = int(value.shape[0]), int(value.shape[1])
    rows = -(-N0 // D)
    n1 = -(-N1 // D)

    half_slice = None
    if ndim == 2 and not c2c:
        value = value.astype(jnp.complex128 if value.dtype ==
                             jnp.float64 else jnp.complex64)
        half_slice = value.shape[1] // 2 + 1
        c2c = True

    if rows * D != N0:
        value = jnp.pad(value, ((0, rows * D - N0),)
                        + ((0, 0),) * (ndim - 1))

    def local(r):
        if c2c:
            c = jnp.fft.fftn(r, axes=tuple(range(1, ndim)))
        else:
            c = jnp.fft.rfftn(r, axes=tuple(range(1, ndim)))
        if n1 * D != N1:
            c = jnp.pad(c, ((0, 0), (0, n1 * D - N1))
                        + ((0, 0),) * (ndim - 2))
        c = jax.lax.all_to_all(c, axis, split_axis=1, concat_axis=0,
                               tiled=True)
        c = jnp.fft.fft(c[:N0], axis=0)
        return c * jnp.asarray(norm, dtype=c.real.dtype)

    fn = shard_map(local, mesh=pmesh.mesh,
                   in_specs=pmesh.real_spec(ndim),
                   out_specs=pmesh.transposed_spec(ndim))
    out = fn(value)
    if n1 * D != N1:
        out = out[:, :N1]
    if half_slice is not None:
        out = out[:, :half_slice]
    return out


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _c2r_uneven(pmesh, value, Nmesh, real_dtype, norm):
    """Inverse of :func:`_r2c_uneven` (same pad-and-slice scheme run
    backwards)."""
    ndim = value.ndim
    axis = pmesh.axis
    D = pmesh.size
    c2c = _is_c2c(real_dtype)
    N0, N1 = int(Nmesh[0]), int(Nmesh[1])
    rows = -(-N0 // D)
    n1 = -(-N1 // D)

    take_real = False
    if ndim == 2 and not c2c:
        Yh = value.shape[1]
        rows_rev = jnp.roll(value[::-1], 1, axis=0)
        tail = jnp.conj(rows_rev[:, 1:N1 - Yh + 1][:, ::-1])
        value = jnp.concatenate([value, tail], axis=1)
        out_dtype = real_dtype
        real_dtype = jnp.dtype(
            jnp.complex128 if real_dtype == jnp.float64
            else jnp.complex64)
        c2c = True
        take_real = True

    if n1 * D != value.shape[1]:
        value = jnp.pad(value, ((0, 0), (0, n1 * D - value.shape[1]))
                        + ((0, 0),) * (ndim - 2))

    def local(c):
        c = jnp.fft.ifft(c, axis=0)
        if rows * D != N0:
            c = jnp.pad(c, ((0, rows * D - N0),)
                        + ((0, 0),) * (ndim - 1))
        c = jax.lax.all_to_all(c, axis, split_axis=0, concat_axis=1,
                               tiled=True)
        c = c[:, :N1]
        if c2c:
            r = jnp.fft.ifftn(c, axes=tuple(range(1, ndim)))
            r = r.astype(real_dtype)
        else:
            r = jnp.fft.irfftn(c, axes=tuple(range(1, ndim)),
                               s=tuple(Nmesh[1:]))
            r = r.astype(real_dtype)
        return r * jnp.asarray(norm, dtype=r.real.dtype)

    fn = shard_map(local, mesh=pmesh.mesh,
                   in_specs=pmesh.transposed_spec(ndim),
                   out_specs=pmesh.real_spec(ndim))
    out = fn(value)
    if rows * D != N0:
        out = out[:N0]
    if take_real:
        out = out.real.astype(out_dtype)
    return out


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def _r2c_pencil(pmesh, value, c2c, norm):
    """Pencil r2c over the 2-d (npx, npy) process grid — the
    shard_map analog of the reference's default pfft decomposition
    (pfft TRANSPOSED_OUT pencils, reference pm.py:1319-1327,
    1409-1411), two all_to_alls per transform:

      real block   (Nx/px, Ny/py, ..., Nz)   z complete
      rfft z...    (Nx/px, Ny/py, ..., Zh)   pad Zh -> Zp = k*py
      a2a 'y' (split z, concat y)
                   (Nx/px, Ny, ..., Zp/py)   y complete; fft y
      a2a 'x' (split y, concat x)
                   (Nx, Ny/px, ..., Zp/py)   x complete; fft x

    yielding transposed pencils P(None, 'x', ..., 'y'): the first
    axis whole, the second split over 'x' and the compressed last
    axis split over 'y'.  Only the last axis is ever padded (by
    < py dead frequency columns), so no zero row enters a DFT and
    the all_to_all payload overhead is (Zp-Zh)/Zh ~ py/Nz.
    """
    ndim = value.ndim
    ax0, ax1 = pmesh.axes
    px, py = pmesh.grid
    last = ndim - 1

    def local(r):
        if c2c:
            c = jnp.fft.fftn(r, axes=tuple(range(2, ndim)))
        else:
            c = jnp.fft.rfftn(r, axes=tuple(range(2, ndim)))
        zh = c.shape[last]
        zp = -(-zh // py) * py
        if zp != zh:
            pad = [(0, 0)] * ndim
            pad[last] = (0, zp - zh)
            c = jnp.pad(c, pad)
        c = jax.lax.all_to_all(c, ax1, split_axis=last, concat_axis=1,
                               tiled=True)
        c = jnp.fft.fft(c, axis=1)
        c = jax.lax.all_to_all(c, ax0, split_axis=1, concat_axis=0,
                               tiled=True)
        c = jnp.fft.fft(c, axis=0)
        return c * jnp.asarray(norm, dtype=c.real.dtype)

    spec_in = P(ax0, ax1, *([None] * (ndim - 2)))
    spec_out = P(None, ax0, *([None] * (ndim - 3)), ax1)
    fn = shard_map(local, mesh=pmesh.mesh, in_specs=spec_in,
                   out_specs=spec_out)
    out = fn(value)
    # slice off the dead padded frequencies (global: the layout of
    # the uneven true extent is XLA's to derive)
    if c2c:
        zh = value.shape[last]
    else:
        zh = value.shape[last] // 2 + 1
    if out.shape[last] != zh:
        out = jax.lax.slice_in_dim(out, 0, zh, axis=last)
    return out


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _c2r_pencil(pmesh, value, Nmesh, real_dtype, norm):
    """Inverse of :func:`_r2c_pencil` (same two all_to_alls run
    backwards; the padded tail is re-created globally so the splits
    stay even, and sliced before the final irfft)."""
    ndim = value.ndim
    ax0, ax1 = pmesh.axes
    px, py = pmesh.grid
    last = ndim - 1
    c2c = _is_c2c(real_dtype)
    zh = int(value.shape[last])
    zp = -(-zh // py) * py
    if zp != zh:
        pad = [(0, 0)] * ndim
        pad[last] = (0, zp - zh)
        value = jnp.pad(value, pad)

    def local(c):
        c = jnp.fft.ifft(c, axis=0)
        c = jax.lax.all_to_all(c, ax0, split_axis=0, concat_axis=1,
                               tiled=True)
        c = jnp.fft.ifft(c, axis=1)
        c = jax.lax.all_to_all(c, ax1, split_axis=1, concat_axis=last,
                               tiled=True)
        if c.shape[last] != zh:
            c = jax.lax.slice_in_dim(c, 0, zh, axis=last)
        if c2c:
            r = jnp.fft.ifftn(c, axes=tuple(range(2, ndim)))
            r = r.astype(real_dtype)
        else:
            r = jnp.fft.irfftn(c, axes=tuple(range(2, ndim)),
                               s=tuple(Nmesh[2:]))
            r = r.astype(real_dtype)
        return r * jnp.asarray(norm, dtype=r.real.dtype)

    spec_in = P(None, ax0, *([None] * (ndim - 3)), ax1)
    spec_out = P(ax0, ax1, *([None] * (ndim - 2)))
    fn = shard_map(local, mesh=pmesh.mesh, in_specs=spec_in,
                   out_specs=spec_out)
    return fn(value)


def pencil_ok(pmesh, Nmesh, ndim):
    """True when the shard_map pencil transforms apply: a 2-d process
    grid, >= 3-d mesh, and even pencil splits (Nx % px, Ny % py for
    the real pencils; Ny % px for the spectral ones)."""
    if not getattr(pmesh, 'is2d', False) or ndim < 3:
        return False
    px, py = pmesh.grid
    return (int(Nmesh[0]) % px == 0 and int(Nmesh[1]) % py == 0
            and int(Nmesh[1]) % px == 0)


def r2c_pencil(pmesh, value, norm):
    return _r2c_pencil(pmesh, value, _is_c2c(value.dtype), float(norm))


def c2r_pencil(pmesh, value, Nmesh, real_dtype, norm):
    return _c2r_pencil(pmesh, value, tuple(int(n) for n in Nmesh),
                       jnp.dtype(real_dtype), float(norm))


def r2c(pmesh, value, norm):
    """Forward transform of a slab-sharded global array; returns the
    transposed-layout complex global array."""
    if value.ndim < 2:
        raise ValueError("distributed 1-d transforms are not supported; "
                         "use a single-device ParticleMesh")
    D = pmesh.size
    if int(value.shape[0]) % D or int(value.shape[1]) % D:
        return _r2c_uneven(pmesh, value, _is_c2c(value.dtype),
                           float(norm))
    return _r2c_sharded(pmesh, value, _is_c2c(value.dtype), float(norm))


def c2r(pmesh, value, Nmesh, real_dtype, norm):
    """Backward transform; inverse of :func:`r2c` (unnormalized when
    norm == prod(Nmesh), matching ops/fft.py conventions)."""
    Nmesh = tuple(int(n) for n in Nmesh)
    if Nmesh[0] % pmesh.size or Nmesh[1] % pmesh.size:
        return _c2r_uneven(pmesh, value, Nmesh, jnp.dtype(real_dtype),
                           float(norm))
    return _c2r_sharded(pmesh, value, Nmesh, jnp.dtype(real_dtype),
                        float(norm))
