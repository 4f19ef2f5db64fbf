"""Reference/test MXU FFT pipelines (NOT the production path).

Earlier generations of the DFT-as-matmul pipeline, kept because they
back the numerics test suite and document the evolution:

- dense full-spectrum 3-d transforms (fft3_real_forward/_inverse/
  _inverse_grad3): simplest formulation, any N, used by tests as the
  ground-truth MXU implementation;
- the non-split-Nyquist CT half pipeline (fft3_real_forward_half_ct,
  fft3_real_inverse_grad3_half_ct): CT-factored x/y over the
  lane-hostile Zh = N2//2+1 width.

The PRODUCTION pipeline is ops/fft_mxu.py's split-Nyquist ct2
(fft3_real_forward_half_ct2 + fft3_real_inverse_grad3_half_ct2 and
their _sharded variants) plus the dense hermitian-half pair
(fft3_real_forward_half) as the small-N/odd-N2 fallback.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fft_mxu import (
    TUNE, _interpret, _params, _dft_np, _dft, _mm, _resolve_prec,
    _full_spec, _full_spec2, _xplane_spec, _pick_bx, _yzblock_spec,
    _x_transform, _pick_byz, _fold_i_freq, _dft_half_np,
    _irfft_mats_np, _ct_factor, _ct_fwd_mats_np, _ct_inv_mats_np,
    _ct_fwd_apply, _ct_inv_apply)

__all__ = ["fft3_real_forward", "fft3_real_inverse",
           "fft3_real_inverse_grad3", "fft3_real_forward_half_ct",
           "fft3_real_inverse_grad3_half_ct"]


def _zy_forward_real(BX, N1, N2, prec=None):
    """real (BX, N1, N2) block -> complex block after z,y transforms.
    The z matmul runs on the flattened (BX*N1, N2) block; the y
    transform loops the BX planes (static unroll)."""
    def kernel(x_ref, wzr, wzi, wyr, wyi, or_ref, oi_ref):
        p = x_ref[...].reshape(BX * N1, N2)
        # z axis: p @ Wz (p real: 2 matmuls)
        zr = _mm(p, wzr[...], prec).reshape(BX, N1, N2)
        zi = _mm(p, wzi[...], prec).reshape(BX, N1, N2)
        # y axis: Wy @ z, per plane
        for b in range(BX):
            or_ref[b] = (_mm(wyr[...], zr[b], prec)
                         - _mm(wyi[...], zi[b], prec))
            oi_ref[b] = (_mm(wyr[...], zi[b], prec)
                         + _mm(wyi[...], zr[b], prec))
    return kernel

def _zy_inverse_to_real(BX, N1, N2, scale, prec=None):
    """complex block -> real block via inverse z,y transforms."""
    def kernel(xr_ref, xi_ref, wzr, wzi, wyr, wyi, o_ref):
        pr = xr_ref[...].reshape(BX * N1, N2)
        pi = xi_ref[...].reshape(BX * N1, N2)
        zr = (_mm(pr, wzr[...], prec)
              - _mm(pi, wzi[...], prec)).reshape(BX, N1, N2)
        zi = (_mm(pr, wzi[...], prec)
              + _mm(pi, wzr[...], prec)).reshape(BX, N1, N2)
        # final y transform: only the real part of the output matters
        for b in range(BX):
            o_ref[b] = (_mm(wyr[...], zr[b], prec)
                        - _mm(wyi[...], zi[b], prec)) * scale
    return kernel

@functools.partial(jax.jit, static_argnames=('norm', 'precision'))
def fft3_real_forward(x, norm=True, precision=None):
    """full-spectrum forward 3-d FFT of a real array.

    Returns (real, imag) f32 arrays of the same shape; scaled by
    1/prod(N) when norm=True (the engine's r2c convention).
    """
    N0, N1, N2 = x.shape
    wzr, wzi = _dft(N2, -1)
    wyr, wyi = _dft(N1, -1)
    wxr, wxi = _dft(N0, -1)

    BX = _pick_bx(N0, N1, N2)
    prec = _resolve_prec(precision)
    pr, pi = pl.pallas_call(
        _zy_forward_real(BX, N1, N2, prec),
        grid=(N0 // BX,),
        in_specs=[_xplane_spec(N1, N2, BX),
                  _full_spec((N2, N2)), _full_spec((N2, N2)),
                  _full_spec((N1, N1)), _full_spec((N1, N1))],
        out_specs=(_xplane_spec(N1, N2, BX), _xplane_spec(N1, N2, BX)),
        out_shape=(jax.ShapeDtypeStruct((N0, N1, N2), jnp.float32),
                   jax.ShapeDtypeStruct((N0, N1, N2), jnp.float32)),
        compiler_params=_params(),
        interpret=_interpret(),
    )(x.astype(jnp.float32), wzr, wzi, wyr, wyi)

    BY, BZ = _pick_byz(N0, N1, N2)
    scale = 1.0 / (N0 * N1 * N2) if norm else 1.0
    rr, ii = pl.pallas_call(
        _x_transform(N0, BY, BZ, np.float32(scale), prec),
        grid=(N1 // BY, N2 // BZ),
        in_specs=[_yzblock_spec(N0, BY, BZ), _yzblock_spec(N0, BY, BZ),
                  _full_spec2((N0, N0)), _full_spec2((N0, N0))],
        out_specs=(_yzblock_spec(N0, BY, BZ),
                   _yzblock_spec(N0, BY, BZ)),
        out_shape=(jax.ShapeDtypeStruct((N0, N1, N2), jnp.float32),
                   jax.ShapeDtypeStruct((N0, N1, N2), jnp.float32)),
        compiler_params=_params(),
        interpret=_interpret(),
    )(pr, pi, wxr, wxi)
    return rr, ii

@functools.partial(jax.jit, static_argnames=('grad', 'kvec',
                                              'precision'))
def fft3_real_inverse(r, i, grad=None, kvec=None, precision=None):
    """inverse of :func:`fft3_real_forward` up to normalization: the
    UNNORMALIZED conjugate-sum inverse (the engine's c2r convention —
    `c2r(r2c(x)) == x` when the forward used norm=True).  Returns the
    real part.

    grad : None or axis index.  With an axis, the spectrum is
    multiplied by ``i * kvec_d`` before inverting — folded into the
    per-axis DFT matrix, so a spectral derivative costs NOTHING extra
    (the PM force kernel, examples/nbody.py:162-169 with order=0).
    ``kvec`` is a static TUPLE of the wavenumbers for that axis.
    """
    if grad is not None and kvec is None:
        raise ValueError("grad=%r needs kvec (a static tuple of the "
                         "wavenumbers along that axis)" % (grad,))
    N0, N1, N2 = r.shape
    wzr, wzi = _dft_np(N2, +1)
    wyr, wyi = _dft_np(N1, +1)
    wxr, wxi = _dft_np(N0, +1)
    if grad == 0:
        wxr, wxi = _fold_i_freq(wxr, wxi, kvec, 'right')
    elif grad == 1:
        wyr, wyi = _fold_i_freq(wyr, wyi, kvec, 'right')
    elif grad == 2:
        wzr, wzi = _fold_i_freq(wzr, wzi, kvec, 'left')
    wzr, wzi = jnp.asarray(wzr), jnp.asarray(wzi)
    wyr, wyi = jnp.asarray(wyr), jnp.asarray(wyi)
    wxr, wxi = jnp.asarray(wxr), jnp.asarray(wxi)

    prec = _resolve_prec(precision)
    BY, BZ = _pick_byz(N0, N1, N2)
    pr, pi = pl.pallas_call(
        _x_transform(N0, BY, BZ, np.float32(1.0), prec),
        grid=(N1 // BY, N2 // BZ),
        in_specs=[_yzblock_spec(N0, BY, BZ), _yzblock_spec(N0, BY, BZ),
                  _full_spec2((N0, N0)), _full_spec2((N0, N0))],
        out_specs=(_yzblock_spec(N0, BY, BZ),
                   _yzblock_spec(N0, BY, BZ)),
        out_shape=(jax.ShapeDtypeStruct((N0, N1, N2), jnp.float32),
                   jax.ShapeDtypeStruct((N0, N1, N2), jnp.float32)),
        compiler_params=_params(),
        interpret=_interpret(),
    )(r, i, wxr, wxi)

    BX = _pick_bx(N0, N1, N2)
    out = pl.pallas_call(
        _zy_inverse_to_real(BX, N1, N2, np.float32(1.0), prec),
        grid=(N0 // BX,),
        in_specs=[_xplane_spec(N1, N2, BX), _xplane_spec(N1, N2, BX),
                  _full_spec((N2, N2)), _full_spec((N2, N2)),
                  _full_spec((N1, N1)), _full_spec((N1, N1))],
        out_specs=_xplane_spec(N1, N2, BX),
        out_shape=jax.ShapeDtypeStruct((N0, N1, N2), jnp.float32),
        compiler_params=_params(),
        interpret=_interpret(),
    )(pr, pi, wzr, wzi, wyr, wyi)
    return out

@functools.partial(jax.jit, static_argnames=('kvecs', 'precision'))
def fft3_real_inverse_grad3(r, i, kvecs, precision=None):
    """the spectral force triple: (ifft(i kx s), ifft(i ky s),
    ifft(i kz s)) for one spectrum s = (r, i), sharing work.

    The y- and z-gradient components fold their i*k factor into the
    PASS-1 matrices, so they share ONE unmodified x-axis pass —
    5 pallas passes total instead of 6 for three separate inverses.
    ``kvecs`` is a static tuple of 3 wavenumber tuples.
    """
    N0, N1, N2 = r.shape
    wz = _dft_np(N2, +1)
    wy = _dft_np(N1, +1)
    wx = _dft_np(N0, +1)
    wx_g = _fold_i_freq(*wx, kvecs[0], 'right')
    wy_g = _fold_i_freq(*wy, kvecs[1], 'right')
    wz_g = _fold_i_freq(*wz, kvecs[2], 'left')

    prec = _resolve_prec(precision)
    BY, BZ = _pick_byz(N0, N1, N2)
    BX = _pick_bx(N0, N1, N2)

    def xpass(rr, ii, W):
        return pl.pallas_call(
            _x_transform(N0, BY, BZ, np.float32(1.0), prec),
            grid=(N1 // BY, N2 // BZ),
            in_specs=[_yzblock_spec(N0, BY, BZ),
                      _yzblock_spec(N0, BY, BZ),
                      _full_spec2((N0, N0)), _full_spec2((N0, N0))],
            out_specs=(_yzblock_spec(N0, BY, BZ),
                       _yzblock_spec(N0, BY, BZ)),
            out_shape=(jax.ShapeDtypeStruct((N0, N1, N2), jnp.float32),
                       jax.ShapeDtypeStruct((N0, N1, N2), jnp.float32)),
            compiler_params=_params(),
            interpret=_interpret(),
        )(rr, ii, jnp.asarray(W[0]), jnp.asarray(W[1]))

    def zypass(rr, ii, Wz, Wy):
        return pl.pallas_call(
            _zy_inverse_to_real(BX, N1, N2, np.float32(1.0), prec),
            grid=(N0 // BX,),
            in_specs=[_xplane_spec(N1, N2, BX), _xplane_spec(N1, N2, BX),
                      _full_spec((N2, N2)), _full_spec((N2, N2)),
                      _full_spec((N1, N1)), _full_spec((N1, N1))],
            out_specs=_xplane_spec(N1, N2, BX),
            out_shape=jax.ShapeDtypeStruct((N0, N1, N2), jnp.float32),
            compiler_params=_params(),
            interpret=_interpret(),
        )(rr, ii, jnp.asarray(Wz[0]), jnp.asarray(Wz[1]),
          jnp.asarray(Wy[0]), jnp.asarray(Wy[1]))

    # shared plain x-pass for the y and z components
    sr, si = xpass(r, i, wx)
    fy = zypass(sr, si, wz, wy_g)
    fz = zypass(sr, si, wz_g, wy)
    # the x component needs its own folded x-pass
    gr, gi = xpass(r, i, wx_g)
    fx = zypass(gr, gi, wz, wy)
    return fx, fy, fz

def _zy_forward_real_h_ct(BX, N1, N2, Zh, prec=None):
    """pass 1 with the y axis Cooley-Tukey factored: dense half-rfft
    z matmuls, then per-plane CT-y (output y-permuted)."""
    def kernel(x_ref, wzr, wzi, wyr, wyi, or_ref, oi_ref):
        p = x_ref[...].reshape(BX * N1, N2)
        zr = _mm(p, wzr[...], prec).reshape(BX, N1, Zh)
        zi = _mm(p, wzi[...], prec).reshape(BX, N1, Zh)
        for b in range(BX):
            yr, yi = _ct_fwd_apply(zr[b], zi[b], wyr, wyi, N1, prec)
            or_ref[b] = yr
            oi_ref[b] = yi
    return kernel

def _x_transform_ct(N0, BY, BZ, scale, prec=None, inverse=False):
    """x-axis CT transform of (N0, BY, BZ) blocks: forward consumes
    natural order and emits x-permuted; inverse the opposite.

    The flat form reshapes the block to (N0, BY*BZ) — one tall matmul
    per CT chunk, but the reshape is a physical VMEM relayout
    (sublanes -> lanes).  The non-flat form loops the BY rows with
    per-row (M, BZ) matmuls — no relayout.  TUNE['xct_flat'] forces
    either; the default keeps the flat form only for lane-aligned BZ."""
    flat = TUNE.get('xct_flat')
    if flat is None:
        flat = (BZ % 128 == 0)

    def one(br, bi, wxr, wxi):
        if inverse:
            rr, ii = _ct_inv_apply(br, bi, wxr, wxi, N0, prec)
        else:
            rr, ii = _ct_fwd_apply(br, bi, wxr, wxi, N0, prec)
        return rr * scale, ii * scale

    def kernel(xr_ref, xi_ref, wxr, wxi, or_ref, oi_ref):
        if flat:
            br = xr_ref[...].reshape(N0, BY * BZ)
            bi = xi_ref[...].reshape(N0, BY * BZ)
            rr, ii = one(br, bi, wxr, wxi)
            or_ref[...] = rr.reshape(N0, BY, BZ)
            oi_ref[...] = ii.reshape(N0, BY, BZ)
            return
        for b in range(BY):
            rr, ii = one(xr_ref[:, b, :], xi_ref[:, b, :], wxr, wxi)
            or_ref[:, b, :] = rr
            oi_ref[:, b, :] = ii
    return kernel

def _zy_inverse_to_real_h_ct(BX, N1, n2, Zh, prec=None):
    """inverse pass: CT-y inverse (input y-permuted) then dense
    irfft-as-matmul along z."""
    def kernel(xr_ref, xi_ref, wyr, wyi, A, B, o_ref):
        for b in range(BX):
            yr, yi = _ct_inv_apply(xr_ref[b], xi_ref[b], wyr, wyi,
                                   N1, prec)
            o_ref[b] = _mm(yr, A[...], prec) + _mm(yi, B[...], prec)
    return kernel

@functools.partial(jax.jit, static_argnames=('norm', 'precision'))
def fft3_real_forward_half_ct(x, norm=True, precision=None):
    """hermitian-half forward FFT with CT-factored x and y axes.

    Returns (r, i) of shape (N0, N1, Zh) with the x and y axes in the
    CHUNK-PERMUTED order (see _ct_permute): slot j*M+q holds mode
    j+R*q.  Pair with fft3_real_inverse_grad3_half_ct and permute any
    per-axis spectral tables with _ct_permute.
    """
    N0, N1, N2 = x.shape
    Zh = N2 // 2 + 1
    Rx, Mx = _ct_factor(N0)
    Ry, My = _ct_factor(N1)
    if Rx == 1 or Ry == 1:
        raise ValueError("CT needs Nmesh[0] and Nmesh[1] to factor "
                         "as R*128k (got %d, %d); use the dense "
                         "fft3_real_forward_half" % (N0, N1))
    wzr, wzi = (jnp.asarray(a) for a in _dft_half_np(N2, Zh))
    wy = _ct_fwd_mats_np(N1)
    wx = _ct_fwd_mats_np(N0)
    prec = _resolve_prec(precision)

    BX = _pick_bx(N0, N1, Zh)
    pr, pi = pl.pallas_call(
        _zy_forward_real_h_ct(BX, N1, N2, Zh, prec),
        grid=(N0 // BX,),
        in_specs=[_xplane_spec(N1, N2, BX),
                  _full_spec((N2, Zh)), _full_spec((N2, Zh)),
                  _full_spec((Ry, My, My)), _full_spec((Ry, My, My))],
        out_specs=(_xplane_spec(N1, Zh, BX), _xplane_spec(N1, Zh, BX)),
        out_shape=(jax.ShapeDtypeStruct((N0, N1, Zh), jnp.float32),
                   jax.ShapeDtypeStruct((N0, N1, Zh), jnp.float32)),
        compiler_params=_params(),
        interpret=_interpret(),
    )(x.astype(jnp.float32), wzr, wzi,
      jnp.asarray(wy[0]), jnp.asarray(wy[1]))

    scale = 1.0 / (N0 * N1 * N2) if norm else 1.0
    BY = 8 if N1 % 8 == 0 else N1
    rr, ii = pl.pallas_call(
        _x_transform_ct(N0, BY, Zh, np.float32(scale), prec),
        grid=(N1 // BY,),
        in_specs=[
            pl.BlockSpec((N0, BY, Zh), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N0, BY, Zh), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            _full_spec((Rx, Mx, Mx)), _full_spec((Rx, Mx, Mx))],
        out_specs=(
            pl.BlockSpec((N0, BY, Zh), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N0, BY, Zh), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((N0, N1, Zh), jnp.float32),
                   jax.ShapeDtypeStruct((N0, N1, Zh), jnp.float32)),
        compiler_params=_params(),
        interpret=_interpret(),
    )(pr, pi, jnp.asarray(wx[0]), jnp.asarray(wx[1]))
    return rr, ii

@functools.partial(jax.jit, static_argnames=('n2', 'kvecs',
                                             'precision'))
def fft3_real_inverse_grad3_half_ct(r, i, n2, kvecs, precision=None):
    """CT spectral force triple: inverse of
    :func:`fft3_real_forward_half_ct` with i*k_d folded into the
    per-chunk inverse matrices.  ``kvecs`` are NATURAL-order (the
    permutation is applied here); same Nyquist-zero requirement as
    the dense variant."""
    N0, N1, Zh = r.shape
    for d, n in ((0, N0), (1, N1)):
        if n % 2 == 0 and abs(kvecs[d][n // 2]) > 1e-12:
            raise ValueError(
                "kvecs[%d] must vanish at the Nyquist index for the "
                "half-spectrum gradient" % d)
    prec = _resolve_prec(precision)
    Rx, Mx = _ct_factor(N0)
    Ry, My = _ct_factor(N1)
    wy = _ct_inv_mats_np(N1)
    wx = _ct_inv_mats_np(N0)
    wx_g = _ct_inv_mats_np(N0, fold_kvec=kvecs[0])
    wy_g = _ct_inv_mats_np(N1, fold_kvec=kvecs[1])
    A_p, B_p = _irfft_mats_np(n2, Zh)
    A_g, B_g = _irfft_mats_np(n2, Zh, grad_kvec=kvecs[2])

    BY = 8 if N1 % 8 == 0 else N1
    BX = _pick_bx(N0, N1, Zh)

    def yspec():
        return pl.BlockSpec((N0, BY, Zh), lambda t: (0, t, 0),
                            memory_space=pltpu.VMEM)

    def xpass(rr, ii, W):
        return pl.pallas_call(
            _x_transform_ct(N0, BY, Zh, np.float32(1.0), prec,
                            inverse=True),
            grid=(N1 // BY,),
            in_specs=[yspec(), yspec(),
                      _full_spec((Rx, Mx, Mx)),
                      _full_spec((Rx, Mx, Mx))],
            out_specs=(yspec(), yspec()),
            out_shape=(jax.ShapeDtypeStruct((N0, N1, Zh), jnp.float32),
                       jax.ShapeDtypeStruct((N0, N1, Zh), jnp.float32)),
            compiler_params=_params(),
            interpret=_interpret(),
        )(rr, ii, jnp.asarray(W[0]), jnp.asarray(W[1]))

    def zypass(rr, ii, Wy, AB):
        return pl.pallas_call(
            _zy_inverse_to_real_h_ct(BX, N1, n2, Zh, prec),
            grid=(N0 // BX,),
            in_specs=[_xplane_spec(N1, Zh, BX),
                      _xplane_spec(N1, Zh, BX),
                      _full_spec((Ry, My, My)),
                      _full_spec((Ry, My, My)),
                      _full_spec((Zh, n2)), _full_spec((Zh, n2))],
            out_specs=_xplane_spec(N1, n2, BX),
            out_shape=jax.ShapeDtypeStruct((N0, N1, n2), jnp.float32),
            compiler_params=_params(),
            interpret=_interpret(),
        )(rr, ii, jnp.asarray(Wy[0]), jnp.asarray(Wy[1]),
          jnp.asarray(AB[0]), jnp.asarray(AB[1]))

    # shared plain x-pass for the y and z gradient components
    sr, si = xpass(r, i, wx)
    fy = zypass(sr, si, wy_g, (A_p, B_p))
    fz = zypass(sr, si, wy, (A_g, B_g))
    gr, gi = xpass(r, i, wx_g)
    fx = zypass(gr, gi, wy, (A_p, B_p))
    return fx, fy, fz

