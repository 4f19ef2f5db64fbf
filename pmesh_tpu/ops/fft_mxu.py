"""MXU-resident 3-d FFT: DFT-as-matmul Pallas kernels.

XLA's TPU FFT runs ~10x off the HBM-bandwidth roofline at PM sizes
(512^3 rfft: 82 ms measured on v5e).  On TPU the DFT matrix itself is
the fast path: a length-N transform is an (N, N) matmul, and the MXU
does the 512^4-MAC 3-d transform's arithmetic in single-digit
milliseconds.  The fusion here gets the HBM traffic right too:

  pass 1  (grid over x-planes): load the (N1, N2) plane once, apply
          the z-axis DFT (plane @ Wz) AND the y-axis DFT (Wy @ plane)
          back to back in VMEM — two of three axes in ONE HBM pass.
  pass 2  (grid over y-blocks): x-axis DFT as (Wx @ block) with the
          block viewed as (N0, bY*N2) — a single large MXU matmul.

Complex data is carried as separate (real, imag) f32 arrays (TPU
tiling of interleaved complex is poor, and pallas prefers plain f32
planes).  The forward transform from a real field skips the imaginary
input (half the stage-1 matmuls); the inverse-to-real skips the
imaginary output.

Numerics: matmuls run with preferred_element_type=float32 and
3-pass bf16 precision ('float32'): measured max rel. error 6e-8 vs
jnp.fft at 512^3 — f32-exact for PM purposes.

Normalization matches the engine convention (ops/fft.py: r2c scales
by 1/prod(N), c2r is the unnormalized conjugate sum).

Scope: single device, 3-d, power-of-two-free (any N; matmul is dense
anyway).  Used by models.fastpm.force_lattice(fft='mxu'); the
ParticleMesh field API keeps the XLA FFT by default.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fft3_real_forward_half", "fft3_real_inverse_grad3_half",
           "fft3_real_forward_half_ct2",
           "fft3_real_inverse_grad3_half_ct2",
           "fft3_poisson_half_ct2",
           "fft3_real_forward_half_ct2_sharded",
           "fft3_real_inverse_grad3_half_ct2_sharded",
           "fft3_poisson_half_ct2_sharded",
           "fft3_real_forward_half_sharded",
           "fft3_real_inverse_grad3_half_sharded", "kvectors"]

# 'float32' = 3-pass bf16 matmuls, f32-exact results (6e-8 vs
# jnp.fft); 'default' = single-pass bf16, ~1.7x faster at ~1.6e-4
# relative error — set per call via the `precision` argument
_PREC = jax.lax.Precision('float32')

# per-shape tuning overrides, consulted by the block-size heuristics
# below.  Keys (all optional; tools/tune_slab.py sweeps them on the
# real chip):
#   'bx:<n0>x<n1>x<w>'   : BX for a zy pass on that block shape
#   'xct_ref_bytes'      : per-ref ceiling of the x-CT pass pipeline
#   'xct_flat'           : force the flat (reshape) x-kernel on/off
#   'radix:<n>'          : CT radix for axis length n (8/4/2)
TUNE = {}


def _interpret():
    return jax.default_backend() != 'tpu'


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _dft_np(n, sign):
    k = np.arange(n)
    W = np.exp(sign * 2j * np.pi * np.outer(k, k) / n)
    return W.real.astype(np.float32), W.imag.astype(np.float32)


def _dft(n, sign):
    Wr, Wi = _dft_np(n, sign)
    return jnp.asarray(Wr), jnp.asarray(Wi)


def _mm(a, b, prec=None):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=_PREC if prec is None else prec)


def _resolve_prec(precision):
    if precision is None:
        return None
    return jax.lax.Precision(
        {'f32': 'float32', 'bf16': 'default'}.get(precision, precision))


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _full_spec2(shape):
    # full-array spec for a 2-d grid
    return pl.BlockSpec(shape, lambda j, k: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _xplane_spec(n1, n2, bx=1):
    return pl.BlockSpec((bx, n1, n2), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _pick_bx(N0, N1, N2, tag=''):
    # planes per pass-1 program: amortize the DFT-matrix DMA and give
    # the MXU taller matmuls, inside the VMEM budget (5 buffers x2).
    # tag distinguishes call sites sharing a shape (zyf/zyi); sweep
    # results (tools/tune_slab.py, v5e, 1024-slab shapes) are seeded
    # as defaults below.
    t = TUNE.get('bx:%s:%dx%dx%d' % (tag, N0, N1, N2),
                 TUNE.get('bx:%dx%dx%d' % (N0, N1, N2)))
    if t:
        return int(t)
    if tag == 'zyi':
        # measured on v5e (chain-differenced): the inverse pass wants
        # deeper pipelining than the 2-plane heuristic picks — BX=4 at
        # (128, 1024, 512) runs 11.1 ms vs 13.2 at BX=2
        bx = 1
        while (N0 % (bx * 2) == 0
               and bx * 2 * N1 * N2 * 4 * 10 < 160 * 1024 * 1024):
            bx *= 2
        return bx
    if tag == 'zyid':
        # dual variant: twice the out planes per row — halve the
        # block the zyi budget would pick
        bx = 1
        while (N0 % (bx * 2) == 0
               and bx * 2 * N1 * N2 * 4 * 20 < 160 * 1024 * 1024):
            bx *= 2
        return bx
    bx = 1
    while (N0 % (bx * 2) == 0
           and bx * 2 * N1 * N2 * 4 * 10 < 80 * 1024 * 1024):
        bx *= 2
    return bx


def _yzblock_spec(n0, by, bz):
    return pl.BlockSpec((n0, by, bz), lambda j, k: (0, j, k),
                        memory_space=pltpu.VMEM)


# --- pass 1: z- and y-axis DFT per x-plane -----------------------------

# --- pass 2: x-axis DFT over y-blocks ----------------------------------

def _x_transform(N0, BY, BZ, scale, prec=None):
    # flattening (BY, BZ) into one matmul needs a lane-aligned BZ;
    # otherwise run one matmul per y-row of the block
    flat = (BZ % 128 == 0)

    def kernel(xr_ref, xi_ref, wxr, wxi, or_ref, oi_ref):
        if flat:
            br = xr_ref[...].reshape(N0, BY * BZ)
            bi = xi_ref[...].reshape(N0, BY * BZ)
            rr = _mm(wxr[...], br, prec) - _mm(wxi[...], bi, prec)
            ii = _mm(wxr[...], bi, prec) + _mm(wxi[...], br, prec)
            or_ref[...] = (rr * scale).reshape(N0, BY, BZ)
            oi_ref[...] = (ii * scale).reshape(N0, BY, BZ)
            return
        for b in range(BY):
            br = xr_ref[:, b, :]
            bi = xi_ref[:, b, :]
            rr = _mm(wxr[...], br, prec) - _mm(wxi[...], bi, prec)
            ii = _mm(wxr[...], bi, prec) + _mm(wxi[...], br, prec)
            or_ref[:, b, :] = rr * scale
            oi_ref[:, b, :] = ii * scale
    return kernel


def _pick_byz(N0, N1, N2):
    """(BY, BZ) blocks for the x-axis pass.  Mosaic wants the last two
    block dims divisible by (8, 128) (or full); keep the four
    double-buffered refs + matmul temps well inside scoped VMEM."""
    bz = 128 if N2 % 128 == 0 else N2
    by = 8 if N1 % 8 == 0 else N1
    # grow BY while the working set stays small (~24 MB total)
    while (N1 % (by * 2) == 0
           and N0 * by * 2 * bz * 4 * 6 < 48 * 1024 * 1024):
        by *= 2
    return by, bz


def _fold_i_freq(Wr, Wi, freqs, side):
    """fold diag(i * freqs) into a (numpy) DFT matrix (rows:
    side='left', columns: side='right').  Multiplying the spectrum by
    i*k_d before an inverse transform becomes a free matrix
    modification."""
    f = np.asarray(freqs, dtype=np.float32)
    if side == 'left':
        return -Wi * f[:, None], Wr * f[:, None]
    return -Wi * f[None, :], Wr * f[None, :]


# --- hermitian-half variants -------------------------------------------
#
# A real input's z-spectrum is hermitian: keep only Zh = N2//2+1
# columns through EVERY pass (the forward z matmul uses the half DFT
# matrix; the inverse-to-real z stage is the irfft-as-matmul
# reconstruction out = Zr @ (m cos) - Zi @ (m sin), m = 1 at DC and
# Nyquist, 2 elsewhere).  ~2x less z-stage work and ~Zh/N2 less
# traffic/compute in the x and y passes.

def _dft_half_np(n, zh):
    k = np.arange(n)[:, None] * np.arange(zh)[None, :]
    W = np.exp(-2j * np.pi * k / n)
    return W.real.astype(np.float32), W.imag.astype(np.float32)


def _irfft_mats_np(n, zh, grad_kvec=None, nyquist_last=True):
    """(A, B) with out = Zr @ A + Zi @ B reconstructing the real
    inverse along z; grad_kvec folds an extra i*k_z factor.

    nyquist_last=False: the zh columns exclude the Nyquist mode
    (the split-Nyquist pipeline handles it separately), so the last
    stored column is an ordinary doubled mode."""
    m = np.full(zh, 2.0)
    m[0] = 1.0
    if n % 2 == 0 and nyquist_last:
        m[-1] = 1.0
    theta = 2 * np.pi * np.arange(zh)[:, None] * np.arange(n)[None, :] / n
    c = np.cos(theta) * m[:, None]
    s_ = np.sin(theta) * m[:, None]
    if grad_kvec is None:
        A, B = c, -s_
    else:
        kz = np.asarray(grad_kvec, dtype=np.float64)[:, None]
        A, B = -kz * s_, -kz * c
    return A.astype(np.float32), B.astype(np.float32)


# --- z-axis Cooley-Tukey factoring (lane-resident, no transposes) ----
#
# The dense z transform is a (rows, N2) @ (N2, Zm) matmul pair —
# 2*2*Zm FLOPs per mesh element, the single largest MXU term of the
# per-chip force chain (tools/roofline.py: ~33 ms of the 60 ms
# (128, 1024, 1024) pipe at f32-exact precision).  Factoring z the
# way x/y already are cuts those FLOPs ~4.5x (forward) / 2x
# (inverse) while keeping z on the LANE axis throughout:
#
#   forward   u_j = sum_r e^{-2pi i j r/Rz} x[:, rK:(r+1)K]   (VPU)
#             X_j = u_j @ E_j^T                               (MXU)
#   with E_j[q, m] = e^{-2pi i (j + Rz q) m / N2}; u_{Rz-j} =
#   conj(u_j) so only Rz/2+1 butterflies are computed.  The output
#   concatenates the chunks along lanes, so mode k = j + Rz*q lives
#   at STORED slot order given by _zct_perm — the z analog of the
#   x/y _ct_permute contract (consumers fold tables with _zct_table).
#
#   inverse   (on Ri = Rz/2 fused chunk pairs so the contraction
#             stays a full 128 lanes): P_j = Xr_j @ A_j + Xi_j @ B_j,
#             Q_j = Xi_j @ A_j - Xr_j @ B_j, and output block c is
#             sum_j cos(2pi j c/Ri) P_j - sin(2pi j c/Ri) Q_j.
#
# Chunk storage order interleaves {j, j+Rz/2} pairs so the inverse
# reads contiguous lane blocks.  Gates: _use_zct_fwd for the
# forward (pays from N2 >= 256), inverse CT only when the fused
# contraction is a 128-multiple (N2 >= 1024); otherwise the dense
# irfft matrices are row-permuted to the stored order.

def _zct_factor(N2):
    """(Rz, K, Mq): Rz forward chunks, contraction K = N2//Rz,
    Mq = Zm//Rz stored modes per chunk.  (1, N2, Zm) = stay dense."""
    for Rz in (8, 4, 2):
        if N2 % (2 * Rz) == 0 and (N2 // Rz) % 128 == 0:
            return Rz, N2 // Rz, (N2 // 2) // Rz
    return 1, N2, N2 // 2


def _zct_order(Rz):
    """storage order of the forward chunks: {j, j+Rz/2} pairs
    adjacent so the Ri = Rz/2 inverse reads contiguous lanes."""
    if Rz % 2 == 0 and Rz > 2:
        out = []
        for j in range(Rz // 2):
            out += [j, j + Rz // 2]
        return out
    return list(range(Rz))


def _use_zct_fwd(N2, Zm):
    if not TUNE.get('zct', True):
        return False
    Rz, K, Mq = _zct_factor(N2)
    return Rz > 1 and Zm == N2 // 2


def _use_zct_inv(N2, Zm):
    if not _use_zct_fwd(N2, Zm):
        return False
    Rz, K, Mq = _zct_factor(N2)
    return Rz == 8 and ((N2 // 2) // (Rz // 2)) % 128 == 0


def _zct_perm(N2):
    """stored slot of each natural z mode k (k < Zm)."""
    Rz, K, Mq = _zct_factor(N2)
    order = _zct_order(Rz)
    pos = np.empty(Rz, np.int64)
    for p, j in enumerate(order):
        pos[j] = p
    k = np.arange(N2 // 2)
    return pos[k % Rz] * Mq + k // Rz


def _zct_table(N2, table):
    """reorder a natural-order z-mode table (len >= Zm) into the
    stored slot order: stored[s] holds table[k(s)]."""
    Zm = N2 // 2
    t = np.asarray(table)[:Zm]
    out = np.empty_like(t)
    out[_zct_perm(N2)] = t
    return out


def _zct_fwd_mats_np(N2):
    """(Er, Ei) of shape (Rz, K, Mq) in storage order: X_block_p =
    u_{order[p]} @ (Er[p] + i Ei[p])."""
    Rz, K, Mq = _zct_factor(N2)
    Er = np.empty((Rz, K, Mq), np.float32)
    Ei = np.empty((Rz, K, Mq), np.float32)
    m = np.arange(K)
    for p, j in enumerate(_zct_order(Rz)):
        q = np.arange(Mq)
        E = np.exp(-2j * np.pi * np.outer(m, j + Rz * q) / N2)
        Er[p] = E.real
        Ei[p] = E.imag
    return Er, Ei


def _zct_inv_mats_np(N2, grad_kvec=None, negate=False):
    """(A, B) of shape (Ri, Kin, Kb) consuming the stored-order
    spectrum: inverse chunk j reads stored lanes [j*Kin, (j+1)*Kin).
    grad_kvec folds i*k_z (NATURAL-order table, like _irfft_mats_np);
    negate folds an overall -1 (the Poisson potential sign)."""
    Rz, K, Mq = _zct_factor(N2)
    Ri = Rz // 2 if Rz == 8 else Rz
    Kin = (N2 // 2) // Ri
    Kb = N2 // Ri
    order = _zct_order(Rz)
    A = np.empty((Ri, Kin, Kb), np.float32)
    B = np.empty((Ri, Kin, Kb), np.float32)
    m = np.arange(Kb)
    for j4 in range(Ri):
        # the storage blocks whose forward residue j8 == j4 (mod Ri),
        # in storage order — contiguous by construction of _zct_order
        blocks = [j8 for j8 in order if j8 % Ri == j4]
        ks = np.concatenate([j8 + Rz * np.arange(Mq)
                             for j8 in blocks])
        w = np.where(ks == 0, 1.0, 2.0)
        th = 2 * np.pi * np.outer(ks, m) / N2
        c = np.cos(th) * w[:, None]
        s = np.sin(th) * w[:, None]
        if grad_kvec is None:
            Aj, Bj = c, -s
        else:
            kz = np.asarray(grad_kvec, np.float64)[ks][:, None]
            Aj, Bj = -kz * s, -kz * c
        if negate:
            Aj, Bj = -Aj, -Bj
        A[j4], B[j4] = Aj, Bj
    return A, B


def _z_fwd_tabs(N2, Zm):
    """forward z tables: zct (Er, Ei) 3-d when gated, else the dense
    half-DFT pair (2-d) — the kernels dispatch on ndim."""
    if _use_zct_fwd(N2, Zm):
        return _zct_fwd_mats_np(N2)
    return _dft_half_np(N2, Zm)


def _z_inv_tabs(n2, Zm, grad_kvec=None, negate=False):
    """inverse z tables matching the _z_fwd_tabs storage order:
    zct (A, B) 3-d when the fused inverse pays, else dense irfft
    matrices with rows permuted to the stored order."""
    if _use_zct_inv(n2, Zm):
        return _zct_inv_mats_np(n2, grad_kvec=grad_kvec,
                                negate=negate)
    gk = None if grad_kvec is None else \
        np.asarray(grad_kvec)[:Zm]
    A, B = _irfft_mats_np(n2, Zm, grad_kvec=gk,
                          nyquist_last=False)
    if _use_zct_fwd(n2, Zm):
        perm = _zct_perm(n2)
        Ap = np.empty_like(A)
        Bp = np.empty_like(B)
        Ap[perm] = A
        Bp[perm] = B
        A, B = Ap, Bp
    if negate:
        A, B = -A, -B
    return A, B


def _zct_fwd_apply(p, Er, Ei, N2, prec):
    """lane-resident forward z-CT inside a kernel: p (rows, N2) real
    -> (zr, zi) (rows, Zm) in stored order.  Er/Ei are refs/values
    (Rz, K, Mq)."""
    Rz, K, Mq = _zct_factor(N2)
    order = _zct_order(Rz)
    xs = [p[:, r * K:(r + 1) * K] for r in range(Rz)]
    Bt = _butter(Rz, -1)
    us = {}
    for j in range(Rz // 2 + 1):
        acc = (None, None)
        for r in range(Rz):
            acc = _cmadd(acc, xs[r], None, Bt[r, j])
        us[j] = acc
    outs_r, outs_i = [], []
    for pblk, j in enumerate(order):
        if j <= Rz // 2:
            ur, ui = us[j]
        else:
            ur, ui = us[Rz - j][0], us[Rz - j][1]
            ui = None if ui is None else -ui
        er = Er[pblk]
        ei = Ei[pblk]
        if ui is None:
            outs_r.append(_mm(ur, er, prec))
            outs_i.append(_mm(ur, ei, prec))
        else:
            outs_r.append(_mm(ur, er, prec) - _mm(ui, ei, prec))
            outs_i.append(_mm(ur, ei, prec) + _mm(ui, er, prec))
    return (jnp.concatenate(outs_r, 1), jnp.concatenate(outs_i, 1))


def _zct_inv_apply(yr, yi, A, B, n2, prec):
    """lane-resident inverse z-CT inside a kernel: stored-order
    (yr, yi) (rows, Zm) -> real (rows, n2).  A/B are refs/values
    (Ri, Kin, Kb)."""
    Ri, Kin, Kb = A.shape
    cs = _butter(Ri, +1)
    Ps, Qs = [], []
    for j in range(Ri):
        xr = yr[:, j * Kin:(j + 1) * Kin]
        xi = yi[:, j * Kin:(j + 1) * Kin]
        a = A[j]
        b = B[j]
        Ps.append(_mm(xr, a, prec) + _mm(xi, b, prec))
        Qs.append(_mm(xi, a, prec) - _mm(xr, b, prec))
    def addto(acc, coef, x):
        # acc += coef * x with 0/+-1 strength reduction (the
        # butterfly constants are mostly trivial for Ri = 4)
        if abs(coef) < 1e-30:
            return acc
        t = x if abs(coef - 1) < 1e-12 else (
            -x if abs(coef + 1) < 1e-12 else coef * x)
        return t if acc is None else acc + t

    blocks = []
    for c in range(Ri):
        # x_c = sum_j Re(e^{i a_jc} (P_j + i Q_j))
        #     = sum_j cos(a) P_j - sin(a) Q_j
        acc = None
        for j in range(Ri):
            acc = addto(acc, float(np.real(cs[j, c])), Ps[j])
            acc = addto(acc, -float(np.imag(cs[j, c])), Qs[j])
        blocks.append(acc)
    return jnp.concatenate(blocks, 1)


def _zy_forward_real_h(BX, N1, N2, Zh, prec=None):
    def kernel(x_ref, wzr, wzi, wyr, wyi, or_ref, oi_ref):
        p = x_ref[...].reshape(BX * N1, N2)
        zr = _mm(p, wzr[...], prec).reshape(BX, N1, Zh)
        zi = _mm(p, wzi[...], prec).reshape(BX, N1, Zh)
        for b in range(BX):
            or_ref[b] = (_mm(wyr[...], zr[b], prec)
                         - _mm(wyi[...], zi[b], prec))
            oi_ref[b] = (_mm(wyr[...], zi[b], prec)
                         + _mm(wyi[...], zr[b], prec))
    return kernel


def _zy_inverse_to_real_h(BX, N1, N2, Zh, prec=None):
    """inverse y transform then irfft-as-matmul along z."""
    def kernel(xr_ref, xi_ref, wyr, wyi, A, B, o_ref):
        for b in range(BX):
            pr = xr_ref[b]
            pi = xi_ref[b]
            yr = _mm(wyr[...], pr, prec) - _mm(wyi[...], pi, prec)
            yi = _mm(wyr[...], pi, prec) + _mm(wyi[...], pr, prec)
            o_ref[b] = _mm(yr, A[...], prec) + _mm(yi, B[...], prec)
    return kernel


@functools.partial(jax.jit, static_argnames=('norm', 'precision'))
def fft3_real_forward_half(x, norm=True, precision=None):
    """hermitian-half forward FFT of a real array: returns (r, i) of
    shape (N0, N1, N2//2+1), scaled like :func:`fft3_real_forward`."""
    N0, N1, N2 = x.shape
    Zh = N2 // 2 + 1
    wzr, wzi = (jnp.asarray(a) for a in _dft_half_np(N2, Zh))
    wyr, wyi = _dft(N1, -1)
    wxr, wxi = _dft(N0, -1)
    prec = _resolve_prec(precision)

    BX = _pick_bx(N0, N1, Zh)
    pr, pi = pl.pallas_call(
        _zy_forward_real_h(BX, N1, N2, Zh, prec),
        grid=(N0 // BX,),
        in_specs=[_xplane_spec(N1, N2, BX),
                  _full_spec((N2, Zh)), _full_spec((N2, Zh)),
                  _full_spec((N1, N1)), _full_spec((N1, N1))],
        out_specs=(_xplane_spec(N1, Zh, BX), _xplane_spec(N1, Zh, BX)),
        out_shape=(jax.ShapeDtypeStruct((N0, N1, Zh), jnp.float32),
                   jax.ShapeDtypeStruct((N0, N1, Zh), jnp.float32)),
        compiler_params=_params(),
        interpret=_interpret(),
    )(x.astype(jnp.float32), wzr, wzi, wyr, wyi)

    scale = 1.0 / (N0 * N1 * N2) if norm else 1.0
    rr, ii = pl.pallas_call(
        _x_transform(N0, 8 if N1 % 8 == 0 else N1, Zh,
                     np.float32(scale), prec),
        grid=(N1 // (8 if N1 % 8 == 0 else N1), 1),
        in_specs=[_yzblock_spec(N0, 8 if N1 % 8 == 0 else N1, Zh),
                  _yzblock_spec(N0, 8 if N1 % 8 == 0 else N1, Zh),
                  _full_spec2((N0, N0)), _full_spec2((N0, N0))],
        out_specs=(_yzblock_spec(N0, 8 if N1 % 8 == 0 else N1, Zh),
                   _yzblock_spec(N0, 8 if N1 % 8 == 0 else N1, Zh)),
        out_shape=(jax.ShapeDtypeStruct((N0, N1, Zh), jnp.float32),
                   jax.ShapeDtypeStruct((N0, N1, Zh), jnp.float32)),
        compiler_params=_params(),
        interpret=_interpret(),
    )(pr, pi, wxr, wxi)
    return rr, ii


@functools.partial(jax.jit, static_argnames=('n2', 'kvecs',
                                             'precision'))
def fft3_real_inverse_grad3_half(r, i, n2, kvecs, precision=None):
    """the spectral force triple from a HALF spectrum (r, i) of shape
    (N0, N1, Zh): unnormalized inverses of i*k_d * spectrum.  The y/z
    gradients fold into pass-1 matrices and share one x-pass.

    Requires kvecs[0]/kvecs[1] to VANISH at the Nyquist frequency of
    even-length axes (true for the SuperLanczos force kernel): a
    nonzero odd multiplier at Nyquist breaks the hermitian symmetry
    the half-spectrum doubling relies on.  kvecs[2] covers the half
    axis (len Zh)."""
    N0, N1, Zh = r.shape
    for d, n in ((0, N0), (1, N1)):
        if n % 2 == 0 and abs(kvecs[d][n // 2]) > 1e-12:
            raise ValueError(
                "kvecs[%d] must vanish at the Nyquist index for the "
                "half-spectrum gradient (use a Nyquist-zero force "
                "kernel like SuperLanczos, or the full-spectrum "
                "fft3_real_inverse_grad3)" % d)
    if len(kvecs[2]) != Zh:
        raise ValueError("kvecs[2] must have length Zh=%d" % Zh)
    prec = _resolve_prec(precision)
    wy = _dft_np(N1, +1)
    wx = _dft_np(N0, +1)
    wx_g = _fold_i_freq(*wx, kvecs[0], 'right')
    wy_g = _fold_i_freq(*wy, kvecs[1], 'right')
    A_p, B_p = _irfft_mats_np(n2, Zh)
    A_g, B_g = _irfft_mats_np(n2, Zh, grad_kvec=kvecs[2])

    BY = 8 if N1 % 8 == 0 else N1
    BX = _pick_bx(N0, N1, Zh)

    def xpass(rr, ii, W):
        return pl.pallas_call(
            _x_transform(N0, BY, Zh, np.float32(1.0), prec),
            grid=(N1 // BY, 1),
            in_specs=[_yzblock_spec(N0, BY, Zh),
                      _yzblock_spec(N0, BY, Zh),
                      _full_spec2((N0, N0)), _full_spec2((N0, N0))],
            out_specs=(_yzblock_spec(N0, BY, Zh),
                       _yzblock_spec(N0, BY, Zh)),
            out_shape=(jax.ShapeDtypeStruct((N0, N1, Zh), jnp.float32),
                       jax.ShapeDtypeStruct((N0, N1, Zh), jnp.float32)),
            compiler_params=_params(),
            interpret=_interpret(),
        )(rr, ii, jnp.asarray(W[0]), jnp.asarray(W[1]))

    def zypass(rr, ii, Wy, AB):
        return pl.pallas_call(
            _zy_inverse_to_real_h(BX, N1, n2, Zh, prec),
            grid=(N0 // BX,),
            in_specs=[_xplane_spec(N1, Zh, BX), _xplane_spec(N1, Zh, BX),
                      _full_spec((N1, N1)), _full_spec((N1, N1)),
                      _full_spec((Zh, n2)), _full_spec((Zh, n2))],
            out_specs=_xplane_spec(N1, n2, BX),
            out_shape=jax.ShapeDtypeStruct((N0, N1, n2), jnp.float32),
            compiler_params=_params(),
            interpret=_interpret(),
        )(rr, ii, jnp.asarray(Wy[0]), jnp.asarray(Wy[1]),
          jnp.asarray(AB[0]), jnp.asarray(AB[1]))

    sr, si = xpass(r, i, wx)
    fy = zypass(sr, si, wy_g, (A_p, B_p))
    fz = zypass(sr, si, wy, (A_g, B_g))
    gr, gi = xpass(r, i, wx_g)
    fx = zypass(gr, gi, wy, (A_p, B_p))
    return fx, fy, fz


# --- Cooley-Tukey factored axes ------------------------------------------
#
# A dense length-N DFT matmul costs N MACs per element.  Splitting
# N = R * M (radix R, M kept at >=128 so the MXU contraction stays
# full) costs M MACs per element in ONE matmul per chunk plus an
# R-way VPU butterfly:
#
#   x[n], n = r*M + m  (R contiguous sublane chunks — no strided
#   VMEM access anywhere)
#   U_j[m]    = sum_r x[r*M + m] * W_R^{r j}          (VPU butterfly)
#   X[j + Rq] = sum_m U_j[m] * W_M^{q m} * W_N^{m j}  (per-chunk matmul,
#                twiddle folded into the matrix columns — free)
#
# The spectrum is stored CHUNK-PERMUTED: slot j*M + q holds mode
# j + R*q.  Only this module's filters ever index the spectrum, so
# the permutation is just a host-side reorder of the 1-d wavenumber
# tables (_ct_permute).  The inverse consumes the permuted layout:
#
#   Y_j[m]   = sum_q X_j[q] * W_M^{-m q} * W_N^{-m j} (rows folded)
#   x[r*M+m] = sum_j W_R^{-r j} * Y_j[m]              (VPU butterfly)
#
# and a spectral i*k gradient folds into the per-chunk inverse
# matrix columns exactly like the dense _fold_i_freq.
# MAC reduction: R=4 at N=512, R=8 at N=1024 — 4x/8x fewer MACs in
# the x/y stages at full MXU contraction.

def _ct_factor(n):
    """(R, M) split: largest radix in {8, 4, 2} keeping M a multiple
    of 128 (full MXU contraction).  (1, n) means stay dense."""
    t = TUNE.get('radix:%d' % n)
    if t and n % t == 0 and (n // t) % 128 == 0:
        return int(t), n // int(t)
    for R in (8, 4, 2):
        if n % R == 0 and (n // R) % 128 == 0:
            return R, n // R
    return 1, n


def _ct_permute(n):
    """slot index of each MODE: mode k is stored at slot
    (k % R)*M + k // R.  ``natural[k] = stored[_ct_permute(n)[k]]``
    recovers natural order from a stored axis."""
    R, M = _ct_factor(n)
    k = np.arange(n)
    return (k % R) * M + k // R


def _ct_table(n, table):
    """reorder a natural-order per-axis table (wavenumbers, k^2) into
    the stored (slot) order: slot j*M + q holds mode j + R*q."""
    R, M = _ct_factor(n)
    s = np.arange(n)
    return np.asarray(table)[(s // M) + R * (s % M)]


def _ct_fwd_mats_np(n):
    """per-chunk forward matrices (R, M, M): W_j[q, m] =
    W_M^{qm} * W_N^{mj} (twiddle in the columns)."""
    R, M = _ct_factor(n)
    q = np.arange(M)
    m = np.arange(M)
    Wr = np.empty((R, M, M), np.float32)
    Wi = np.empty((R, M, M), np.float32)
    for j in range(R):
        W = np.exp(-2j * np.pi * (np.outer(q, m) / M + m[None, :] * j / n))
        Wr[j] = W.real
        Wi[j] = W.imag
    return Wr, Wi


def _ct_inv_mats_np(n, fold_kvec=None):
    """per-chunk inverse matrices (R, M, M): W_j[m, q] =
    W_M^{-mq} * W_N^{-mj}, optionally with diag(i * k_perm_j) folded
    into the columns (the CT analog of _fold_i_freq)."""
    R, M = _ct_factor(n)
    q = np.arange(M)
    m = np.arange(M)
    Wr = np.empty((R, M, M), np.float32)
    Wi = np.empty((R, M, M), np.float32)
    kv = None if fold_kvec is None else np.asarray(fold_kvec,
                                                  np.float64)
    for j in range(R):
        W = np.exp(2j * np.pi * (np.outer(m, q) / M + m[:, None] * j / n))
        if kv is not None:
            W = W * (1j * kv[j + R * q])[None, :]
        Wr[j] = W.real
        Wi[j] = W.imag
    return Wr, Wi


def _butter(R, sign):
    """numpy complex butterfly constants W_R^{sign * r j}."""
    r = np.arange(R)
    return np.exp(sign * 2j * np.pi * np.outer(r, r) / R)


def _cmadd(acc, xr, xi, c):
    """acc (r, i) += c * (xr + i xi) with trivial-coefficient
    strength reduction (c from the butterfly table: many are
    0/+-1/+-i)."""
    ar, ai = acc
    cr, ci = float(np.real(c)), float(np.imag(c))

    def term(coef, a, b):
        # out_r += coef*a ; helper applied per component
        if a is None or abs(coef) < 1e-30:
            return b
        t = a if abs(coef - 1) < 1e-12 else (
            -a if abs(coef + 1) < 1e-12 else a * coef)
        return t if b is None else b + t

    ar = term(cr, xr, ar)
    ar = term(-ci, xi, ar)
    ai = term(ci, xr, ai)
    ai = term(cr, xi, ai)
    return ar, ai


def _ct_fwd_apply(xr, xi, wr, wi, n, prec):
    """CT transform along axis 0 of (n, W) values inside a kernel.
    xi may be None (real input).  wr/wi are refs/values (R, M, M).
    Returns (out_r, out_i) in the chunk-permuted order."""
    R, M = _ct_factor(n)
    Wd = xr.shape[1]
    B = _butter(R, -1)
    xs_r = xr.reshape(R, M, Wd)
    xs_i = None if xi is None else xi.reshape(R, M, Wd)
    outs_r, outs_i = [], []
    for j in range(R):
        acc = (None, None)
        for r in range(R):
            acc = _cmadd(acc, xs_r[r],
                         None if xs_i is None else xs_i[r], B[r, j])
        ur, ui = acc
        wjr = wr[j]
        wji = wi[j]
        if ui is None:
            outs_r.append(_mm(wjr, ur, prec))
            outs_i.append(_mm(wji, ur, prec))
        else:
            outs_r.append(_mm(wjr, ur, prec) - _mm(wji, ui, prec))
            outs_i.append(_mm(wjr, ui, prec) + _mm(wji, ur, prec))
    return (jnp.concatenate(outs_r, 0), jnp.concatenate(outs_i, 0))


def _ct_inv_apply(xr, xi, wr, wi, n, prec, real_out=False):
    """inverse CT along axis 0 of chunk-permuted (n, W) values.
    Returns (out_r, out_i) in natural order (out_i None when
    real_out)."""
    R, M = _ct_factor(n)
    Wd = xr.shape[1]
    B = _butter(R, +1)
    ys = []
    for j in range(R):
        pr = xr[j * M:(j + 1) * M]
        pi = xi[j * M:(j + 1) * M]
        wjr = wr[j]
        wji = wi[j]
        yr = _mm(wjr, pr, prec) - _mm(wji, pi, prec)
        yi = _mm(wjr, pi, prec) + _mm(wji, pr, prec)
        ys.append((yr, yi))
    outs_r, outs_i = [], []
    for r in range(R):
        acc = (None, None)
        for j in range(R):
            acc = _cmadd(acc, ys[j][0], ys[j][1], B[r, j])
        outs_r.append(acc[0])
        if not real_out:
            outs_i.append(acc[1])
    out_r = jnp.concatenate(outs_r, 0)
    if real_out:
        return out_r, None
    return out_r, jnp.concatenate(outs_i, 0)


# --- CT kernels (hermitian-half pipeline, x/y axes factored) -------------

def _x_transform_ct_multi(N0, BY, BZ, scale, prec=None, inverse=False,
                          dual=False, with_k2=False):
    """x-axis CT kernel, generalized:

    - ``dual``: apply TWO weight sets (the plain and the kx-folded
      inverse of the force triple) to one input read — halves the
      dominant-stage HBM traffic of the spectral triple.
    - ``with_k2``: fold the 1/k^2 Poisson filter into the input in
      VMEM from three 1-d tables (storage-permuted x/y, natural z) —
      removes the separate XLA elementwise pass over the spectrum.
    """
    flat = TUNE.get('xct_flat')
    if flat is None:
        flat = (BZ % 128 == 0)

    def kernel(*refs):
        p = 0
        xr_ref, xi_ref = refs[p], refs[p + 1]
        p += 2
        wsets = [(refs[p], refs[p + 1])]
        p += 2
        if dual:
            wsets.append((refs[p], refs[p + 1]))
            p += 2
        if with_k2:
            k2x, k2y, k2z = refs[p], refs[p + 1], refs[p + 2]
            p += 3
        orefs = refs[p:]

        # sub-32-bit STORAGE (bf16 spectra — half the HBM traffic)
        # upcasts at the VMEM refs: Mosaic cannot matmul mixed
        # f32 x bf16 operands ("Bad rhs type") and the butterfly
        # accumulation wants f32 anyway
        xr = xr_ref[...].astype(jnp.float32)
        xi = xi_ref[...].astype(jnp.float32)
        if with_k2:
            k2 = (k2x[...].reshape(N0, 1, 1)
                  + k2y[...].reshape(1, BY, 1)
                  + k2z[...].reshape(1, 1, BZ))
            invk2 = jnp.where(k2 > 0.0,
                              1.0 / jnp.where(k2 > 0.0, k2, 1.0), 0.0)
            xr = xr * invk2
            xi = xi * invk2

        def one(br, bi, wr, wi):
            if inverse:
                rr, ii = _ct_inv_apply(br, bi, wr, wi, N0, prec)
            else:
                rr, ii = _ct_fwd_apply(br, bi, wr, wi, N0, prec)
            return rr * scale, ii * scale

        for s, (wr, wi) in enumerate(wsets):
            if flat:
                rr, ii = one(xr.reshape(N0, BY * BZ),
                             xi.reshape(N0, BY * BZ), wr, wi)
                orefs[2 * s][...] = rr.reshape(N0, BY, BZ).astype(
                    orefs[2 * s].dtype)
                orefs[2 * s + 1][...] = ii.reshape(N0, BY, BZ).astype(
                    orefs[2 * s + 1].dtype)
            else:
                for b in range(BY):
                    rr, ii = one(xr[:, b, :], xi[:, b, :], wr, wi)
                    orefs[2 * s][:, b, :] = rr.astype(
                        orefs[2 * s].dtype)
                    orefs[2 * s + 1][:, b, :] = ii.astype(
                        orefs[2 * s + 1].dtype)
    return kernel


def _xct_call_multi(pr, pi, wx, scale, prec, inverse=False, wx2=None,
                    k2=None, out_dtype=jnp.float32):
    """CT x-axis transform of an (N0, n1, W) block with optional dual
    weights and in-VMEM 1/k^2 folding (see _x_transform_ct_multi).

    k2 : None or (k2x_perm, k2y_local, k2z) 1-d f32 tables; k2y_local
        must cover exactly the n1 rows of this block (the caller
        shards it alongside the spectrum).
    out_dtype : spectrum STORAGE dtype — bf16 halves the HBM traffic
        of the dominant stage (matmuls still run f32; the cast
        happens at the output store, not as a separate XLA pass).
    Returns (r, i) or (r, i, r2, i2).
    """
    N0, n1, W = pr.shape
    Rx, Mx = _ct_factor(N0)
    BY = int(TUNE.get('xct_by', 8))
    BY = BY if n1 % BY == 0 else (8 if n1 % 8 == 0 else n1)
    BZ = W
    cap = int(TUNE.get('xct_ref_bytes', 4 * 1024 * 1024))
    while BZ % 2 == 0 and BZ // 2 % 128 == 0 \
            and N0 * BY * BZ * 4 > cap:
        BZ //= 2
    dual = wx2 is not None
    with_k2 = k2 is not None

    if BZ == W:
        def yspec():
            return pl.BlockSpec((N0, BY, W), lambda t: (0, t, 0),
                                memory_space=pltpu.VMEM)
        grid = (n1 // BY,)
        mat_spec = _full_spec((Rx, Mx, Mx))
        k2x_spec = _full_spec((N0, 1))
        k2y_spec = pl.BlockSpec((BY, 1), lambda t: (t, 0),
                                memory_space=pltpu.VMEM)
        k2z_spec = _full_spec((1, W))
    else:
        def yspec():
            return pl.BlockSpec((N0, BY, BZ),
                                lambda t, z: (0, t, z),
                                memory_space=pltpu.VMEM)
        grid = (n1 // BY, W // BZ)
        mat_spec = _full_spec2((Rx, Mx, Mx))
        k2x_spec = _full_spec2((N0, 1))
        k2y_spec = pl.BlockSpec((BY, 1), lambda t, z: (t, 0),
                                memory_space=pltpu.VMEM)
        k2z_spec = pl.BlockSpec((1, BZ), lambda t, z: (0, z),
                                memory_space=pltpu.VMEM)

    in_specs = [yspec(), yspec(), mat_spec, mat_spec]
    args = [pr, pi, jnp.asarray(wx[0]), jnp.asarray(wx[1])]
    if dual:
        in_specs += [mat_spec, mat_spec]
        args += [jnp.asarray(wx2[0]), jnp.asarray(wx2[1])]
    if with_k2:
        in_specs += [k2x_spec, k2y_spec, k2z_spec]
        args += [jnp.asarray(k2[0]).reshape(N0, 1),
                 jnp.asarray(k2[1]).reshape(n1, 1),
                 jnp.asarray(k2[2]).reshape(1, W)]
    nout = 4 if dual else 2
    out = pl.pallas_call(
        _x_transform_ct_multi(N0, BY, BZ, np.float32(scale), prec,
                              inverse=inverse, dual=dual,
                              with_k2=with_k2),
        grid=grid,
        in_specs=in_specs,
        out_specs=(yspec(),) * nout,
        out_shape=(jax.ShapeDtypeStruct((N0, n1, W),
                                        out_dtype),) * nout,
        compiler_params=_params(),
        interpret=_interpret(),
    )(*args)
    return out


# --- split-Nyquist CT pipeline --------------------------------------------
#
# Zh = N2//2+1 is lane-hostile: every x/y matmul on a width-257 block
# pads to 384 lanes (1.5x wasted MXU/VMEM).  The z-Nyquist column is
# special anyway: its z-transform weight is (-1)^n, so
#
#   X_nyq[x, y] = sum_n rho[x, y, n] * (-1)^n     (a VPU row sum)
#
# and its inverse contribution is out[x,y,n] += plane[x,y] * (-1)^n
# (the irfft B row is exactly 0 there).  Splitting it off leaves the
# main pipeline at a perfectly aligned width Zm = N2//2; the (N0, N1)
# Nyquist plane rides separate tiny 2-d transforms (1/Zm of the
# volume, natural order, plain MXU matmuls outside pallas).

def _signs(n, dtype=jnp.float32):
    """(1, n) array of (-1)^j (2-d iota: TPU-safe)."""
    j = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    return jnp.where(j % 2 == 0, 1.0, -1.0).astype(dtype)


def _zy_forward_real_h_ct2(BX, N1, N2, Zm, prec=None):
    """pass 1, split Nyquist: half-rfft z matmuls to Zm columns + the
    alternating-sum Nyquist plane (emitted raw, pre-x/y transforms);
    CT-y on the main block."""
    def kernel(x_ref, wzr, wzi, wyr, wyi, or_ref, oi_ref, nq_ref):
        # upcast sub-32-bit storage at the ref (see _x_transform_ct_multi)
        p = x_ref[...].reshape(BX * N1, N2).astype(jnp.float32)
        nq_ref[...] = jnp.sum(p * _signs(N2, p.dtype),
                              axis=1).reshape(BX, 1, N1)
        if len(wzr.shape) == 3:   # z-CT tables (Rz, K, Mq)
            zr, zi = _zct_fwd_apply(p, wzr, wzi, N2, prec)
            zr = zr.reshape(BX, N1, Zm)
            zi = zi.reshape(BX, N1, Zm)
        else:
            zr = _mm(p, wzr[...], prec).reshape(BX, N1, Zm)
            zi = _mm(p, wzi[...], prec).reshape(BX, N1, Zm)
        for b in range(BX):
            yr, yi = _ct_fwd_apply(zr[b], zi[b], wyr, wyi, N1, prec)
            or_ref[b] = yr.astype(or_ref.dtype)
            oi_ref[b] = yi.astype(oi_ref.dtype)
    return kernel


def _zy_inverse_to_real_h_ct2(BX, N1, n2, Zm, prec=None,
                              with_plane=False):
    """inverse pass on the Zm-wide main block; with_plane adds the
    already-xy-inverted Nyquist plane with (-1)^n weights."""
    def kernel(*refs):
        if with_plane:
            xr_ref, xi_ref, wyr, wyi, A, B, pl_ref, o_ref = refs
        else:
            xr_ref, xi_ref, wyr, wyi, A, B, o_ref = refs
        for b in range(BX):
            yr, yi = _ct_inv_apply(xr_ref[b].astype(jnp.float32),
                                   xi_ref[b].astype(jnp.float32),
                                   wyr, wyi, N1, prec)
            if len(A.shape) == 3:    # z-CT inverse (Ri, Kin, Kb)
                out = _zct_inv_apply(yr, yi, A, B, n2, prec)
            else:
                out = _mm(yr, A[...], prec) + _mm(yi, B[...], prec)
            if with_plane:
                out = out + pl_ref[b, 0][:, None] * _signs(n2,
                                                           out.dtype)
            o_ref[b] = out.astype(o_ref.dtype)
    return kernel


def _zy_inverse_to_real_h_ct2_dual(BX, N1, n2, Zm, prec=None,
                                   with_plane=False):
    """TWO inverse pipelines sharing one (xr, xi) input read — the
    (fy, fz) pair of the spectral force triple reads the same
    Poisson-filtered spectrum, so a dual kernel halves that read
    (the zy analog of the dual x-pass).  Set A carries the optional
    Nyquist plane; set B never does (the z-gradient's Nyquist
    contribution vanishes)."""
    def kernel(*refs):
        if with_plane:
            (xr_ref, xi_ref, wyrA, wyiA, Aa, Ba,
             wyrB, wyiB, Ab, Bb, pl_ref, oA, oB) = refs
        else:
            (xr_ref, xi_ref, wyrA, wyiA, Aa, Ba,
             wyrB, wyiB, Ab, Bb, oA, oB) = refs
        for b in range(BX):
            xr = xr_ref[b].astype(jnp.float32)
            xi = xi_ref[b].astype(jnp.float32)
            yr, yi = _ct_inv_apply(xr, xi, wyrA, wyiA, N1, prec)
            if len(Aa.shape) == 3:   # z-CT inverse (Ri, Kin, Kb)
                out = _zct_inv_apply(yr, yi, Aa, Ba, n2, prec)
            else:
                out = _mm(yr, Aa[...], prec) + _mm(yi, Ba[...], prec)
            if with_plane:
                out = out + pl_ref[b, 0][:, None] * _signs(n2,
                                                           out.dtype)
            oA[b] = out.astype(oA.dtype)
            yr, yi = _ct_inv_apply(xr, xi, wyrB, wyiB, N1, prec)
            if len(Ab.shape) == 3:
                out = _zct_inv_apply(yr, yi, Ab, Bb, n2, prec)
            else:
                out = _mm(yr, Ab[...], prec) + _mm(yi, Bb[...], prec)
            oB[b] = out.astype(oB.dtype)
    return kernel


def _zy_inv_ct2_call_dual(rr, ii, WyA, ABA, WyB, ABB, n2, prec,
                          planeA=None, out_dtype=jnp.float32):
    """dual-output inverse pass: (outA, outB) from one (rr, ii) read.
    planeA (if given) is added to outA only."""
    n0, N1, Zm = rr.shape
    Ry, My = _ct_factor(N1)
    BX = _pick_bx(n0, N1, Zm, tag='zyid')
    with_plane = planeA is not None
    in_specs = [_xplane_spec(N1, Zm, BX), _xplane_spec(N1, Zm, BX),
                _full_spec((Ry, My, My)), _full_spec((Ry, My, My)),
                _full_spec(np.shape(ABA[0])),
                _full_spec(np.shape(ABA[1])),
                _full_spec((Ry, My, My)), _full_spec((Ry, My, My)),
                _full_spec(np.shape(ABB[0])),
                _full_spec(np.shape(ABB[1]))]
    args = [rr, ii, jnp.asarray(WyA[0]), jnp.asarray(WyA[1]),
            jnp.asarray(ABA[0]), jnp.asarray(ABA[1]),
            jnp.asarray(WyB[0]), jnp.asarray(WyB[1]),
            jnp.asarray(ABB[0]), jnp.asarray(ABB[1])]
    if with_plane:
        in_specs.append(pl.BlockSpec((BX, 1, N1),
                                     lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(planeA[:, None, :])
    return pl.pallas_call(
        _zy_inverse_to_real_h_ct2_dual(BX, N1, n2, Zm, prec,
                                       with_plane=with_plane),
        grid=(n0 // BX,),
        in_specs=in_specs,
        out_specs=(_xplane_spec(N1, n2, BX),
                   _xplane_spec(N1, n2, BX)),
        out_shape=(jax.ShapeDtypeStruct((n0, N1, n2), out_dtype),
                   jax.ShapeDtypeStruct((n0, N1, n2), out_dtype)),
        compiler_params=_params(),
        interpret=_interpret(),
    )(*args)


def _plane_fft2(nq_r, nq_i, N0, N1, sign, prec, scale=1.0):
    """2-d complex DFT of the Nyquist plane with plain MXU matmuls
    (symmetric DFT matrices: left-mult transforms x, right-mult y).
    nq_i may be None (real input).  Natural order."""
    wx = _dft_np(N0, sign)
    wy = _dft_np(N1, sign)
    wxr, wxi = jnp.asarray(wx[0]), jnp.asarray(wx[1])
    wyr, wyi = jnp.asarray(wy[0]), jnp.asarray(wy[1])
    if nq_i is None:
        ar = _mm(wxr, nq_r, prec)
        ai = _mm(wxi, nq_r, prec)
    else:
        ar = _mm(wxr, nq_r, prec) - _mm(wxi, nq_i, prec)
        ai = _mm(wxr, nq_i, prec) + _mm(wxi, nq_r, prec)
    sr = _mm(ar, wyr, prec) - _mm(ai, wyi, prec)
    si = _mm(ar, wyi, prec) + _mm(ai, wyr, prec)
    return sr * scale, si * scale


def _zy_fwd_ct2_call(x, N2, Zm, wz, wy, prec, out_dtype=jnp.float32):
    """pass 1 (ct2) on an (n0, N1, N2) block -> (r, i, nyq_plane).
    The nyq output carries a unit middle axis inside the kernel so
    its block tiling is always legal; it is squeezed here.  bf16
    input/out_dtype ride as STORAGE only (kernel computes f32); the
    tiny nyq plane stays f32."""
    n0, N1, _ = x.shape
    Ry, My = _ct_factor(N1)
    BX = _pick_bx(n0, N1, Zm, tag='zyf')
    pr, pi, nq = pl.pallas_call(
        _zy_forward_real_h_ct2(BX, N1, N2, Zm, prec),
        grid=(n0 // BX,),
        in_specs=[_xplane_spec(N1, N2, BX),
                  _full_spec(np.shape(wz[0])),
                  _full_spec(np.shape(wz[1])),
                  _full_spec((Ry, My, My)), _full_spec((Ry, My, My))],
        out_specs=(_xplane_spec(N1, Zm, BX), _xplane_spec(N1, Zm, BX),
                   pl.BlockSpec((BX, 1, N1), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n0, N1, Zm), out_dtype),
                   jax.ShapeDtypeStruct((n0, N1, Zm), out_dtype),
                   jax.ShapeDtypeStruct((n0, 1, N1), jnp.float32)),
        compiler_params=_params(),
        interpret=_interpret(),
    )(x if x.dtype.itemsize < 4 else x.astype(jnp.float32),
      jnp.asarray(wz[0]), jnp.asarray(wz[1]),
      jnp.asarray(wy[0]), jnp.asarray(wy[1]))
    return pr, pi, nq[:, 0, :]


def _xct_call(pr, pi, wx, scale, prec, inverse=False,
              out_dtype=jnp.float32):
    """CT x-axis transform of an (N0, n1, W) block — the single-set,
    no-filter form of :func:`_xct_call_multi` (kept as the simple
    entry point for tools and the forward pass)."""
    return _xct_call_multi(pr, pi, wx, scale, prec, inverse=inverse,
                           out_dtype=out_dtype)


def _zy_inv_ct2_call(rr, ii, Wy, AB, n2, prec, plane=None,
                     out_dtype=jnp.float32):
    """inverse pass (ct2) on an (n0, N1, Zm) block; optionally adds
    the xy-inverted Nyquist plane with (-1)^n weights.  bf16 in/out
    ride as storage only (kernel computes f32)."""
    n0, N1, Zm = rr.shape
    Ry, My = _ct_factor(N1)
    BX = _pick_bx(n0, N1, Zm, tag='zyi')
    with_plane = plane is not None
    in_specs = [_xplane_spec(N1, Zm, BX), _xplane_spec(N1, Zm, BX),
                _full_spec((Ry, My, My)), _full_spec((Ry, My, My)),
                _full_spec(np.shape(AB[0])),
                _full_spec(np.shape(AB[1]))]
    args = [rr, ii, jnp.asarray(Wy[0]), jnp.asarray(Wy[1]),
            jnp.asarray(AB[0]), jnp.asarray(AB[1])]
    if with_plane:
        in_specs.append(pl.BlockSpec((BX, 1, N1),
                                     lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(plane[:, None, :])
    return pl.pallas_call(
        _zy_inverse_to_real_h_ct2(BX, N1, n2, Zm, prec,
                                  with_plane=with_plane),
        grid=(n0 // BX,),
        in_specs=in_specs,
        out_specs=_xplane_spec(N1, n2, BX),
        out_shape=jax.ShapeDtypeStruct((n0, N1, n2), out_dtype),
        compiler_params=_params(),
        interpret=_interpret(),
    )(*args)


@functools.partial(jax.jit, static_argnames=('norm', 'precision',
                                             'spectrum_dtype'))
def fft3_real_forward_half_ct2(x, norm=True, precision=None,
                               spectrum_dtype=None):
    """split-Nyquist CT forward: returns (r, i, nqr, nqi) — the main
    (N0, N1, N2//2) spectrum with CHUNK-PERMUTED x/y axes (and a
    chunk-permuted z axis too when the z-CT gate is on,
    :func:`_use_zct_fwd`; per-mode z tables then fold through
    :func:`_zct_table`) and the z-Nyquist plane spectrum (N0, N1) in
    natural x/y order.

    spectrum_dtype : None (f32) or jnp.bfloat16 — STORAGE dtype of
        the returned/intermediate spectra; every matmul still runs
        f32-accumulated.  bf16 halves the spectrum HBM traffic (and,
        sharded, the all_to_all payload) at ~1e-3 relative spectrum
        rounding; the tiny Nyquist plane stays f32."""
    N0, N1, N2 = x.shape
    Zm = N2 // 2
    Rx, Mx = _ct_factor(N0)
    Ry, My = _ct_factor(N1)
    if Rx == 1 or Ry == 1 or N2 % 2:
        raise ValueError("ct2 needs N0/N1 = R*128k and even N2 "
                         "(got %s)" % ((N0, N1, N2),))
    sdt = spectrum_dtype or jnp.float32
    wz = _z_fwd_tabs(N2, Zm)
    wy = _ct_fwd_mats_np(N1)
    wx = _ct_fwd_mats_np(N0)
    prec = _resolve_prec(precision)

    pr, pi, nq = _zy_fwd_ct2_call(x, N2, Zm, wz, wy, prec,
                                  out_dtype=sdt)
    scale = 1.0 / (N0 * N1 * N2) if norm else 1.0
    rr, ii = _xct_call(pr, pi, wx, scale, prec, out_dtype=sdt)
    nqr, nqi = _plane_fft2(nq, None, N0, N1, -1, prec,
                           jnp.float32(scale))
    return rr, ii, nqr, nqi


@functools.partial(jax.jit, static_argnames=('n2', 'kvecs',
                                             'precision', 'poisson_k2',
                                             'only'))
def fft3_real_inverse_grad3_half_ct2(r, i, nqr, nqi, n2, kvecs,
                                     precision=None, poisson_k2=None,
                                     only=None):
    """split-Nyquist CT spectral force triple (see the dense variant
    for the math).  The z-gradient's Nyquist contribution vanishes
    (kvecs[2] is Nyquist-zero), so only fx/fy carry the plane.

    poisson_k2 : None or a static tuple of 3 NATURAL-order k^2 tables
        (len N0, N1, Zm+1).  When given, (r, i, nqr, nqi) are the RAW
        forward spectrum and the 1/k^2 Poisson filter is folded into
        the x-pass kernel (in-VMEM, from the 1-d tables) — no separate
        elementwise pass over the spectrum.
    only : None or 0/1/2 — compute just that force direction (one
        x-pass + one zy-inverse); used by the linear_call backward of
        ``Solver._mxu_force_meshes`` (models/fastpm.py), where each
        cotangent mesh needs a single direction."""
    N0, N1, Zm = r.shape
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
    A_p, B_p = _z_inv_tabs(n2, Zm)
    A_g, B_g = _z_inv_tabs(n2, Zm, grad_kvec=kvecs[2])

    # Nyquist-plane force contributions (fx, fy only; the z kernel
    # vanishes at Nyquist): i*k ⊙ plane, inverse 2-d, real part
    kx = np.asarray(kvecs[0], np.float32)
    ky = np.asarray(kvecs[1], np.float32)
    k2m = None
    if poisson_k2 is not None:
        # the (N0, N1) Nyquist plane is 1/Zm of the volume — filter it
        # here; the main spectrum's filter folds into the x kernel
        invk2p, k2m = _poisson_tables(poisson_k2, N0, N1, Zm)
        nqr = nqr * invk2p
        nqi = nqi * invk2p
    px_r = -nqi * kx[:, None]
    px_i = nqr * kx[:, None]
    py_r = -nqi * ky[None, :]
    py_i = nqr * ky[None, :]
    plane_x = plane_y = None
    if only in (None, 0):
        plane_x = _plane_fft2(px_r, px_i, N0, N1, +1, prec)[0]
    if only in (None, 1):
        plane_y = _plane_fft2(py_r, py_i, N0, N1, +1, prec)[0]

    # bf16 (r, i) input => keep the x-pass intermediates in bf16 too
    # (storage only; the zy-inverse upcasts at its refs and the force
    # meshes come out f32)
    sdt = r.dtype if r.dtype.itemsize < 4 else jnp.float32
    if only == 0:
        gr, gi = _xct_call_multi(r, i, wx_g, 1.0, prec, inverse=True,
                                 k2=k2m, out_dtype=sdt)
        return _zy_inv_ct2_call(gr, gi, wy, (A_p, B_p), n2, prec,
                                plane=plane_x)
    if only in (1, 2):
        sr, si = _xct_call_multi(r, i, wx, 1.0, prec, inverse=True,
                                 k2=k2m, out_dtype=sdt)
        if only == 1:
            return _zy_inv_ct2_call(sr, si, wy_g, (A_p, B_p), n2,
                                    prec, plane=plane_y)
        return _zy_inv_ct2_call(sr, si, wy, (A_g, B_g), n2, prec)
    if TUNE.get('xct_dual', True):
        sr, si, gr, gi = _xct_call_multi(r, i, wx, 1.0, prec,
                                         inverse=True, wx2=wx_g,
                                         k2=k2m, out_dtype=sdt)
    else:
        sr, si = _xct_call_multi(r, i, wx, 1.0, prec, inverse=True,
                                 k2=k2m, out_dtype=sdt)
        gr, gi = _xct_call_multi(r, i, wx_g, 1.0, prec, inverse=True,
                                 k2=k2m, out_dtype=sdt)
    if TUNE.get('zy_dual', True):
        # fy/fz share the (sr, si) read: one dual kernel
        fy, fz = _zy_inv_ct2_call_dual(sr, si, wy_g, (A_p, B_p),
                                       wy, (A_g, B_g), n2, prec,
                                       planeA=plane_y)
    else:
        fy = _zy_inv_ct2_call(sr, si, wy_g, (A_p, B_p), n2, prec,
                              plane=plane_y)
        fz = _zy_inv_ct2_call(sr, si, wy, (A_g, B_g), n2, prec)
    fx = _zy_inv_ct2_call(gr, gi, wy, (A_p, B_p), n2, prec,
                          plane=plane_x)
    return fx, fy, fz



def _poisson_tables(poisson_k2, N0, N1, Zm):
    """shared 1/k^2 machinery of the ct2 inverse entry points: the
    DC-zeroed inverse filter for the (N0, N1) Nyquist plane and the
    storage-permuted 1-d tables folded into the x kernel."""
    k2p = (np.asarray(poisson_k2[0], np.float32)[:, None]
           + np.asarray(poisson_k2[1], np.float32)[None, :]
           + np.float32(poisson_k2[2][Zm]))
    invk2p = jnp.asarray(np.where(k2p > 0, 1.0 / np.where(
        k2p > 0, k2p, 1.0), 0.0))
    k2z = np.asarray(poisson_k2[2][:Zm], np.float32)
    if _use_zct_fwd(2 * Zm, Zm):
        k2z = _zct_table(2 * Zm, k2z).astype(np.float32)
    k2m = (_ct_table(N0, poisson_k2[0]).astype(np.float32),
           _ct_table(N1, poisson_k2[1]).astype(np.float32),
           k2z)
    return invk2p, k2m


@functools.partial(jax.jit, static_argnames=('n2', 'precision',
                                             'poisson_k2'))
def fft3_poisson_half_ct2(r, i, nqr, nqi, n2, poisson_k2,
                          precision=None):
    """split-Nyquist CT Poisson potential: phi = -IFFT(spec / k^2)
    (the tf.poisson sign) with the DC mode zeroed — ONE x-pass
    (1/k^2 folded in-VMEM from the 1-d tables) + ONE zy-inverse, vs
    the force triple's dual x-pass + three.  Feeds the
    derivative-window ('gradient') force family, the reference's QPM
    route (nbody/qpm.py:82-109, transfer.py Laplace/SuperLanzcos).
    The -1 folds into the irfft matrices and the Nyquist plane."""
    N0, N1, Zm = r.shape
    prec = _resolve_prec(precision)
    wy = _ct_inv_mats_np(N1)
    wx = _ct_inv_mats_np(N0)
    A_p, B_p = _z_inv_tabs(n2, Zm, negate=True)
    invk2p, k2m = _poisson_tables(poisson_k2, N0, N1, Zm)
    # Nyquist-plane potential contribution: filtered plane, 2-d
    # inverse, real part; added onto the main block with (-1)^n
    plane = -_plane_fft2(nqr * invk2p, nqi * invk2p, N0, N1, +1,
                         prec)[0]
    sdt = r.dtype if r.dtype.itemsize < 4 else jnp.float32
    sr, si = _xct_call_multi(r, i, wx, 1.0, prec, inverse=True,
                             k2=k2m, out_dtype=sdt)
    return _zy_inv_ct2_call(sr, si, wy, (A_p, B_p), n2, prec,
                            plane=plane)


@functools.partial(jax.jit, static_argnames=(
    'procmesh', 'n2', 'precision', 'poisson_k2'))
def fft3_poisson_half_ct2_sharded(procmesh, r, i, nqr, nqi, n2,
                                  poisson_k2, precision=None):
    """pencil-sharded Poisson potential (see the local variant):
    x-pass with folded 1/k^2 local on the transposed layout, one
    all_to_all back, one zy-inverse per slab.  phi returns
    P(ax, None, None)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    N0, N1, Zm = r.shape
    ax = procmesh.axis
    prec = _resolve_prec(precision)
    wy = _ct_inv_mats_np(N1)
    wx = _ct_inv_mats_np(N0)
    A_p, B_p = _z_inv_tabs(n2, Zm, negate=True)
    invk2p, k2m = _poisson_tables(poisson_k2, N0, N1, Zm)
    plane = -_plane_fft2(nqr * invk2p, nqi * invk2p, N0, N1, +1,
                         prec)[0]
    sdt = r.dtype if r.dtype.itemsize < 4 else jnp.float32

    def local(rl, il, pll, k2y_l):
        sr, si = _xct_call_multi(rl, il, wx, 1.0, prec, inverse=True,
                                 k2=(k2m[0], k2y_l, k2m[2]),
                                 out_dtype=sdt)
        sr = jax.lax.all_to_all(sr, ax, split_axis=0, concat_axis=1,
                                tiled=True)
        si = jax.lax.all_to_all(si, ax, split_axis=0, concat_axis=1,
                                tiled=True)
        return _zy_inv_ct2_call(sr, si, wy, (A_p, B_p), n2, prec,
                                plane=pll)

    fn = shard_map(local, mesh=procmesh.mesh,
                   in_specs=(P(None, ax, None), P(None, ax, None),
                             P(ax, None), P(ax)),
                   out_specs=P(ax, None, None),
                   check_vma=False)
    return fn(r, i, plane, jnp.asarray(k2m[1]))


# --- sharded split-Nyquist CT pipeline -----------------------------------

@functools.partial(jax.jit,
                   static_argnames=('procmesh', 'norm', 'precision',
                                    'spectrum_dtype'))
def fft3_real_forward_half_ct2_sharded(procmesh, x, norm=True,
                                       precision=None,
                                       spectrum_dtype=None):
    """pencil-sharded ct2 forward: pass 1 (z half + CT-y) local per
    slab, one all_to_all transpose (splitting the PERMUTED y axis),
    CT x-pass local on the transposed layout.  The tiny Nyquist plane
    is all_gathered and transformed replicated (1/Zm of the volume).

    x: (N0, N1, N2) sharded P(ax, None, None).  Returns (r, i) of
    (N0, N1, Zm) chunk-permuted, sharded P(None, ax, None), and
    (nqr, nqi) of (N0, N1), replicated.

    spectrum_dtype=jnp.bfloat16 stores the inter-pass spectra (and
    therefore the all_to_all payload riding ICI) in bf16 — half the
    transpose bytes; matmuls stay f32-accumulated.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    N0, N1, N2 = x.shape
    Zm = N2 // 2
    D = procmesh.size
    ax = procmesh.axis
    if _ct_factor(N0)[0] == 1 or _ct_factor(N1)[0] == 1 or N2 % 2 \
            or N0 % D or N1 % D:
        raise ValueError(
            "ct2_sharded needs N0/N1 = R*128k, even N2, and N0/N1 "
            "divisible by the device count (got %s on %d)"
            % ((N0, N1, N2), D))
    wz = _z_fwd_tabs(N2, Zm)
    wy = _ct_fwd_mats_np(N1)
    wx = _ct_fwd_mats_np(N0)
    prec = _resolve_prec(precision)
    scale = 1.0 / (N0 * N1 * N2) if norm else 1.0
    sdt = spectrum_dtype or jnp.float32

    def local(xl):
        pr, pi, nq = _zy_fwd_ct2_call(xl, N2, Zm, wz, wy, prec,
                                      out_dtype=sdt)
        # the a2a ships the spectra as stored — bf16 halves the ICI
        # payload of the pencil transpose
        pr = jax.lax.all_to_all(pr, ax, split_axis=1, concat_axis=0,
                                tiled=True)
        pi = jax.lax.all_to_all(pi, ax, split_axis=1, concat_axis=0,
                                tiled=True)
        rr, ii = _xct_call(pr, pi, wx, scale, prec, out_dtype=sdt)
        nq_full = jax.lax.all_gather(nq, ax, tiled=True)
        return rr, ii, nq_full

    fn = shard_map(local, mesh=procmesh.mesh,
                   in_specs=P(ax, None, None),
                   out_specs=(P(None, ax, None), P(None, ax, None),
                              P()),
                   check_vma=False)
    rr, ii, nq = fn(x)
    nqr, nqi = _plane_fft2(nq, None, N0, N1, -1, prec,
                           jnp.float32(scale))
    return rr, ii, nqr, nqi


@functools.partial(jax.jit, static_argnames=(
    'procmesh', 'n2', 'kvecs', 'precision', 'poisson_k2', 'only'))
def fft3_real_inverse_grad3_half_ct2_sharded(procmesh, r, i, nqr,
                                             nqi, n2, kvecs,
                                             precision=None,
                                             poisson_k2=None,
                                             only=None):
    """pencil-sharded ct2 spectral force triple: CT x-inverses local
    on the transposed layout (the plain and kx-folded passes share
    one input read — the dual kernel), a2a back, ct2 zy-inverse local
    per slab with the Nyquist planes sliced per slab.  Force meshes
    return P(ax, None, None).

    poisson_k2: as in :func:`fft3_real_inverse_grad3_half_ct2` —
    folds 1/k^2 into the x kernel (the y table rides sharded through
    shard_map so each device filters its own permuted-y chunk)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    N0, N1, Zm = r.shape
    D = procmesh.size
    ax = procmesh.axis
    for d, n in ((0, N0), (1, N1)):
        if n % 2 == 0 and abs(kvecs[d][n // 2]) > 1e-12:
            raise ValueError(
                "kvecs[%d] must vanish at the Nyquist index for the "
                "half-spectrum gradient" % d)
    prec = _resolve_prec(precision)
    wy = _ct_inv_mats_np(N1)
    wx = _ct_inv_mats_np(N0)
    wx_g = _ct_inv_mats_np(N0, fold_kvec=kvecs[0])
    wy_g = _ct_inv_mats_np(N1, fold_kvec=kvecs[1])
    A_p, B_p = _z_inv_tabs(n2, Zm)
    A_g, B_g = _z_inv_tabs(n2, Zm, grad_kvec=kvecs[2])

    kx = np.asarray(kvecs[0], np.float32)
    ky = np.asarray(kvecs[1], np.float32)
    k2m = None
    if poisson_k2 is not None:
        invk2p, k2m = _poisson_tables(poisson_k2, N0, N1, Zm)
        nqr = nqr * invk2p
        nqi = nqi * invk2p
    zero_pl = jnp.zeros((N0, N1), jnp.float32)
    plane_x = plane_y = zero_pl
    if only in (None, 0):
        plane_x = _plane_fft2(-nqi * kx[:, None], nqr * kx[:, None],
                              N0, N1, +1, prec)[0]
    if only in (None, 1):
        plane_y = _plane_fft2(-nqi * ky[None, :], nqr * ky[None, :],
                              N0, N1, +1, prec)[0]
    dual = bool(TUNE.get('xct_dual', True))

    def a2a_back(a):
        return jax.lax.all_to_all(a, ax, split_axis=0, concat_axis=1,
                                  tiled=True)

    # bf16 (r, i) input => bf16 x-pass outputs, so the a2a back to
    # slab layout also ships half the bytes (storage only — the
    # zy-inverse upcasts at its refs; force meshes come out f32)
    sdt = r.dtype if r.dtype.itemsize < 4 else jnp.float32

    def local_only(rl, il, plx, ply, k2y_l):
        # single-direction inverse (the custom-VJP backward path):
        # one x-pass + one a2a + one zy-inverse
        k2l = None if k2m is None else (k2m[0], k2y_l, k2m[2])
        wxs = wx_g if only == 0 else wx
        sr, si = _xct_call_multi(rl, il, wxs, 1.0, prec,
                                 inverse=True, k2=k2l, out_dtype=sdt)
        sr, si = a2a_back(sr), a2a_back(si)
        if only == 0:
            return _zy_inv_ct2_call(sr, si, wy, (A_p, B_p), n2, prec,
                                    plane=plx)
        if only == 1:
            return _zy_inv_ct2_call(sr, si, wy_g, (A_p, B_p), n2,
                                    prec, plane=ply)
        return _zy_inv_ct2_call(sr, si, wy, (A_g, B_g), n2, prec)

    def local(rl, il, plx, ply, k2y_l):
        k2l = None if k2m is None else (k2m[0], k2y_l, k2m[2])
        if dual:
            sr, si, gr, gi = _xct_call_multi(rl, il, wx, 1.0, prec,
                                             inverse=True, wx2=wx_g,
                                             k2=k2l, out_dtype=sdt)
        else:
            sr, si = _xct_call_multi(rl, il, wx, 1.0, prec,
                                     inverse=True, k2=k2l,
                                     out_dtype=sdt)
            gr, gi = _xct_call_multi(rl, il, wx_g, 1.0, prec,
                                     inverse=True, k2=k2l,
                                     out_dtype=sdt)
        sr, si = a2a_back(sr), a2a_back(si)
        if TUNE.get('zy_dual', True):
            fy, fz = _zy_inv_ct2_call_dual(sr, si, wy_g, (A_p, B_p),
                                           wy, (A_g, B_g), n2, prec,
                                           planeA=ply)
        else:
            fy = _zy_inv_ct2_call(sr, si, wy_g, (A_p, B_p), n2, prec,
                                  plane=ply)
            fz = _zy_inv_ct2_call(sr, si, wy, (A_g, B_g), n2, prec)
        gr, gi = a2a_back(gr), a2a_back(gi)
        fx = _zy_inv_ct2_call(gr, gi, wy, (A_p, B_p), n2, prec,
                              plane=plx)
        return fx, fy, fz

    k2y_arr = (jnp.zeros((N1,), jnp.float32) if k2m is None
               else jnp.asarray(k2m[1]))
    fn = shard_map(local_only if only is not None else local,
                   mesh=procmesh.mesh,
                   in_specs=(P(None, ax, None), P(None, ax, None),
                             P(ax, None), P(ax, None), P(ax)),
                   out_specs=(P(ax, None, None)
                              if only is not None
                              else (P(ax, None, None),) * 3),
                   check_vma=False)
    return fn(r, i, plane_x, plane_y, k2y_arr)


# --- sharded (pencil) hermitian-half transforms --------------------------
#
# The multi-chip execution of the pfft role (reference pm.py:1406-1441):
# slab-sharded real input, per-slab z+y pass (pass 1 is local by
# construction), ONE all_to_all transpose over ICI, then the x-axis
# matmul pass local on the transposed (y-sharded) layout — exactly the
# reference's PFFT_TRANSPOSED_OUT trick, with the MXU x-pass doubling
# as the pencil stage.  The inverse undoes the transpose.

def _zy_fwd_half_call(x, N2, Zh, wzr, wzi, wyr, wyi, prec):
    """pass 1 on an (n0, N1, N2) block -> half-spectrum (r, i)."""
    n0, N1, _ = x.shape
    BX = _pick_bx(n0, N1, Zh, tag='zyf')
    return pl.pallas_call(
        _zy_forward_real_h(BX, N1, N2, Zh, prec),
        grid=(n0 // BX,),
        in_specs=[_xplane_spec(N1, N2, BX),
                  _full_spec((N2, Zh)), _full_spec((N2, Zh)),
                  _full_spec((N1, N1)), _full_spec((N1, N1))],
        out_specs=(_xplane_spec(N1, Zh, BX), _xplane_spec(N1, Zh, BX)),
        out_shape=(jax.ShapeDtypeStruct((n0, N1, Zh), jnp.float32),
                   jax.ShapeDtypeStruct((n0, N1, Zh), jnp.float32)),
        compiler_params=_params(),
        interpret=_interpret(),
    )(x.astype(jnp.float32), wzr, wzi, wyr, wyi)


def _xpass_half_call(pr, pi, wxr, wxi, scale, prec):
    """x-axis DFT matmul on an (N0, n1, Zh) block."""
    N0, n1, Zh = pr.shape
    BY = 8 if n1 % 8 == 0 else n1
    return pl.pallas_call(
        _x_transform(N0, BY, Zh, np.float32(scale), prec),
        grid=(n1 // BY, 1),
        in_specs=[_yzblock_spec(N0, BY, Zh), _yzblock_spec(N0, BY, Zh),
                  _full_spec2((N0, N0)), _full_spec2((N0, N0))],
        out_specs=(_yzblock_spec(N0, BY, Zh),
                   _yzblock_spec(N0, BY, Zh)),
        out_shape=(jax.ShapeDtypeStruct((N0, n1, Zh), jnp.float32),
                   jax.ShapeDtypeStruct((N0, n1, Zh), jnp.float32)),
        compiler_params=_params(),
        interpret=_interpret(),
    )(pr, pi, wxr, wxi)


def _zy_inv_half_call(rr, ii, wy, AB, n2, prec):
    """inverse y transform + irfft-as-matmul z on (n0, N1, Zh)."""
    n0, N1, Zh = rr.shape
    BX = _pick_bx(n0, N1, Zh, tag='zyi')
    return pl.pallas_call(
        _zy_inverse_to_real_h(BX, N1, n2, Zh, prec),
        grid=(n0 // BX,),
        in_specs=[_xplane_spec(N1, Zh, BX), _xplane_spec(N1, Zh, BX),
                  _full_spec((N1, N1)), _full_spec((N1, N1)),
                  _full_spec((Zh, n2)), _full_spec((Zh, n2))],
        out_specs=_xplane_spec(N1, n2, BX),
        out_shape=jax.ShapeDtypeStruct((n0, N1, n2), jnp.float32),
        compiler_params=_params(),
        interpret=_interpret(),
    )(rr, ii, jnp.asarray(wy[0]), jnp.asarray(wy[1]),
      jnp.asarray(AB[0]), jnp.asarray(AB[1]))


@functools.partial(jax.jit,
                   static_argnames=('procmesh', 'norm', 'precision'))
def fft3_real_forward_half_sharded(procmesh, x, norm=True,
                                   precision=None):
    """hermitian-half forward FFT of a slab-sharded real array.

    x is (N0, N1, N2) sharded P(ax, None, None); returns (r, i) of
    shape (N0, N1, Zh) in the TRANSPOSED layout P(None, ax, None).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    N0, N1, N2 = x.shape
    Zh = N2 // 2 + 1
    D = procmesh.size
    ax = procmesh.axis
    if N0 % D or N1 % D:
        raise ValueError(
            "the sharded MXU FFT needs Nmesh[0] and Nmesh[1] "
            "divisible by the device count (%d; got %d, %d)"
            % (D, N0, N1))
    wzr, wzi = (jnp.asarray(a) for a in _dft_half_np(N2, Zh))
    wyr, wyi = _dft(N1, -1)
    wxr, wxi = _dft(N0, -1)
    prec = _resolve_prec(precision)
    scale = 1.0 / (N0 * N1 * N2) if norm else 1.0

    def local(xl):
        pr, pi = _zy_fwd_half_call(xl, N2, Zh, wzr, wzi, wyr, wyi,
                                   prec)
        # pencil transpose: scatter y, gather x — one fused ICI
        # all_to_all (the pfft transpose, reference pm.py:1409-1411)
        pr = jax.lax.all_to_all(pr, ax, split_axis=1, concat_axis=0,
                                tiled=True)
        pi = jax.lax.all_to_all(pi, ax, split_axis=1, concat_axis=0,
                                tiled=True)
        return _xpass_half_call(pr, pi, wxr, wxi, scale, prec)

    fn = shard_map(local, mesh=procmesh.mesh,
                   in_specs=P(ax, None, None),
                   out_specs=(P(None, ax, None), P(None, ax, None)),
                   check_vma=False)
    return fn(x)


@functools.partial(jax.jit, static_argnames=(
    'procmesh', 'n2', 'kvecs', 'precision'))
def fft3_real_inverse_grad3_half_sharded(procmesh, r, i, n2, kvecs,
                                         precision=None):
    """sharded spectral force triple: the inverse of
    :func:`fft3_real_forward_half_sharded` with the i*k_d gradient
    folded in (see fft3_real_inverse_grad3_half for the math and the
    Nyquist requirement on kvecs).

    (r, i) are (N0, N1, Zh) in the transposed layout P(None, ax,
    None); the three force meshes return slab-sharded P(ax, None,
    None).  The y/z gradients share one x-pass and one transpose, so
    the triple costs two all_to_alls.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    N0, N1, Zh = r.shape
    D = procmesh.size
    ax = procmesh.axis
    for d, n in ((0, N0), (1, N1)):
        if n % 2 == 0 and abs(kvecs[d][n // 2]) > 1e-12:
            raise ValueError(
                "kvecs[%d] must vanish at the Nyquist index for the "
                "half-spectrum gradient" % d)
    prec = _resolve_prec(precision)
    wy = _dft_np(N1, +1)
    wx = _dft_np(N0, +1)
    wx_g = _fold_i_freq(*wx, kvecs[0], 'right')
    wy_g = _fold_i_freq(*wy, kvecs[1], 'right')
    A_p, B_p = _irfft_mats_np(n2, Zh)
    A_g, B_g = _irfft_mats_np(n2, Zh, grad_kvec=kvecs[2])

    def a2a_back(a):
        return jax.lax.all_to_all(a, ax, split_axis=0, concat_axis=1,
                                  tiled=True)

    def local(rl, il):
        # shared plain x-pass for the y and z gradient components
        sr, si = _xpass_half_call(rl, il, jnp.asarray(wx[0]),
                                  jnp.asarray(wx[1]), 1.0, prec)
        sr, si = a2a_back(sr), a2a_back(si)
        fy = _zy_inv_half_call(sr, si, wy_g, (A_p, B_p), n2, prec)
        fz = _zy_inv_half_call(sr, si, wy, (A_g, B_g), n2, prec)
        # the x component needs its own folded x-pass
        gr, gi = _xpass_half_call(rl, il, jnp.asarray(wx_g[0]),
                                  jnp.asarray(wx_g[1]), 1.0, prec)
        gr, gi = a2a_back(gr), a2a_back(gi)
        fx = _zy_inv_half_call(gr, gi, wy, (A_p, B_p), n2, prec)
        return fx, fy, fz

    fn = shard_map(local, mesh=procmesh.mesh,
                   in_specs=(P(None, ax, None), P(None, ax, None)),
                   out_specs=(P(ax, None, None),) * 3,
                   check_vma=False)
    return fn(r, i)


def kvectors(shape, BoxSize):
    """full-spectrum (not hermitian-compressed) wavenumber vectors in
    box units, broadcastable against the (r, i) spectrum arrays."""
    ks = []
    for d, n in enumerate(shape):
        k1 = np.fft.fftfreq(n, d=BoxSize[d] / n) * 2 * np.pi
        sh = [1] * len(shape)
        sh[d] = n
        ks.append(jnp.asarray(k1.astype(np.float32)).reshape(sh))
    return tuple(ks)
