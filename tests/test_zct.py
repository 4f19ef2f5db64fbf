"""z-axis Cooley-Tukey factoring of the ct2 MXU FFT (fft_mxu._zct_*).

The dense z transform was the single largest MXU term of the per-chip
force chain (tools/roofline.py: ~33 ms of the 60 ms (128, 1024, 1024)
pipe at f32-exact precision); the z-CT keeps z lane-resident (no
transposes) and stores z chunk-permuted like the x/y axes.  These
tests pin the permutation contract and f32-level exactness of every
kernel path against numpy (reference numerics role:
/root/reference/pmesh/tests/test_pm.py r2c/c2r round trips).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pmesh_tpu.ops import fft_mxu as fm


def test_zct_gates_and_factors():
    assert fm._zct_factor(1024) == (8, 128, 64)
    assert fm._zct_factor(512) == (4, 128, 64)
    assert fm._zct_factor(256) == (2, 128, 64)
    assert fm._zct_factor(192)[0] == 1
    assert fm._use_zct_fwd(1024, 512) and fm._use_zct_inv(1024, 512)
    assert fm._use_zct_fwd(512, 256)
    assert not fm._use_zct_inv(512, 256)
    # gate consistency: inverse CT only ever on top of a CT forward
    for n2 in (256, 512, 1024, 2048):
        if fm._use_zct_inv(n2, n2 // 2):
            assert fm._use_zct_fwd(n2, n2 // 2)


def test_zct_perm_is_bijection():
    for n2 in (256, 512, 1024):
        p = fm._zct_perm(n2)
        assert sorted(p.tolist()) == list(range(n2 // 2))
        # stored slot of mode k recovers the mode: chunk pairing of
        # _zct_order keeps {j, j+Rz/2} adjacent
        t = np.arange(n2 // 2)
        st = fm._zct_table(n2, t)
        assert (st[p] == t).all()


@pytest.mark.parametrize('n2', [512, 1024])
def test_zct_forward_matches_rfft(n2):
    """private zy-fwd with zct tables == numpy rfft after unpermute
    (f32-exact)."""
    N1, n0 = 256, 8
    Zm = n2 // 2
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.normal(size=(n0, N1, n2)).astype('f4'))
    wz = fm._z_fwd_tabs(n2, Zm)
    assert len(np.shape(wz[0])) == 3
    wy = fm._ct_fwd_mats_np(N1)
    pr, pi, nq = fm._zy_fwd_ct2_call(x, n2, Zm, wz, wy, None)
    py = fm._ct_permute(N1)
    pz = fm._zct_perm(n2)
    ref = np.fft.fft(np.fft.rfft(np.asarray(x), axis=2), axis=1)
    s = np.abs(ref).max()
    assert np.abs(np.asarray(pr)[:, py][:, :, pz]
                  - ref.real[..., :Zm]).max() / s < 3e-6
    assert np.abs(np.asarray(pi)[:, py][:, :, pz]
                  - ref.imag[..., :Zm]).max() / s < 3e-6
    assert np.abs(np.asarray(nq)
                  - np.fft.rfft(np.asarray(x),
                                axis=2).real[..., Zm]).max() < 2e-3


@pytest.mark.parametrize('n2', [512, 1024])
def test_zct_inverse_roundtrip(n2):
    """fwd + plain/gradient/negated inverse (incl. the dual kernel)
    against numpy irfft; n2=512 exercises the permuted-dense inverse
    fallback, n2=1024 the fused Rz=8 CT inverse."""
    N1, n0 = 256, 8
    Zm = n2 // 2
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.normal(size=(n0, N1, n2)).astype('f4'))
    wz = fm._z_fwd_tabs(n2, Zm)
    wy = fm._ct_fwd_mats_np(N1)
    pr, pi, _ = fm._zy_fwd_ct2_call(x, n2, Zm, wz, wy, None)
    wyi = fm._ct_inv_mats_np(N1)

    spec = np.fft.rfft(np.asarray(x), axis=2)
    spec[..., Zm] = 0.0   # split-Nyquist: plane handled separately
    want = np.fft.irfft(spec, n=n2, axis=2) * n2 * N1
    kdz = np.sin(2 * np.pi * np.fft.rfftfreq(n2))
    wantg = np.fft.irfft(spec * (1j * kdz), n=n2, axis=2) * n2 * N1

    AB = fm._z_inv_tabs(n2, Zm)
    ABg = fm._z_inv_tabs(n2, Zm, grad_kvec=kdz)
    ABn = fm._z_inv_tabs(n2, Zm, negate=True)
    if fm._use_zct_inv(n2, Zm):
        assert len(np.shape(AB[0])) == 3

    sw = np.abs(want).max()
    sg = np.abs(wantg).max()
    back = fm._zy_inv_ct2_call(pr, pi, wyi, AB, n2, None)
    assert np.abs(np.asarray(back) - want).max() / sw < 3e-6
    backg = fm._zy_inv_ct2_call(pr, pi, wyi, ABg, n2, None)
    assert np.abs(np.asarray(backg) - wantg).max() / sg < 3e-6
    backn = fm._zy_inv_ct2_call(pr, pi, wyi, ABn, n2, None)
    assert np.abs(np.asarray(backn) + want).max() / sw < 3e-6
    fa, fb = fm._zy_inv_ct2_call_dual(pr, pi, wyi, AB, wyi, ABg,
                                      n2, None)
    assert np.abs(np.asarray(fa) - want).max() / sw < 3e-6
    assert np.abs(np.asarray(fb) - wantg).max() / sg < 3e-6


def test_zct_public_force_matches_dense():
    """the public ct2 force triple with the z-CT gate ON equals the
    gate-OFF (dense z) result — the production config is bit-level
    compatible with the validated dense pipeline."""
    N = 256
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.normal(size=(N, N, N)).astype('f4'))
    w = np.fft.fftfreq(N) * 2 * np.pi
    k1 = tuple(((8 * np.sin(w) - np.sin(2 * w)) / 6.0).tolist())
    wzn = np.fft.rfftfreq(N) * 2 * np.pi
    kz = tuple(((8 * np.sin(wzn) - np.sin(2 * wzn)) / 6.0).tolist())
    kd = (k1, k1, kz)

    def run():
        # the public entries are module-level jits that read TUNE at
        # trace time — clear their caches so the gate flip retraces
        fm.fft3_real_forward_half_ct2.clear_cache()
        fm.fft3_real_inverse_grad3_half_ct2.clear_cache()
        r, i, nqr, nqi = fm.fft3_real_forward_half_ct2(x)
        return fm.fft3_real_inverse_grad3_half_ct2(
            r, i, nqr, nqi, n2=N, kvecs=kd)

    fm.TUNE['zct'] = False
    try:
        f_dense = run()
    finally:
        fm.TUNE.pop('zct', None)
    f_zct = run()
    for a, b in zip(f_zct, f_dense):
        s = float(jnp.max(jnp.abs(b))) + 1e-30
        assert float(jnp.max(jnp.abs(a - b))) / s < 2e-6
