"""MXU DFT-matmul FFT (ops/fft_mxu.py) vs numpy/XLA references.
Runs in pallas interpret mode on CPU."""
import numpy as np
from numpy.testing import assert_allclose
import jax
import jax.numpy as jnp

from pmesh_tpu.ops import fft_mxu
from pmesh_tpu.ops import fft_mxu_ref


def test_forward_matches_numpy():
    x = np.random.RandomState(0).normal(size=(8, 16, 128)).astype('f4')
    r, i = fft_mxu_ref.fft3_real_forward(jnp.asarray(x))
    truth = np.fft.fftn(x) / x.size
    err = np.abs(np.asarray(r) + 1j * np.asarray(i) - truth).max()
    assert err / np.abs(truth).max() < 1e-5


def test_roundtrip():
    x = np.random.RandomState(1).normal(size=(16, 8, 128)).astype('f4')
    r, i = fft_mxu_ref.fft3_real_forward(jnp.asarray(x))
    back = fft_mxu_ref.fft3_real_inverse(r, i)
    np.testing.assert_allclose(np.asarray(back), x, atol=2e-5)


def test_grad_inverse():
    """inverse with the folded i*k_d kernel == ifft(i k_d * spec)."""
    x = np.random.RandomState(2).normal(size=(8, 8, 128)).astype('f4')
    r, i = fft_mxu_ref.fft3_real_forward(jnp.asarray(x))
    spec = np.fft.fftn(x) / x.size
    for d, n in [(0, 8), (1, 8), (2, 128)]:
        kd = (np.fft.fftfreq(n) * 2 * np.pi).astype('f4')
        out = fft_mxu_ref.fft3_real_inverse(r, i, grad=d,
                                        kvec=tuple(kd.tolist()))
        sh = [1, 1, 1]
        sh[d] = n
        truth = np.fft.ifftn(1j * kd.reshape(sh) * spec).real * x.size
        scale = np.abs(truth).max() + 1e-30
        assert np.abs(np.asarray(out) - truth).max() / scale < 1e-5


def test_force_lattice_mxu_matches_xla():
    from pmesh_tpu import ParticleMesh
    from pmesh_tpu.models.fastpm import Solver
    n = 16
    pm = ParticleMesh(Nmesh=[n] * 3, BoxSize=float(n), dtype='f4',
                      resampler='cic')
    solver = Solver(pm)
    rng = np.random.RandomState(3)
    disp = tuple(jnp.asarray(rng.uniform(-0.4, 0.6, (n, n, n)),
                             jnp.float32) for _ in range(3))
    Fx = solver.force_lattice(disp, bounds=(-0.5, 0.7), fft='xla')
    Fm = solver.force_lattice(disp, bounds=(-0.5, 0.7), fft='mxu')
    for d in range(3):
        a, b = np.asarray(Fx[d]), np.asarray(Fm[d])
        assert np.abs(a - b).max() < 1e-6 * max(1.0, np.abs(a).max())


def test_grad3_matches_separate():
    x = np.random.RandomState(4).normal(size=(8, 8, 128)).astype('f4')
    r, i = fft_mxu_ref.fft3_real_forward(jnp.asarray(x))
    kvecs = tuple(tuple((np.fft.fftfreq(n) * 2 * np.pi)
                        .astype('f4').tolist())
                  for n in (8, 8, 128))
    fx, fy, fz = fft_mxu_ref.fft3_real_inverse_grad3(r, i, kvecs=kvecs)
    for d, got in enumerate((fx, fy, fz)):
        one = fft_mxu_ref.fft3_real_inverse(r, i, grad=d, kvec=kvecs[d])
        np.testing.assert_allclose(np.asarray(got), np.asarray(one),
                                   atol=1e-6)


def test_force_lattice_mxu_bf16_accuracy():
    """bf16-matmul FFT force stays within ~1e-3 relative rms of the
    f32 pipeline (state/paint/readout remain f32)."""
    from pmesh_tpu import ParticleMesh
    from pmesh_tpu.models.fastpm import Solver
    n = 32
    pm = ParticleMesh(Nmesh=[n] * 3, BoxSize=float(n), dtype='f4',
                      resampler='cic')
    solver = Solver(pm)
    rng = np.random.RandomState(5)
    disp = tuple(jnp.asarray(rng.uniform(0, 1.5, (n, n, n)),
                             jnp.float32) for _ in range(3))
    Ff = solver.force_lattice(disp, bounds=(0.0, 1.5), fft='mxu')
    Fb = solver.force_lattice(disp, bounds=(0.0, 1.5), fft='mxu_bf16')
    for d in range(3):
        a, b = np.asarray(Ff[d]).ravel(), np.asarray(Fb[d]).ravel()
        rms = np.sqrt(np.mean(a ** 2)) + 1e-30
        assert np.sqrt(np.mean((a - b) ** 2)) / rms < 2e-3


def test_ct_forward_matches_rfftn():
    """Cooley-Tukey factored forward: unpermuting the chunk order
    recovers numpy's rfftn (f32-exact, ~1e-9)."""
    from pmesh_tpu.ops import fft_mxu as fm
    N = 256
    assert fm._ct_factor(N) == (2, 128)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(N, N, N)).astype('f4'))
    r, i = fft_mxu_ref.fft3_real_forward_half_ct(x)
    p = fm._ct_permute(N)
    ref = np.fft.rfftn(np.asarray(x)) / N ** 3
    assert_allclose(np.asarray(r)[p][:, p], ref.real, atol=2e-6)
    assert_allclose(np.asarray(i)[p][:, p], ref.imag, atol=2e-6)


def test_ct2_split_nyquist_matches_dense():
    """split-Nyquist CT pipeline: forward slices match rfftn and the
    folded-gradient triple matches the dense half variant."""
    from pmesh_tpu.ops import fft_mxu as fm
    N = 256
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.normal(size=(N, N, N)).astype('f4'))
    r, i, nqr, nqi = fm.fft3_real_forward_half_ct2(x)
    p = fm._ct_permute(N)
    pz = fm._zct_perm(N)   # z is chunk-permuted too (z-CT forward)
    ref = np.fft.rfftn(np.asarray(x)) / N ** 3
    assert_allclose(np.asarray(r)[p][:, p][..., pz],
                    ref.real[..., :N // 2], atol=2e-6)
    assert_allclose(np.asarray(nqr), ref.real[..., N // 2], atol=2e-6)
    assert_allclose(np.asarray(nqi), ref.imag[..., N // 2], atol=2e-6)

    w = np.fft.fftfreq(N) * 2 * np.pi
    k1 = tuple(((8 * np.sin(w) - np.sin(2 * w)) / 6.0).tolist())
    wz = np.fft.rfftfreq(N) * 2 * np.pi
    kz = tuple(((8 * np.sin(wz) - np.sin(2 * wz)) / 6.0).tolist())
    kd = (k1, k1, kz)
    rd, idn = fm.fft3_real_forward_half(x)
    fd = fm.fft3_real_inverse_grad3_half(rd, idn, n2=N, kvecs=kd)
    fc = fm.fft3_real_inverse_grad3_half_ct2(r, i, nqr, nqi, n2=N,
                                             kvecs=kd)
    for a, b in zip(fc, fd):
        scale = float(jnp.max(jnp.abs(b)))
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-5


def test_ct_force_lattice_end_to_end():
    """force_lattice(fft='mxu') at a CT-able size equals fft='xla'."""
    from pmesh_tpu import ParticleMesh
    from pmesh_tpu.models.fastpm import Solver
    N = 256
    pm = ParticleMesh(Nmesh=[N] * 3, BoxSize=float(N), dtype='f4')
    solver = Solver(pm)
    rng = np.random.RandomState(3)
    disp = tuple(jnp.asarray(rng.uniform(0, 1, (N, N, N)).astype('f4'))
                 for _ in range(3))
    Fm = solver.force_lattice(disp, bounds=(0., 1.), fft='mxu')
    Fx = solver.force_lattice(disp, bounds=(0., 1.), fft='xla')
    for a, b in zip(Fm, Fx):
        scale = float(jnp.max(jnp.abs(b)))
        assert float(jnp.max(jnp.abs(a - b))) / scale < 2e-5


def test_ct2_bf16_storage_matches_f32():
    """bf16 spectrum STORAGE between ct2 passes (out_dtype=bf16 +
    bf16-input upcasts inside the kernels; every matmul still runs
    f32) tracks the all-f32 chain to bf16 rounding.  This is the
    memory/ICI-traffic mode of the 1024^3 single-chip anchor
    (tools/measure_1024.py)."""
    from pmesh_tpu.ops import fft_mxu as fm
    N = 256
    n0 = 8
    Zm = N // 2
    bf16 = jnp.bfloat16
    rng = np.random.RandomState(11)
    slab = jnp.asarray(rng.normal(size=(n0, N, N)).astype('f4'))

    wz = fm._dft_half_np(N, Zm)
    wy = fm._ct_fwd_mats_np(N)
    wyi = fm._ct_inv_mats_np(N)
    AB = fm._irfft_mats_np(N, Zm, nyquist_last=False)

    # pass 1: f32 compute, bf16 store (input stays f32 here)
    pr, pi, nq = fm._zy_fwd_ct2_call(slab, N, Zm, wz, wy, None,
                                     out_dtype=bf16)
    r32, i32, nq32 = fm._zy_fwd_ct2_call(slab, N, Zm, wz, wy, None)
    assert pr.dtype == bf16 and pi.dtype == bf16
    assert nq.dtype == jnp.float32  # tiny plane stays f32
    sc = float(jnp.max(jnp.abs(r32))) + 1e-30
    assert float(jnp.max(jnp.abs(pr.astype(jnp.float32) - r32))) / sc \
        < 2e-2
    assert_allclose(np.asarray(nq), np.asarray(nq32), atol=1e-5)

    # x pass: bf16 in / bf16 out, dual weights + folded 1/k^2
    spec_r = jnp.asarray(rng.normal(size=(N, n0, Zm)).astype('f4'))
    spec_i = jnp.asarray(rng.normal(size=(N, n0, Zm)).astype('f4'))
    wx = fm._ct_inv_mats_np(N)
    wxg = fm._ct_inv_mats_np(N, fold_kvec=tuple(
        np.sin(np.arange(N) / N).tolist()))
    k2t = (np.arange(N, dtype=np.float32) + 1.0,
           np.arange(n0, dtype=np.float32) + 1.0,
           np.arange(Zm, dtype=np.float32) + 1.0)
    f32_out = fm._xct_call_multi(spec_r, spec_i, wx, 1.0, None,
                                 inverse=True, wx2=wxg, k2=k2t)
    b16_out = fm._xct_call_multi(spec_r.astype(bf16),
                                 spec_i.astype(bf16), wx, 1.0, None,
                                 inverse=True, wx2=wxg, k2=k2t,
                                 out_dtype=bf16)
    for a, b in zip(b16_out, f32_out):
        assert a.dtype == bf16
        sc = float(jnp.max(jnp.abs(b))) + 1e-30
        assert float(jnp.max(jnp.abs(a.astype(jnp.float32) - b))) \
            / sc < 2e-2

    # inverse zy pass: bf16 in, f32 out (the real mesh)
    half_r = jnp.asarray(rng.normal(size=(n0, N, Zm)).astype('f4'))
    half_i = jnp.asarray(rng.normal(size=(n0, N, Zm)).astype('f4'))
    m32 = fm._zy_inv_ct2_call(half_r, half_i, wyi, AB, N, None)
    m16 = fm._zy_inv_ct2_call(half_r.astype(bf16),
                              half_i.astype(bf16), wyi, AB, N, None)
    assert m16.dtype == jnp.float32
    sc = float(jnp.max(jnp.abs(m32))) + 1e-30
    assert float(jnp.max(jnp.abs(m16 - m32))) / sc < 2e-2
