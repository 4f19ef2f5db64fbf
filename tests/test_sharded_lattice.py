"""Sharded lattice fast path: pallas shift-sum kernels under
shard_map with ring halo exchange (ops/gridpm._shift_sharded +
parallel/halo.py) and the pencil MXU FFT
(ops/fft_mxu.*_sharded) on the virtual 8-device CPU mesh.

Contract: the sharded pallas/MXU code paths (interpret mode off-TPU)
must match the single-device answers to float tolerance — the analog
of the reference's same-answer-at-any-comm-size suite for its pfft
pencil plans (reference pm.py:1406-1441).
"""
import numpy as np
from numpy.testing import assert_allclose
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pmesh_tpu.parallel.pmesh import ProcessMesh
from pmesh_tpu.ops import gridpm as gp
from pmesh_tpu.ops import fft_mxu


@pytest.fixture(scope='module')
def pmesh8():
    assert len(jax.devices()) >= 8
    return ProcessMesh(jax.devices()[:8])


def _sharded(pmesh8, a):
    return jax.device_put(
        a, NamedSharding(pmesh8.mesh, P('x', *([None] * (a.ndim - 1)))))


@pytest.fixture(scope='module')
def fields(pmesh8):
    N = 16
    rng = np.random.RandomState(0)
    disp = tuple(jnp.asarray(rng.uniform(0, 1.0, (N, N, N)),
                             jnp.float32) for _ in range(3))
    mesh = jnp.asarray(rng.normal(size=(N, N, N)), jnp.float32)
    dsh = tuple(_sharded(pmesh8, d) for d in disp)
    msh = _sharded(pmesh8, mesh)
    return disp, mesh, dsh, msh


def test_halo_extend_roundtrip(pmesh8):
    """parallel/halo.extend_x fetches the right global planes,
    including multi-hop halos deeper than one slab."""
    from jax import shard_map
    from pmesh_tpu.parallel.halo import extend_x
    N = 16
    a = jnp.arange(N * 4 * 4, dtype=jnp.float32).reshape(N, 4, 4)
    ash = _sharded(pmesh8, a)
    for lo, hi in [(1, 2), (3, 3), (2, 5)]:
        fn = shard_map(
            lambda x: extend_x(x, lo, hi, 'x', 8)[None],
            mesh=pmesh8.mesh, in_specs=P('x', None, None),
            out_specs=P('x', None, None, None))
        ext = np.asarray(fn(ash))          # (8, lo+2+hi, 4, 4)
        rows = N // 8
        full = np.asarray(a)
        for b in range(8):
            want = np.stack([full[(b * rows - lo + j) % N]
                             for j in range(lo + rows + hi)])
            np.testing.assert_array_equal(ext[b], want)


@pytest.mark.parametrize("window,bounds", [
    ('cic', (0.0, 1.0)),
    ('tsc', (-0.5, 1.5)),
])
def test_sharded_pallas_paint_matches(pmesh8, fields, window, bounds):
    disp, mesh, dsh, msh = fields
    p1 = gp.paint_grid(disp, bounds=bounds, window=window,
                       impl='pallas')
    p8 = gp.paint_grid(dsh, bounds=bounds, window=window,
                       impl='pallas', procmesh=pmesh8)
    assert_allclose(np.asarray(p8), np.asarray(p1), atol=1e-6)
    assert p8.sharding.spec == P('x', None, None)


def test_sharded_pallas_readout_matches(pmesh8, fields):
    disp, mesh, dsh, msh = fields
    r1 = gp.readout_grid((mesh, 2 * mesh), disp, bounds=(0., 1.),
                         impl='pallas')
    r8 = gp.readout_grid((msh, 2 * msh), dsh, bounds=(0., 1.),
                         impl='pallas', procmesh=pmesh8)
    for a, b in zip(r8, r1):
        assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sharded_pallas_diffdir_and_grad(pmesh8, fields):
    disp, mesh, dsh, msh = fields
    r1 = gp.readout_grid(mesh, disp, bounds=(0., 1.), diffdir=1,
                         impl='pallas')
    r8 = gp.readout_grid(msh, dsh, bounds=(0., 1.), diffdir=1,
                         impl='pallas', procmesh=pmesh8)
    assert_allclose(np.asarray(r8), np.asarray(r1), atol=1e-6)

    def obj(d, pm):
        return jnp.sum(gp.paint_grid(d, bounds=(0., 1.),
                                     impl='pallas', procmesh=pm) ** 2)

    g1 = jax.grad(lambda d: obj(d, None))(disp)
    g8 = jax.grad(lambda d: obj(d, pmesh8))(dsh)
    for a, b in zip(g8, g1):
        assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_mxu_fft_matches(pmesh8, fields):
    disp, mesh, dsh, msh = fields
    r1, i1 = fft_mxu.fft3_real_forward_half(mesh)
    r8, i8 = fft_mxu.fft3_real_forward_half_sharded(pmesh8, msh)
    assert_allclose(np.asarray(r8), np.asarray(r1), atol=1e-5)
    assert_allclose(np.asarray(i8), np.asarray(i1), atol=1e-5)
    # transposed (pencil) output layout, like PFFT_TRANSPOSED_OUT
    assert r8.sharding.spec[:2] == (None, 'x')
    ref = np.fft.rfftn(np.asarray(mesh)) / 16 ** 3
    assert_allclose(np.asarray(r8), ref.real, atol=1e-5)
    assert_allclose(np.asarray(i8), ref.imag, atol=1e-5)

    N = 16
    w = np.fft.fftfreq(N) * 2 * np.pi
    k1 = tuple((((8 * np.sin(w) - np.sin(2 * w)) / 6.0)).tolist())
    wz = np.fft.rfftfreq(N) * 2 * np.pi
    kz = tuple(((8 * np.sin(wz) - np.sin(2 * wz)) / 6.0).tolist())
    kd = (k1, k1, kz)
    f1 = fft_mxu.fft3_real_inverse_grad3_half(r1, i1, n2=N, kvecs=kd)
    f8 = fft_mxu.fft3_real_inverse_grad3_half_sharded(
        pmesh8, r8, i8, n2=N, kvecs=kd)
    for a, b in zip(f8, f1):
        assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        assert a.sharding.spec[0] == 'x'


def test_sharded_force_lattice_mxu(pmesh8, fields):
    """the full multi-chip flagship pipeline: sharded pallas paint ->
    pencil MXU FFT -> folded-gradient inverses -> sharded pallas
    readout, vs the single-device pipeline."""
    from pmesh_tpu import ParticleMesh
    from pmesh_tpu.models.fastpm import Solver
    disp, mesh, dsh, msh = fields
    N = 16
    pm1 = ParticleMesh(Nmesh=[N] * 3, BoxSize=float(N), dtype='f4')
    pm8 = ParticleMesh(Nmesh=[N] * 3, BoxSize=float(N), dtype='f4',
                       procmesh=pmesh8)
    F1 = Solver(pm1).force_lattice(disp, bounds=(0., 1.), fft='mxu')
    F8 = Solver(pm8).force_lattice(dsh, bounds=(0., 1.), fft='mxu')
    for a, b in zip(F8, F1):
        assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_force_lattice_xla_default(pmesh8, fields):
    """the default (XLA rolls) lattice force on a device mesh."""
    from pmesh_tpu import ParticleMesh
    from pmesh_tpu.models.fastpm import Solver
    disp, mesh, dsh, msh = fields
    N = 16
    pm1 = ParticleMesh(Nmesh=[N] * 3, BoxSize=float(N), dtype='f4')
    pm8 = ParticleMesh(Nmesh=[N] * 3, BoxSize=float(N), dtype='f4',
                       procmesh=pmesh8)
    F1 = Solver(pm1).force_lattice(disp, bounds=(0., 1.))
    F8 = Solver(pm8).force_lattice(dsh, bounds=(0., 1.))
    for a, b in zip(F8, F1):
        assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_sharded_ct2_fft_matches(pmesh8):
    """the pencil ct2 pipeline (CT-factored x/y, split Nyquist) under
    shard_map matches the single-device ct2 transforms."""
    from pmesh_tpu.ops import fft_mxu as fm
    N = 256
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(N, N, N)).astype('f4'))
    xs = _sharded(pmesh8, x)
    r1, i1, nqr1, nqi1 = fm.fft3_real_forward_half_ct2(x)
    r8, i8, nqr8, nqi8 = fm.fft3_real_forward_half_ct2_sharded(
        pmesh8, xs)
    assert_allclose(np.asarray(r8), np.asarray(r1), atol=2e-6)
    assert_allclose(np.asarray(i8), np.asarray(i1), atol=2e-6)
    assert_allclose(np.asarray(nqr8), np.asarray(nqr1), atol=2e-6)

    w = np.fft.fftfreq(N) * 2 * np.pi
    k1 = tuple(((8 * np.sin(w) - np.sin(2 * w)) / 6.0).tolist())
    wz = np.fft.rfftfreq(N) * 2 * np.pi
    kz = tuple(((8 * np.sin(wz) - np.sin(2 * wz)) / 6.0).tolist())
    kd = (k1, k1, kz)
    f1 = fm.fft3_real_inverse_grad3_half_ct2(r1, i1, nqr1, nqi1,
                                             n2=N, kvecs=kd)
    f8 = fm.fft3_real_inverse_grad3_half_ct2_sharded(
        pmesh8, r8, i8, nqr8, nqi8, n2=N, kvecs=kd)
    for a, b in zip(f8, f1):
        e = float(jnp.max(jnp.abs(a - b)))
        s = float(jnp.max(jnp.abs(b)))
        assert e / s < 1e-5
        assert a.sharding.spec[0] == 'x'


def test_sharded_ct2_bf16_spectra(pmesh8):
    """fft='mxu_bf16s' — bf16 spectrum STORAGE through the pencil
    ct2 pipeline (half the a2a payload; matmuls stay f32) — tracks
    the f32-exact force to bf16 rounding, sharded == single-device."""
    from pmesh_tpu import ParticleMesh
    from pmesh_tpu.models.fastpm import Solver
    N = 256
    rng = np.random.RandomState(5)
    disp = tuple(jnp.asarray(rng.uniform(0, 1.0, (N, N, N)),
                             jnp.float32) for _ in range(3))
    pm1 = ParticleMesh(Nmesh=[N] * 3, BoxSize=float(N), dtype='f4')
    F1 = Solver(pm1).force_lattice(disp, bounds=(0., 1.), fft='mxu')
    B1 = Solver(pm1).force_lattice(disp, bounds=(0., 1.),
                                   fft='mxu_bf16s')
    pm8 = ParticleMesh(Nmesh=[N] * 3, BoxSize=float(N), dtype='f4',
                       procmesh=pmesh8)
    dsh = tuple(_sharded(pmesh8, d) for d in disp)
    B8 = Solver(pm8).force_lattice(dsh, bounds=(0., 1.),
                                   fft='mxu_bf16s')
    for a, b, c in zip(B1, F1, B8):
        s = float(jnp.max(jnp.abs(b)))
        # per-MODE bf16 rounding is 2.3e-3 rms (asserted at the fft
        # level in test_fft_mxu.test_ct2_bf16_storage_matches_f32);
        # for this near-uniform state the force is a 1/k^2-suppressed
        # functional of an aliasing-dominated spectrum, so the same
        # rounding reads as a few e-2 of the (small) force rms —
        # bound it loosely here, the tight accuracy contract lives at
        # the spectrum level
        assert float(jnp.max(jnp.abs(a - b))) / s < 5e-2
        # sharded bf16s == single-device bf16s (same storage
        # rounding on both sides): tight
        assert_allclose(np.asarray(c), np.asarray(a), atol=s * 1e-5)


def test_sharded_gradient_mode_mxu(pmesh8):
    """mode='gradient' fft='mxu' on the device mesh: the sharded
    Poisson ct2 potential (fft3_poisson_half_ct2_sharded) + the
    sharded fused 3-derivative readout must match single-device."""
    from pmesh_tpu import ParticleMesh
    from pmesh_tpu.models.fastpm import Solver
    N = 256
    rng = np.random.RandomState(9)
    disp = tuple(jnp.asarray(rng.uniform(0, 1.0, (N, N, N)),
                             jnp.float32) for _ in range(3))
    pm1 = ParticleMesh(Nmesh=[N] * 3, BoxSize=float(N), dtype='f4')
    F1 = Solver(pm1).force_lattice(disp, bounds=(0., 1.),
                                   mode='gradient', fft='mxu')
    pm8 = ParticleMesh(Nmesh=[N] * 3, BoxSize=float(N), dtype='f4',
                       procmesh=pmesh8)
    dsh = tuple(_sharded(pmesh8, d) for d in disp)
    F8 = Solver(pm8).force_lattice(dsh, bounds=(0., 1.),
                                   mode='gradient', fft='mxu')
    for a, b in zip(F8, F1):
        s = float(jnp.max(jnp.abs(b)))
        assert float(jnp.max(jnp.abs(a - b))) / s < 1e-5
        assert a.sharding.spec[0] == 'x'
