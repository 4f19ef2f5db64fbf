"""FastPM model tests: growth functions, LPT, force, leapfrog.

Mirrors the physics checks implicit in the reference apps
(examples/nbody.py, nbody/genic.py, nbody/qpm.py): growth limits,
Zel'dovich exactness on a single mode, momentum conservation, and
power-spectrum growth through the integrator.
"""
import numpy as np
from numpy.testing import assert_allclose
import jax.numpy as jnp
import pytest

from pmesh_tpu import ParticleMesh
from pmesh_tpu.models.cosmology import Cosmology, Planck15
from pmesh_tpu.models.powerspectrum import EHPower, sigma_r
from pmesh_tpu.models import fastpm
from pmesh_tpu.ops.power import fftpower, measure_power


def test_growth_limits():
    c = Planck15
    # matter domination: D1 ~ a, f1 ~ 1
    assert_allclose(float(c.D1(0.001) / c.D1(0.0005)), 2.0, rtol=1e-3)
    assert_allclose(float(c.f1(0.001)), 1.0, rtol=1e-3)
    # normalization
    assert_allclose(float(c.D1(1.0)), 1.0, rtol=1e-6)
    # 2LPT early-time ratio D2 = -3/7 D1^2
    a = 0.001
    assert_allclose(float(c.D2(a) / c.D1(a) ** 2), -3.0 / 7.0, rtol=1e-2)
    # E(a)
    assert_allclose(float(c.E(1.0)), 1.0, rtol=1e-12)


def test_eh_power_sigma8():
    p = EHPower(Planck15, redshift=0.0)
    assert_allclose(float(sigma_r(p, 8.0)), Planck15.sigma8, rtol=1e-3)
    # P(k) positive, decaying at high k
    k = np.array([0.01, 0.1, 1.0, 10.0])
    pk = np.asarray(p(k))
    assert (pk > 0).all()
    assert pk[3] < pk[1]


def test_zeldovich_single_mode():
    # a single-mode linear field: LPT displacement must be the
    # analytic Zel'dovich solution S = (ik/k^2) delta
    pm = ParticleMesh(Nmesh=[8, 8, 8], BoxSize=8.0)
    solver = fastpm.Solver(pm, Planck15)
    dlin = pm.create(type='complex', value=0.0)
    # delta(x) = 2*A*cos(2 pi x / L): mode (1,0,0) with A
    A = 0.01
    dlin.csetitem([1, 0, 0], A)
    state = solver.lpt(dlin, a0=1.0, order=1, shift=0.0)
    kf = 2 * np.pi / 8.0
    Q = np.asarray(state.Q)
    S = np.asarray(state.S)
    # expected: S_x = A * 2 * sin(k x) / k... derive via ik/k^2:
    # delta_k = A at k=(kf,0,0) plus conjugate; S(x) = sum ik/k^2 e^{ikx}
    # = A * (i/kf e^{i kf x} - i/kf e^{-i kf x}) = -2 A sin(kf x)/kf
    expected = -2 * A * np.sin(kf * Q[:, 0]) / kf
    assert_allclose(S[:, 0], expected, atol=1e-12)
    assert_allclose(S[:, 1:], 0.0, atol=1e-12)


def test_force_momentum_conservation():
    pm = ParticleMesh(Nmesh=[16, 16, 16], BoxSize=16.0, resampler='cic')
    solver = fastpm.Solver(pm, Planck15)
    rng = np.random.RandomState(42)
    X = jnp.asarray(rng.uniform(0, 16, size=(64, 3)))
    F = np.asarray(solver.force(X))
    # PM forces from a periodic box sum to ~zero (momentum conservation)
    assert_allclose(F.sum(axis=0), 0.0, atol=1e-8)


def test_force_pair_attraction():
    # two particles attract along their separation
    pm = ParticleMesh(Nmesh=[32, 32, 32], BoxSize=32.0, resampler='cic')
    solver = fastpm.Solver(pm, Planck15)
    X = jnp.asarray([[10.0, 16.0, 16.0], [22.0, 16.0, 16.0]])
    F = np.asarray(solver.force(X))
    assert F[0, 0] > 0  # pulled towards +x
    assert F[1, 0] < 0
    assert_allclose(F[0, 0], -F[1, 0], rtol=1e-6)


def test_nbody_grows_structure():
    # evolve from LPT at a=0.1 to a=1.0; the power spectrum should
    # grow by roughly D1(1)^2/D1(0.1)^2 on large scales
    pm = ParticleMesh(Nmesh=[16, 16, 16], BoxSize=64.0, resampler='cic')
    solver = fastpm.Solver(pm, Planck15)
    power = EHPower(Planck15, redshift=0.0)
    dlin = solver.linear_field(power, seed=42, unitary=True,
                               compat='native')
    state = solver.lpt(dlin, a0=0.1, order=2, shift=0.0)

    def pofk(state):
        rho = pm.paint(state.X)
        k, p, n = fftpower(rho, Nbins=4)
        return np.asarray(k), np.asarray(p)

    k0, p0 = pofk(state)
    steps = np.linspace(0.1, 1.0, 5)
    state = solver.nbody(state, steps, factors='fastpm', scheme='symp2')
    k1, p1 = pofk(state)
    growth = float(Planck15.D1(1.0) / Planck15.D1(0.1)) ** 2
    # large-scale bin should grow close to linear theory
    ratio = p1[1] / p0[1]
    assert growth * 0.5 < ratio < growth * 2.0


def test_nbody_monitor_path_matches_scan():
    pm = ParticleMesh(Nmesh=[8, 8, 8], BoxSize=32.0, resampler='cic')
    solver = fastpm.Solver(pm, Planck15)
    power = EHPower(Planck15, redshift=0.0)
    dlin = solver.linear_field(power, seed=1, compat='native')
    state = solver.lpt(dlin, a0=0.3, order=1, shift=0.0)
    steps = np.linspace(0.3, 0.5, 3)
    s1 = solver.nbody(state, steps)
    snaps = []
    s2 = solver.nbody(state, steps, monitor=lambda a, s: snaps.append(a))
    assert_allclose(np.asarray(s1.S), np.asarray(s2.S), atol=1e-10)
    assert_allclose(np.asarray(s1.V), np.asarray(s2.V), atol=1e-10)
    assert len(snaps) == 2


def test_measure_power_flat_for_whitenoise():
    # white noise: P(k) = V / Nmodes... the painted uniform grid has
    # zero power; use the whitenoise field directly
    pm = ParticleMesh(Nmesh=[16, 16, 16], BoxSize=16.0)
    c = pm.generate_whitenoise(seed=5, type='complex', compat='native')
    k, p, n = measure_power(c, Nbins=4)
    vol = 16.0 ** 3
    # <|delta_k|^2> = 1 per mode: P = V
    assert_allclose(np.asarray(p)[1:], vol, rtol=0.3)


def test_force_gradient_mode_matches_lattice():
    """Solver.force(mode='gradient') — the reference QPM family on
    the generic catalog path (one Poisson c2r + derivative-window
    readouts, qpm.py:82-109) — matches force_lattice gradient mode
    on a lattice-resident catalog."""
    import jax
    from pmesh_tpu import ParticleMesh
    from pmesh_tpu.models.fastpm import Solver
    N = 16
    pm = ParticleMesh(Nmesh=[N] * 3, BoxSize=float(N), dtype='f4',
                      resampler='cic')
    s = Solver(pm)
    rng = np.random.RandomState(0)
    disp = tuple(jnp.asarray(rng.uniform(0.05, 0.95, (N,) * 3),
                             jnp.float32) for _ in range(3))
    Q = jnp.asarray(pm.generate_uniform_particle_grid(shift=0.0),
                    jnp.float32)
    X = Q + jnp.stack([d.ravel() for d in disp], -1)
    Fg = jax.jit(lambda x: s.force(x, mode='gradient'))(X)
    Fl = s.force_lattice(disp, bounds=(0., 1.), mode='gradient',
                         fft='xla')
    for d in range(3):
        a = np.asarray(Fg[:, d]).reshape(N, N, N)
        b = np.asarray(Fl[d])
        assert np.abs(a - b).max() < 1e-6
