"""Lattice-form FastPM path vs the generic particle path."""
import numpy as np
import jax
import jax.numpy as jnp

from pmesh_tpu import ParticleMesh
from pmesh_tpu.models.fastpm import Solver


def _setup(n=16):
    pm = ParticleMesh(Nmesh=[n] * 3, BoxSize=float(n), dtype='f8',
                      resampler='cic')
    solver = Solver(pm)
    rng = np.random.RandomState(3)
    disp = tuple(jnp.asarray(rng.uniform(-0.4, 0.6, (n, n, n)))
                 for _ in range(3))
    return pm, solver, disp


def test_force_lattice_matches_force():
    pm, solver, disp = _setup()
    n = pm.Nmesh[0]
    F_lat = solver.force_lattice(disp, bounds=(-0.5, 0.7))

    Q = pm.generate_uniform_particle_grid(shift=0.0)
    S = jnp.stack([d.ravel() for d in disp], axis=-1) \
        * float(pm.BoxSize[0] / n)
    F = solver.force(Q + S)
    for d in range(3):
        np.testing.assert_allclose(np.asarray(F_lat[d]).ravel(),
                                   np.asarray(F[:, d]), rtol=1e-10,
                                   atol=1e-12)


def test_nbody_lattice_matches_nbody():
    pm, solver, disp = _setup(n=8)
    n = pm.Nmesh[0]
    cell = float(pm.BoxSize[0] / n)
    rng = np.random.RandomState(4)
    vel = tuple(jnp.asarray(rng.uniform(-0.1, 0.1, (n, n, n)))
                for _ in range(3))

    steps = np.linspace(0.1, 0.3, 3)
    S2, V2 = solver.nbody_lattice(disp, vel, steps, bounds=(-2.0, 2.0))

    from pmesh_tpu.models.fastpm import State
    Q = pm.generate_uniform_particle_grid(shift=0.0)
    S = jnp.stack([d.ravel() for d in disp], axis=-1) * cell
    V = jnp.stack([v.ravel() for v in vel], axis=-1) * cell
    out = solver.nbody(State(Q, S, V), steps)
    for d in range(3):
        np.testing.assert_allclose(np.asarray(S2[d]).ravel() * cell,
                                   np.asarray(out.S[:, d]), rtol=1e-8,
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(V2[d]).ravel() * cell,
                                   np.asarray(out.V[:, d]), rtol=1e-8,
                                   atol=1e-10)


def test_nbody_lattice_poisons_on_bound_breach():
    """A displacement crossing the static bounds MID-SCAN must poison
    the state with NaN — never a warning after silently dropped mass
    (the exchange.py badness discipline)."""
    pm, solver, disp = _setup(n=8)
    n = pm.Nmesh[0]
    rng = np.random.RandomState(5)
    # strong outward velocity: crosses the tight upper bound after a
    # couple of drifts, well before the scan ends
    vel = tuple(jnp.asarray(rng.uniform(0.4, 0.5, (n, n, n)))
                for _ in range(3))
    steps = np.linspace(0.1, 0.5, 6)
    S, V = solver.nbody_lattice(disp, vel, steps, bounds=(-0.5, 0.8))
    assert not bool(np.isfinite(np.asarray(S[0])).all())
    assert not bool(np.isfinite(np.asarray(V[0])).all())

    # the same run inside generous bounds stays finite
    S2, V2 = solver.nbody_lattice(disp, vel, steps, bounds=(-2.0, 9.0))
    assert bool(np.isfinite(np.asarray(S2[0])).all())


def test_lpt_lattice_matches_lpt():
    pm, solver, _ = _setup(n=8)
    cell = float(pm.BoxSize[0] / 8)
    dlin = solver.linear_field(lambda k: jnp.where(k > 0, k ** -1.5, 0.0),
                               seed=100)
    disp, vel = solver.lpt_lattice(dlin, a0=0.2)
    state = solver.lpt(dlin, a0=0.2, order=1, shift=0.0)
    for d in range(3):
        np.testing.assert_allclose(np.asarray(disp[d]).ravel() * cell,
                                   np.asarray(state.S[:, d]),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(vel[d]).ravel() * cell,
                                   np.asarray(state.V[:, d]),
                                   rtol=1e-8, atol=1e-10)


def test_diffdir_readout_matches_generic():
    from pmesh_tpu.ops import gridpm, paint as generic
    rng = np.random.RandomState(13)
    n = 8
    mesh = jnp.asarray(rng.normal(size=(n, n, n)))
    disp = tuple(jnp.asarray(rng.uniform(0.05, 0.95, (n, n, n)))
                 for _ in range(3))
    q = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing='ij'),
                 axis=-1).reshape(-1, 3)
    pos = q + np.stack([np.asarray(d).ravel() for d in disp], axis=-1)
    for d in range(3):
        got = gridpm.readout_grid(mesh, disp, bounds=(0.0, 1.0),
                                  window='tsc', diffdir=d)
        truth = generic.readout(mesh, pos, window='tsc', period=n,
                                diffdir=d)
        np.testing.assert_allclose(np.asarray(got).ravel(),
                                   np.asarray(truth), atol=1e-10)


def test_force_gradient_mode():
    """The window-gradient force agrees with the spectral force on
    smooth (large-scale) fields when the window is differentiable
    (TSC+); with CIC the kernel derivative is a step function and the
    small-scale force is much noisier — hence TSC here."""
    n = 16
    pm = ParticleMesh(Nmesh=[n] * 3, BoxSize=float(n), dtype='f8',
                      resampler='tsc')
    solver = Solver(pm, force_resampler='tsc')
    # a smooth single-mode displacement field
    x = np.arange(n) * (2 * np.pi / n)
    X, Y, Z = np.meshgrid(x, x, x, indexing='ij')
    disp = (jnp.asarray(0.4 * np.sin(X + 0.3)),
            jnp.asarray(0.4 * np.sin(Y + 1.1)),
            jnp.asarray(0.4 * np.cos(Z)))

    Fs = solver.force_lattice(disp, bounds=(-0.5, 0.5), mode='spectral')
    Fg = solver.force_lattice(disp, bounds=(-0.5, 0.5), mode='gradient')
    for d in range(3):
        a, b = np.asarray(Fs[d]).ravel(), np.asarray(Fg[d]).ravel()
        rms = np.sqrt(np.mean(a ** 2)) + 1e-30
        # net momentum small relative to the total force magnitude
        assert abs(float(np.sum(np.asarray(Fg[d])))) < 1e-3 * rms * n ** 3
        assert np.sqrt(np.mean((a - b) ** 2)) / rms < 0.05
        assert np.corrcoef(a, b)[0, 1] > 0.998


def test_force_lattice_sharded_matches_single():
    """The lattice force on a slab-sharded 8-device mesh equals the
    single-device result (rolls lower to halo collective-permutes)."""
    from pmesh_tpu.parallel.pmesh import ProcessMesh
    from jax.sharding import NamedSharding, PartitionSpec as P
    n = 16
    rng = np.random.RandomState(21)
    disp_np = [rng.uniform(-0.4, 0.6, (n, n, n)) for _ in range(3)]

    pm1 = ParticleMesh(Nmesh=[n] * 3, BoxSize=float(n), dtype='f8',
                       resampler='cic')
    F1 = Solver(pm1).force_lattice(
        tuple(jnp.asarray(d) for d in disp_np), bounds=(-0.5, 0.7))

    procmesh = ProcessMesh(jax.devices())
    pmN = ParticleMesh(Nmesh=[n] * 3, BoxSize=float(n), dtype='f8',
                       resampler='cic', procmesh=procmesh)
    sh = NamedSharding(procmesh.mesh, P(procmesh.axis, None, None))
    dispN = tuple(jax.device_put(jnp.asarray(d), sh) for d in disp_np)
    FN = jax.jit(lambda d: Solver(pmN).force_lattice(
        d, bounds=(-0.5, 0.7)))(dispN)
    for d in range(3):
        np.testing.assert_allclose(np.asarray(FN[d]), np.asarray(F1[d]),
                                   rtol=1e-10, atol=1e-12)
