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
