"""Regression tests for review findings (round 1)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pmesh_tpu import ParticleMesh


def test_cgetitem_conjugate_half():
    """Reading a mode stored only as a conjugate must reconstruct it
    from the dual index, not return a clamped neighbor."""
    pm = ParticleMesh(Nmesh=[8, 8], BoxSize=8.0, dtype='f8')
    c = pm.create(type='transposedcomplex')
    c.csetitem([1, 1], 1 + 2j)
    c.csetitem([7, 4], 9 + 9j)
    got = c.cgetitem([7, 7])
    np.testing.assert_allclose(got, 1 - 2j, atol=1e-13)
    # component reads too
    np.testing.assert_allclose(c.cgetitem([7, 7, 1]), -2.0, atol=1e-13)


def test_cgetitem_conjugate_half_3d():
    pm = ParticleMesh(Nmesh=[8, 8, 8], BoxSize=8.0, dtype='f8')
    c = pm.create(type='transposedcomplex')
    c.csetitem([3, 4, 2], 0.5 - 0.25j)
    got = c.cgetitem([5, 4, 6])
    np.testing.assert_allclose(got, 0.5 + 0.25j, atol=1e-13)


def test_force_staged_different_particle_counts():
    """The staged-force cache must not bake the first call's particle
    count into later traces."""
    from pmesh_tpu.models.fastpm import Solver
    n = 8
    pm = ParticleMesh(Nmesh=[n] * 3, BoxSize=float(n), dtype='f8',
                      resampler='cic')
    solver = Solver(pm)
    rng = np.random.RandomState(0)
    X1 = jnp.asarray(rng.uniform(0, n, (512, 3)))
    X2 = jnp.asarray(rng.uniform(0, n, (64, 3)))
    F1 = solver.force_staged(X1)
    F2 = solver.force_staged(X2)
    np.testing.assert_allclose(np.asarray(F2), np.asarray(
        solver.force(X2)), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(F1), np.asarray(
        solver.force(X1)), rtol=1e-10, atol=1e-12)


def test_qpm_run_lands_on_a_equals_one():
    from pmesh_tpu.models.qpm import QPM
    from pmesh_tpu.models.cosmology import Planck15
    qpm = QPM(Planck15, BoxSize=32.0, Nmesh=8, a0=0.5, dtype='f8')
    rng = np.random.RandomState(3)
    n = 32
    P = {'Position': jnp.asarray(rng.uniform(0, 32, size=(n, 3))),
         'Velocity': jnp.zeros((n, 3)),
         'Accel': jnp.zeros((n, 3)),
         'Mass': 1.0}
    events = list(qpm.run(P))
    a_done = max(a for (k, a) in events)
    # the integration must finish exactly at a = 1, not overshoot by
    # a full dloga (the FINISHED event carries the final time)
    assert events[-1][0] == QPM.FINISHED
    assert abs(a_done - 1.0) < 1e-9, a_done


def test_gravpm_monitor_no_duplicate_measurements():
    from pmesh_tpu.models.gravpm import run_sim
    _, spectra = run_sim(nmesh=16, boxsize=64.0, boost=1,
                         resampler='cic', seed=11, ainit=0.3,
                         afinal=0.6, steps=4, order=1,
                         compat='native', dtype='f8',
                         snapshot_times=[0.45, 0.5, 0.6],
                         monitor_print=False)
    times = [round(a, 9) for (a, k, p) in spectra]
    assert len(times) == len(set(times)), times


def test_symlet_windows_still_build():
    # the fixed imaginary-residue guard must not reject valid filters
    from pmesh_tpu.window import windows
    for name in ('sym6', 'sym12', 'sym20'):
        w = windows[name]
        assert w.support > 0


def test_c2r_never_fuses_irfft3d():
    """XLA-TPU's fused IRFFT-3D primitive returns garbage for
    >=256^3 half-spectrum inputs (measured on v5e: relative error
    ~0.3; forward and all 1/2-axis transforms exact).  ops/fft.c2r
    must keep the inverse split (2-axis IFFT + barrier + 1-d IRFFT)
    so the fusion can never form; this pins the split path's
    correctness at a triggering size."""
    import numpy as np
    import jax.numpy as jnp
    from pmesh_tpu.ops import fft as _fft
    N = 256
    rng = np.random.RandomState(0)
    x = rng.normal(size=(N, N, N)).astype('f4')
    spec = _fft.r2c(jnp.asarray(x))
    back = _fft.c2r(spec, (N, N, N), jnp.float32)
    err = float(jnp.max(jnp.abs(back - x)))
    assert err < 1e-4, err
