"""Uneven (non-divisible) mesh extents on the device-sharded path.

The reference supports arbitrary pfft pencil edges
(pmesh/pm.py:1319-1327, 1417-1427): a 100^3 mesh on 8 ranks simply
gets uneven local slabs.  TPU collectives shard equal blocks only, so
here the slabs are PADDED (rows = ceil(N0/D); dead rows at the top
absorb the wrap-seam stencil spill) and every transform pads-and-
slices around the even kernels (parallel/pfft._r2c_uneven,
exchange._ball_channels ring math).  These tests pin the parity of
that machinery against the single-device truth.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from numpy.testing import assert_allclose

from pmesh_tpu.pm import ParticleMesh
from pmesh_tpu.parallel.pmesh import ProcessMesh
from pmesh_tpu.parallel import exchange as ex


@pytest.fixture(scope='module')
def pmesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return ProcessMesh(jax.devices()[:8])


def _pair(N, pmesh8, seed=4, amp=1.0, box=None):
    box = float(N) if box is None else float(box)
    pm1 = ParticleMesh(Nmesh=[N] * 3, BoxSize=box, dtype='f8')
    pm8 = ParticleMesh(Nmesh=[N] * 3, BoxSize=box, dtype='f8',
                       procmesh=pmesh8)
    rng = np.random.RandomState(seed)
    Q = np.asarray(pm1.generate_uniform_particle_grid(shift=0.0))
    X = jnp.asarray(Q + rng.uniform(-amp, amp, Q.shape) * box / N)
    return pm1, pm8, X


def test_uneven_flags():
    # 20 over 8: deep enough to slab-shard with padded slabs
    pm = ParticleMesh(Nmesh=[20] * 3, BoxSize=20.0, dtype='f8',
                      procmesh=ProcessMesh(jax.devices()[:8]))
    assert pm._uneven1d and not pm._even_mesh
    # 10 over 8: rows=2, the seam's dead slabs exceed the ring
    # radius — falls back to the replicated GSPMD path
    pm = ParticleMesh(Nmesh=[10] * 3, BoxSize=10.0, dtype='f8',
                      procmesh=ProcessMesh(jax.devices()[:8]))
    assert not pm._uneven1d and not pm._even_mesh


def test_uneven_paint_readout_parity(pmesh8):
    pm1, pm8, X = _pair(20, pmesh8)
    X8 = pm8.reshard_particles(X)
    lay = pm8.decompose(X8)
    assert isinstance(lay, ex.ShardedLayout)
    assert float(lay.badness) == 0.0
    r1 = pm1.paint(np.asarray(X))
    r8 = pm8.paint(X8, layout=lay)
    assert r8.value.shape == (20, 20, 20)
    assert_allclose(np.asarray(r8.value), np.asarray(r1.value),
                    atol=1e-12)
    # total mass conserved through the padded seam
    assert_allclose(float(jnp.sum(r8.value)), float(X.shape[0]),
                    rtol=1e-12)
    v1 = np.sort(np.asarray(r1.readout(np.asarray(X))))
    v8 = np.sort(np.asarray(r8.readout(X8, layout=lay)))
    assert_allclose(v8, v1, atol=1e-12)


def test_uneven_fft_roundtrip(pmesh8):
    pm1, pm8, _ = _pair(20, pmesh8)
    rng = np.random.RandomState(7)
    v = rng.uniform(size=(20, 20, 20))
    r1 = pm1.create(type='real', value=v)
    r8 = pm8.create(type='real', value=v)
    c1, c8 = r1.r2c(), r8.r2c()
    assert c8.value.shape == c1.value.shape
    assert_allclose(np.asarray(c8.value), np.asarray(c1.value),
                    atol=1e-13)
    assert_allclose(np.asarray(c8.c2r().value), v, atol=1e-12)


def test_uneven_gradient_units(pmesh8):
    # BoxSize != Nmesh so the sim->grid scale factor is exercised on
    # the padded slabs too
    pm1, pm8, X = _pair(20, pmesh8, box=37.5)
    X8 = pm8.reshard_particles(X)
    lay = pm8.decompose(X8)
    r1 = pm1.paint(np.asarray(X))
    r8 = pm8.paint(X8, layout=lay)
    g1 = np.sort(np.asarray(r1.readout(np.asarray(X), gradient=0)))
    g8 = np.sort(np.asarray(r8.readout(X8, layout=lay, gradient=0)))
    assert_allclose(g8, g1, atol=1e-12)


def test_uneven_force_parity(pmesh8):
    from pmesh_tpu.models.fastpm import Solver
    pm1, pm8, X = _pair(20, pmesh8, box=40.0)
    X8 = pm8.reshard_particles(X)
    s1, s8 = Solver(pm1), Solver(pm8)
    for mode in ('spectral', 'gradient'):
        F1 = np.asarray(jax.jit(
            lambda X: s1.force(X, mode=mode))(X))
        F8 = np.asarray(jax.jit(
            lambda X: s8.force(X, mode=mode))(X8))
        key = np.lexsort(np.round(np.asarray(X8), 9).T[::-1])
        key1 = np.lexsort(np.round(np.asarray(X), 9).T[::-1])
        assert_allclose(F8[key], F1[key1], atol=1e-11,
                        err_msg=mode)


def test_uneven_measure_and_auto_capacity(pmesh8):
    pm1, pm8, X = _pair(20, pmesh8)
    # shave to a non-divisible particle count as well
    X = X[:-13]
    X8 = pm8.reshard_particles(X)
    lay = pm8.decompose(X8, capacity='auto')
    assert float(lay.badness) == 0.0
    r1 = pm1.paint(np.asarray(X))
    r8 = pm8.paint(X8, layout=lay)
    assert_allclose(np.asarray(r8.value), np.asarray(r1.value),
                    atol=1e-12)
    load = ex.measure_load(pm8.procmesh,
                           jnp.asarray(X8)[:, 0], 20, smoothing=1.0)
    assert load['imbalance'] >= 1.0
    # equal-count blocks shear from the (uneven-population) slab
    # ranges, so same-block residents undercount — but the per-block
    # paint work must account for every particle exactly once plus
    # its ghost images
    assert (int(np.sum(load['paint_work']))
            == X.shape[0] + int(np.sum(load['ghosts_recv'])))


@pytest.mark.slow
def test_uneven_100cube_device_sharded(pmesh8):
    """The VERDICT benchmark case: a 100^3 mesh on 8 devices runs
    device-sharded (not replicated) with single-device parity."""
    pm8 = ParticleMesh(Nmesh=[100] * 3, BoxSize=100.0, dtype='f8',
                       procmesh=pmesh8)
    assert pm8._uneven1d
    pm1 = ParticleMesh(Nmesh=[100] * 3, BoxSize=100.0, dtype='f8')
    rng = np.random.RandomState(11)
    n = 100 ** 2 * 8
    X = jnp.asarray(
        np.stack([np.sort(rng.uniform(0, 100, n))]
                 + [rng.uniform(0, 100, n) for _ in range(2)],
                 axis=-1))
    lay = pm8.decompose(X, capacity='auto')
    assert float(lay.badness) == 0.0
    r1 = pm1.paint(np.asarray(X))
    r8 = pm8.paint(X, layout=lay)
    assert_allclose(np.asarray(r8.value), np.asarray(r1.value),
                    atol=1e-12)
    c1, c8 = r1.r2c(), r8.r2c()
    assert_allclose(np.asarray(c8.value), np.asarray(c1.value),
                    atol=1e-13)
