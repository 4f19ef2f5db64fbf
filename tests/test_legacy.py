"""Legacy API tests (mirroring test-particlemesh.py + the deprecated
painter coverage)."""
import warnings

import numpy as np
from numpy.testing import assert_allclose
import jax.numpy as jnp
import pytest


def test_legacy_particlemesh_pipeline():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        from pmesh_tpu.legacy.particlemesh import ParticleMesh
        from pmesh_tpu.legacy.transfer import TransferFunction

    pm = ParticleMesh(BoxSize=16.0, Nmesh=16, dtype='f8')
    rng = np.random.RandomState(42)
    pos = rng.uniform(0, 16, size=(100, 3))

    pm.clear()
    pm.paint(pos)
    assert_allclose(float(pm.real.sum()), 100.0, rtol=1e-10)
    pm.r2c()
    pm.push()
    pm.transfer([
        TransferFunction.RemoveDC,
        TransferFunction.Trilinear,
        TransferFunction.Gaussian(1.25),
        TransferFunction.Poisson,
        TransferFunction.Constant(4 * np.pi * 43007.1),
    ])
    pm.c2r([TransferFunction.SuperLanzcos(0)])
    acc = np.asarray(pm.readout(pos))
    assert np.isfinite(acc).all()
    pm.pop()
    # after pop, the DC mode of the original transform is back
    assert abs(pm.complex.reshape(-1)[0]) > 0


def test_legacy_transfer_powerspectrum():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        from pmesh_tpu.legacy.particlemesh import ParticleMesh
        from pmesh_tpu.legacy.transfer import TransferFunction

    pm = ParticleMesh(BoxSize=16.0, Nmesh=16, dtype='f8')
    rng = np.random.RandomState(1)
    pos = rng.uniform(0, 16, size=(1000, 3))
    pm.r2c(pos)
    wout = np.zeros(8)
    psout = np.zeros(8)
    pm.transfer([
        TransferFunction.NormalizeDC,
        TransferFunction.RemoveDC,
        TransferFunction.PowerSpectrum(wout, psout),
    ])
    assert (psout >= 0).all()
    assert np.isfinite(wout).all()


def test_legacy_cic_matches_window():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        from pmesh_tpu.legacy import cic
    from pmesh_tpu.window import CIC

    rng = np.random.RandomState(42)
    pos = rng.uniform(0, 8, size=(50, 2))
    mesh = np.zeros((8, 8))
    r1 = cic.paint(pos, mesh, mode='wrap', period=8)
    r2 = CIC.paint(np.zeros((8, 8)), pos,
                   transform=__import__('pmesh_tpu').Affine(2, period=8))
    assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-12)
    v1 = cic.readout(np.asarray(r1), pos, mode='wrap', period=8)
    assert np.isfinite(np.asarray(v1)).all()


def test_legacy_tsc():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        from pmesh_tpu.legacy import tsc
    pos = np.array([[4.0, 4.0]])
    r = tsc.paint(pos, np.zeros((8, 8)), mode='wrap', period=8)
    assert_allclose(float(np.asarray(r).sum()), 1.0, rtol=1e-12)


def test_legacy_tools():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        from pmesh_tpu.legacy.tools import Rotator, FromRoot

    with Rotator():
        pass

    @FromRoot()
    def f(x):
        return x * 2
    assert f(21) == 42
