"""Smoke/parity tests for the auxiliary compatibility modules:
prototype callable-window painter (legacy/lanczos.py), the CoArray
experiment (parallel/coarray.py), and the debug-32 fixture."""
import os
import warnings

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_lanczos_prototype_paint_readout():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        from pmesh_tpu.legacy import lanczos as proto
    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.uniform(0, 8, (50, 2)))
    mesh = jnp.zeros((8, 8))
    out = proto.paint(pos, mesh, weights=2.0, period=8,
                      window=proto.linear)
    np.testing.assert_allclose(float(out.sum()), 100.0, rtol=1e-6)

    # linear window == the engine's CIC
    from pmesh_tpu.ops import paint as engine
    truth = engine.paint(mesh, pos, mass=2.0, window='cic', period=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(truth),
                               atol=1e-6)

    vals = proto.readout(out, pos, period=8, window=proto.linear)
    tv = engine.readout(out, pos, window='cic', period=8)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(tv),
                               atol=1e-6)


def test_lanczos_prototype_kernels():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        from pmesh_tpu.legacy import lanczos as proto
    x = jnp.linspace(-3, 3, 101)
    for k in (proto.linear, proto.cubic, proto.lanczos2,
              proto.lanczos3, proto.kaiser(2, 1.0)):
        v = np.asarray(k(x))
        assert np.isfinite(v).all()
        assert abs(float(k(jnp.asarray([0.0]))[0]) - 1.0) < 1e-6
    # mode='raise' flags out-of-box particles when not periodic
    pos = jnp.asarray([[20.0, 1.0]])
    with pytest.raises(ValueError):
        proto.paint(pos, jnp.zeros((8, 8)), mode='raise',
                    window=proto.linear)


def test_coarray_blocks():
    from pmesh_tpu.parallel.coarray import CoArray
    from pmesh_tpu.parallel.pmesh import ProcessMesh
    procmesh = ProcessMesh(jax.devices())
    n = procmesh.size
    a = jnp.arange(n * 4 * 2, dtype=jnp.float32).reshape(n * 4, 2)
    ca = CoArray(a, procmesh)
    assert len(ca) == n
    np.testing.assert_allclose(ca[0], np.asarray(a[:4]))
    np.testing.assert_allclose(ca[n - 1], np.asarray(a[-4:]))
    ca2 = ca.map(lambda b: b * 2.0)
    np.testing.assert_allclose(ca2.allgather(), np.asarray(a) * 2.0)


def test_debug_fixture_exists_and_consistent():
    path = os.path.join(os.path.dirname(__file__), '..', 'debug-32',
                        'IC.npz')
    if not os.path.exists(path):
        pytest.skip("debug-32/IC.npz not generated")
    d = np.load(path)
    ng = int(d['Ngrid'])
    assert d['Position'].shape == (ng ** 3, 3)
    assert d['Velocity'].shape == (ng ** 3, 3)
    assert d['ID'].shape == (ng ** 3,)
    assert d['Strain'].shape == (ng ** 3, 6)
    box = float(d['BoxSize'])
    assert (d['Position'] >= 0).all() and (d['Position'] < box).all()
    assert np.unique(d['ID']).size == ng ** 3
    assert np.isfinite(d['ICDensity']).all()
    # overdensity averages to ~0
    assert abs(float(d['ICDensity'].mean())) < 1e-2
