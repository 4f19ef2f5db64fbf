"""Gradient tests, mirroring pmesh/tests/test_gradient.py.

The house pattern of the reference is collective finite differences
vs the analytic vjp entries (test_gradient.py:11-101, rtol 1e-5);
here jax.grad drives the custom VJPs end-to-end and is compared to
central differences on the same global quantities.
"""
import numpy as np
from numpy.testing import assert_allclose
import jax
import jax.numpy as jnp
import pytest

from pmesh_tpu import ParticleMesh, RealField


def central_diff(f, x, eps=1e-5):
    x = np.asarray(x, dtype='f8')
    g = np.zeros_like(x)
    it = np.nditer(x, flags=['multi_index'])
    while not it.finished:
        idx = it.multi_index
        xp = x.copy()
        xp[idx] += eps
        xm = x.copy()
        xm[idx] -= eps
        g[idx] = (float(f(xp)) - float(f(xm))) / (2 * eps)
        it.iternext()
    return g


@pytest.mark.parametrize("resampler", ['cic', 'tsc'])
def test_readout_grad_wrt_pos(resampler):
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[8, 8], resampler=resampler)
    rng = np.random.RandomState(42)
    mesh = rng.uniform(size=(8, 8))
    real = pm.create(type='real', value=mesh)
    pos = rng.uniform(1, 7, size=(4, 2))

    def obj(pos):
        v = real.readout(jnp.asarray(pos))
        return jnp.sum(v ** 2)

    ag = np.asarray(jax.grad(obj)(jnp.asarray(pos)))
    ng = central_diff(obj, pos)
    assert_allclose(ng, ag, rtol=1e-5, atol=1e-8)


def test_readout_grad_wrt_mesh():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[8, 8])
    rng = np.random.RandomState(42)
    mesh = rng.uniform(size=(8, 8))
    pos = jnp.asarray(rng.uniform(1, 7, size=(4, 2)))

    def obj(mesh):
        real = pm.create(type='real', value=mesh)
        return jnp.sum(real.readout(pos) ** 2)

    ag = np.asarray(jax.grad(obj)(jnp.asarray(mesh)))
    ng = central_diff(obj, mesh)
    assert_allclose(ng, ag, rtol=1e-5, atol=1e-8)


def test_paint_grad_wrt_pos():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[8, 8])
    rng = np.random.RandomState(42)
    pos = rng.uniform(1, 7, size=(4, 2))
    w = jnp.asarray(rng.uniform(size=(8, 8)))

    def obj(pos):
        real = pm.paint(jnp.asarray(pos))
        return jnp.sum(real.value * w)

    ag = np.asarray(jax.grad(obj)(jnp.asarray(pos)))
    ng = central_diff(obj, pos)
    assert_allclose(ng, ag, rtol=1e-5, atol=1e-8)


def test_paint_grad_wrt_mass():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[8, 8])
    rng = np.random.RandomState(42)
    pos = jnp.asarray(rng.uniform(1, 7, size=(4, 2)))
    mass = rng.uniform(size=4)
    w = jnp.asarray(rng.uniform(size=(8, 8)))

    def obj(mass):
        real = pm.paint(pos, mass=jnp.asarray(mass))
        return jnp.sum(real.value * w)

    ag = np.asarray(jax.grad(obj)(jnp.asarray(mass)))
    ng = central_diff(obj, mass)
    assert_allclose(ng, ag, rtol=1e-5, atol=1e-8)


def test_fft_grad():
    # c2r/r2c gradient scaling (reference c2r_vjp/r2c_vjp,
    # pm.py:865-870, 1021-1026)
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4])
    rng = np.random.RandomState(42)
    mesh = rng.uniform(size=(4, 4))

    def obj(mesh):
        real = pm.create(type='real', value=mesh)
        c = real.r2c()
        return c.cnorm()

    ag = np.asarray(jax.grad(obj)(jnp.asarray(mesh)))
    ng = central_diff(obj, mesh, eps=1e-6)
    assert_allclose(ng, ag, rtol=1e-4, atol=1e-8)


def test_full_pipeline_grad():
    # paint -> r2c -> transfer -> c2r -> readout, grad wrt positions:
    # the fastpm force pipeline (examples/nbody.py:199-218) end to end
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[8, 8], resampler='cic')
    rng = np.random.RandomState(42)
    pos = rng.uniform(1, 7, size=(6, 2))

    def obj(pos):
        pos = jnp.asarray(pos)
        real = pm.paint(pos)
        c = real.r2c()

        def pot(k, v):
            k2 = k.normp(2, zeromode=1.0)
            return v / k2

        phi = c.apply(pot).c2r()
        return jnp.sum(phi.readout(pos))

    ag = np.asarray(jax.grad(obj)(jnp.asarray(pos)))
    ng = central_diff(obj, pos, eps=1e-5)
    assert_allclose(ng, ag, rtol=1e-4, atol=1e-7)


def test_readout_vjp_method():
    # explicit vjp methods for API parity (pm.py:793-845)
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[8, 8])
    rng = np.random.RandomState(42)
    real = pm.create(type='real', value=rng.uniform(size=(8, 8)))
    pos = jnp.asarray(rng.uniform(1, 7, size=(4, 2)))
    v = jnp.asarray(rng.uniform(size=4))

    out_self, out_pos = real.readout_vjp(pos, v)
    # compare against jax.grad of sum(v * readout)
    def obj(mesh, pos):
        f = pm.create(type='real', value=mesh)
        return jnp.sum(v * f.readout(pos))
    g_mesh, g_pos = jax.grad(obj, argnums=(0, 1))(real.value, pos)
    assert_allclose(np.asarray(out_self.value), np.asarray(g_mesh),
                    atol=1e-12)
    assert_allclose(np.asarray(out_pos), np.asarray(g_pos), atol=1e-12)


def test_paint_vjp_method():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[8, 8])
    rng = np.random.RandomState(42)
    pos = jnp.asarray(rng.uniform(1, 7, size=(4, 2)))
    mass = jnp.asarray(rng.uniform(size=4))
    v = pm.create(type='real', value=rng.uniform(size=(8, 8)))

    out_pos, out_mass = pm.paint_vjp(v, pos, mass=mass)

    def obj(pos, mass):
        return jnp.sum(pm.paint(pos, mass=mass).value * v.value)
    g_pos, g_mass = jax.grad(obj, argnums=(0, 1))(pos, mass)
    assert_allclose(np.asarray(out_pos), np.asarray(g_pos), atol=1e-12)
    assert_allclose(np.asarray(out_mass), np.asarray(g_mass), atol=1e-12)


def test_decompress_vjp():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4])
    c = pm.create(type='complex', value=1.0)
    d = type(c).decompress_vjp(c)
    v = np.asarray(d.value)
    # self-conjugate modes (0/nyquist combos) weight 1; others 2
    assert_allclose(v[0, 0], 1.0)
    assert_allclose(v[1, 1], 2.0)


def test_c2r_vjp_scale():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4])
    rng = np.random.RandomState(42)
    real = pm.create(type='real', value=rng.uniform(size=(4, 4)))
    out = RealField.c2r_vjp(real)
    expect = real.r2c().value * 16.0
    assert_allclose(np.asarray(out.value), np.asarray(expect), atol=1e-12)


def test_jvp_composes_with_explicit_methods():
    """jax.jvp through paint/readout must equal the reference-style
    explicit *_jvp operators (reference pm.py:848-859, 1872-1888) —
    the custom_vjp form used to make forward mode raise."""
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4, 4])
    rng = np.random.RandomState(11)
    pos = jnp.asarray(rng.uniform(0, 8, (30, 3)))
    mass = jnp.asarray(rng.uniform(0.5, 2.0, 30))
    v_pos = jnp.asarray(rng.normal(size=(30, 3)))
    v_mass = jnp.asarray(rng.normal(size=30))

    # paint jvp
    def f(pos, mass):
        return pm.paint(pos, mass=mass).value

    out, tangent = jax.jvp(f, (pos, mass), (v_pos, v_mass))
    want = pm.paint_jvp(pos, mass=mass, v_pos=v_pos, v_mass=v_mass)
    assert_allclose(np.asarray(tangent), np.asarray(want.value),
                    rtol=1e-10, atol=1e-12)

    # readout jvp
    mesh = pm.create(type='real',
                     value=rng.normal(size=(4, 4, 4)))
    v_mesh = pm.create(type='real',
                       value=rng.normal(size=(4, 4, 4)))

    def g(mv, pos):
        f2 = pm.create(type='real', value=mv)
        return f2.readout(pos)

    out, tangent = jax.jvp(g, (mesh.value, pos),
                           (v_mesh.value, v_pos))
    want = mesh.readout_jvp(pos, v_self=v_mesh, v_pos=v_pos)
    assert_allclose(np.asarray(tangent), np.asarray(want),
                    rtol=1e-10, atol=1e-12)

    # second-order composition: jvp of grad (was impossible before)
    def loss(pos):
        return jnp.sum(pm.paint(pos).value ** 2)

    gfun = jax.grad(loss)
    _, hvp = jax.jvp(gfun, (pos,), (v_pos,))
    assert np.isfinite(np.asarray(hvp)).all()


def test_mxu_force_grad_matches_xla():
    """reverse-mode AD through the MXU force path: the force triple
    is linear with odd real kernels (T_d^T = -T_d), wired via
    jax.custom_derivatives.linear_call in Solver._mxu_force_meshes.
    The gradient must match the differentiable XLA-field path on
    both the non-ct fallback (N=16, whole-triple backward) and the
    ct2 production pipeline (N=256, single-direction ``only=``
    backward), single-device and sharded."""
    from pmesh_tpu.models.fastpm import Solver
    from pmesh_tpu.parallel.pmesh import ProcessMesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    def obj(s, d, fft):
        F = s.force_lattice(d, bounds=(0., 1.), fft=fft)
        return jnp.sum(F[0] ** 2 + 2 * F[1] ** 2 + 3 * F[2] ** 2)

    for N, tol in ((16, 5e-6), (256, 5e-4)):
        pm = ParticleMesh(Nmesh=[N] * 3, BoxSize=float(N), dtype='f4')
        s = Solver(pm)
        rng = np.random.RandomState(0)
        disp = tuple(jnp.asarray(rng.uniform(0, 1, (N,) * 3),
                                 jnp.float32) for _ in range(3))
        gx = jax.grad(lambda d: obj(s, d, 'xla'))(disp)
        gm = jax.grad(lambda d: obj(s, d, 'mxu'))(disp)
        for a, b in zip(gm, gx):
            e = float(jnp.max(jnp.abs(a - b)))
            sc = float(jnp.max(jnp.abs(b))) + 1e-30
            assert e / sc < tol, (N, e / sc)
        if N == 256:
            # sharded ct2: the only= backward goes through the
            # local_only shard_map body (one x-pass + a2a + zy-inv)
            pmesh8 = ProcessMesh(jax.devices()[:8])
            pm8 = ParticleMesh(Nmesh=[N] * 3, BoxSize=float(N),
                               dtype='f4', procmesh=pmesh8)
            s8 = Solver(pm8)
            sh = NamedSharding(pmesh8.mesh, P('x', None, None))
            dsh = tuple(jax.device_put(d, sh) for d in disp)
            g8 = jax.grad(lambda d: obj(s8, d, 'mxu'))(dsh)
            for a, b in zip(g8, gm):
                e = float(jnp.max(jnp.abs(a - b)))
                sc = float(jnp.max(jnp.abs(b))) + 1e-30
                assert e / sc < 1e-5, e / sc
