"""Field/engine API tests, mirroring pmesh/tests/test_pm.py.

Shapes, r2c∘c2r round trips (f4/f8/c2c), apply kinds, ravel ordering,
Fourier resampling, cgetitem/csetitem hermitian bookkeeping, slab
coordinates, previews, uniform particle grids, paint/readout pipeline.
"""
import numpy as np
from numpy.testing import assert_array_equal, assert_allclose
import pytest

from pmesh_tpu import (ParticleMesh, RealField, ComplexField,
                       TransposedComplexField, UntransposedComplexField)


def test_shape_real():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4])
    real = pm.create(type='real')
    assert real.shape == (4, 4)
    assert real.csize == 16
    assert (real.cshape == [4, 4]).all()


def test_shape_complex():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4])
    comp = pm.create(type='complex')
    assert comp.shape == (4, 3)
    assert comp.compressed
    assert comp.csize == 12


def test_shape_c2c():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4], dtype='complex128')
    comp = pm.create(type='complex')
    assert comp.shape == (4, 4)
    assert not comp.compressed
    real = pm.create(type='real')
    assert real.shape == (4, 4)
    assert real.dtype == np.dtype('complex128')


@pytest.mark.parametrize("dtype", ['f8', 'f4'])
def test_fft_roundtrip(dtype):
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[8, 8, 8], dtype=dtype)
    rng = np.random.RandomState(42)
    real = pm.create(type='real', value=rng.uniform(size=(8, 8, 8)))
    comp = real.r2c()
    real2 = comp.c2r()
    decimal = 7 if dtype == 'f8' else 4
    assert_allclose(np.asarray(real2.value), np.asarray(real.value),
                    atol=10.0 ** -decimal)


def test_fft_roundtrip_c2c():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[8, 8], dtype='complex128')
    rng = np.random.RandomState(42)
    v = rng.uniform(size=(8, 8)) + 1j * rng.uniform(size=(8, 8))
    real = pm.create(type='real', value=v)
    comp = real.r2c()
    real2 = comp.c2r()
    assert_allclose(np.asarray(real2.value), v, atol=1e-12)


def test_fft_normalization():
    # r2c of a constant field: DC mode equals the constant
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4])
    real = pm.create(type='real', value=3.0)
    comp = real.r2c()
    assert_allclose(comp.cgetitem([0, 0]), 3.0)


def test_whitenoise_untransposed_matches_transposed():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[8, 8, 8])
    c1 = pm.generate_whitenoise(seed=123, type='untransposedcomplex',
                                compat='native')
    c2 = pm.generate_whitenoise(seed=123, type='transposedcomplex',
                                compat='native')
    assert_allclose(np.asarray(c1.value), np.asarray(c2.value))


def test_apply_wavenumber():
    pm = ParticleMesh(BoxSize=2 * np.pi * 8, Nmesh=[8, 8])
    comp = pm.create(type='complex', value=1.0)

    def laplace(k, v):
        k2 = k.normp(2, zeromode=1.0)
        return v / k2

    comp2 = comp.apply(laplace)
    # k = 2 pi / L * m with L = 2 pi * 8: k = m / 8
    # mode (1, 0): k2 = 1/64
    assert_allclose(comp2.cgetitem([1, 0]), 64.0)
    assert_allclose(comp2.cgetitem([0, 0]), 1.0)


def test_apply_circular():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[8, 8])
    comp = pm.create(type='complex', value=1.0)
    out = comp.apply(lambda w, v: v * 0 + sum(wi for wi in w),
                     kind='circular')
    assert_allclose(out.cgetitem([1, 0]), 2 * np.pi / 8)


def test_apply_index():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4])
    real = pm.create(type='real', value=0.0)
    out = real.apply(lambda i, v: v + i[0] * 4 + i[1], kind='index')
    assert_allclose(np.asarray(out.value).ravel(), np.arange(16))


def test_apply_inplace():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4])
    real = pm.create(type='real', value=1.0)
    r2 = real.apply(lambda x, v: v * 2, out=Ellipsis)
    assert r2 is real
    assert_allclose(np.asarray(real.value), 2.0)


def test_real_apply_relative():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4])
    real = pm.create(type='real')
    out = real.apply(lambda x, v: v * 0 + x[0], kind='relative')
    # x = r * L/N with r in [-2,...,1]: values 0, 2, -4, -2 along axis 0
    assert_allclose(np.asarray(out.value)[:, 0], [0, 2, -4, -2])


def test_cgetitem_csetitem_real():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4])
    real = pm.create(type='real', value=0.0)
    real.csetitem([1, 3], 5.0)
    assert real.cgetitem([1, 3]) == 5.0
    assert real.cgetitem([1, -1]) == 5.0


def test_csetitem_hermitian():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[8, 8])
    comp = pm.create(type='complex', value=0.0)
    # mode (1, 1) is stored; its conjugate (7, 7) maps outside the
    # compressed half space, so only one entry is updated.
    y = comp.csetitem([1, 1], 1 + 1j)
    assert_allclose(comp.cgetitem([1, 1]), 1 + 1j)
    # self-conjugate mode must come out real
    comp.csetitem([0, 0], 3 + 4j)
    v = comp.cgetitem([0, 0])
    assert_allclose(np.imag(v), 0)


def test_csetitem_dual_updates():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[8, 8])
    comp = pm.create(type='complex', value=0.0)
    # mode (1, 0): dual is (7, 0), also stored in compressed layout.
    comp.csetitem([1, 0], 1 + 2j)
    assert_allclose(comp.cgetitem([1, 0]), 1 + 2j)
    assert_allclose(comp.cgetitem([7, 0]), 1 - 2j)
    assert_allclose(comp.cgetitem([-1, 0]), 1 - 2j)


def test_ravel_matches_c_order():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4])
    rng = np.random.RandomState(1)
    v = rng.uniform(size=(4, 4))
    real = pm.create(type='real', value=v)
    flat = np.asarray(real.ravel())
    assert_array_equal(flat, v.ravel())
    real2 = pm.create(type='real')
    real2.unravel(flat)
    assert_array_equal(np.asarray(real2.value), v)


def test_paint_readout_roundtrip():
    # the canonical smoke config (SURVEY.md step 1): 64^3 reduced to
    # 16^3 for CPU test speed
    pm = ParticleMesh(BoxSize=16.0, Nmesh=[16, 16, 16], resampler='cic')
    rng = np.random.RandomState(7)
    npart = 1000
    pos = rng.uniform(0, 16.0, size=(npart, 3))
    layout = pm.decompose(pos)
    real = pm.paint(pos, layout=layout)
    # total mass conserved exactly (paint conserves mass)
    assert_allclose(float(real.csum()), npart, rtol=1e-10)
    # fourier round trip then readout
    comp = real.r2c()
    real2 = comp.c2r()
    v1 = np.asarray(real.readout(pos, layout=layout))
    v2 = np.asarray(real2.readout(pos, layout=layout))
    assert_allclose(v1, v2, atol=1e-8)


def test_paint_hold():
    pm = ParticleMesh(BoxSize=4.0, Nmesh=[4, 4])
    pos = np.array([[0.5, 0.5]])
    out = pm.create(type='real')
    out = pm.paint(pos, out=out, hold=False)
    out = pm.paint(pos, out=out, hold=True)
    assert_allclose(float(out.csum()), 2.0)


def test_paint_gradient_direction():
    pm = ParticleMesh(BoxSize=4.0, Nmesh=[8, 8])
    pos = np.array([[1.3, 2.1]])
    g = pm.paint(pos, gradient=0)
    # gradient kernel sums to ~零
    assert abs(float(g.csum())) < 1e-8


def test_cmean_cdot():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4])
    real = pm.create(type='real', value=2.0)
    assert_allclose(float(real.cmean()), 2.0)
    assert_allclose(float(real.csum()), 32.0)
    assert_allclose(float(real.cnorm()), 4.0 * 16)


def test_cdot_complex_matches_real():
    # cdot of complex fields ~ real-space dot / Nmesh.prod (pm.py:948)
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[8, 8])
    rng = np.random.RandomState(3)
    r1 = pm.create(type='real', value=rng.uniform(size=(8, 8)))
    r2 = pm.create(type='real', value=rng.uniform(size=(8, 8)))
    c1 = r1.r2c()
    c2 = r2.r2c()
    d1 = complex(c1.cdot(c2))
    d2 = float(r1.cdot(r2)) / pm.Nmesh.prod()
    assert_allclose(d1.real, d2, rtol=1e-10)


def test_cnorm():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[8, 8])
    rng = np.random.RandomState(3)
    r1 = pm.create(type='real', value=rng.uniform(size=(8, 8)))
    c1 = r1.r2c()
    assert_allclose(float(c1.cnorm()), float(c1.cdot(c1).real), rtol=1e-10)


def test_resample_downsample_preserves_modes():
    # reference test_pm.py:416-537: fourier-space resampling truth
    pm1 = ParticleMesh(BoxSize=8.0, Nmesh=[8, 8])
    pm2 = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4])
    comp = pm1.create(type='complex', value=0.0)
    comp.csetitem([1, 1], 1.0 + 1j)
    out = pm2.create(type='complex')
    comp.resample(out)
    assert_allclose(out.cgetitem([1, 1]), 1.0 + 1j, atol=1e-12)


def test_resample_cmean_conserved():
    # reference test_pm.py:472-489
    pm1 = ParticleMesh(BoxSize=8.0, Nmesh=[8, 8])
    pm2 = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4])
    rng = np.random.RandomState(5)
    real = pm1.create(type='real', value=rng.uniform(size=(8, 8)))
    out = pm2.create(type='real')
    real.resample(out)
    assert_allclose(float(out.cmean()), float(real.cmean()), rtol=1e-10)


def test_upsample_roundtrip_mean():
    pm1 = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4])
    pm2 = ParticleMesh(BoxSize=8.0, Nmesh=[8, 8])
    real = pm1.create(type='real', value=3.0)
    up = pm2.upsample(real, resampler='cic', keep_mean=True)
    assert_allclose(np.asarray(up.value), 3.0, rtol=1e-6)


def test_preview_projection():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4, 4])
    real = pm.create(type='real', value=1.0)
    proj = real.preview(axes=(0, 1))
    assert proj.shape == (4, 4)
    assert_allclose(proj, 4.0)


def test_preview_full():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4])
    rng = np.random.RandomState(5)
    v = rng.uniform(size=(4, 4))
    real = pm.create(type='real', value=v)
    assert_allclose(real.preview(), v)


def test_uniform_particle_grid():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4])
    grid = np.asarray(pm.generate_uniform_particle_grid(shift=0))
    assert grid.shape == (16, 2)
    assert grid.min() == 0
    assert grid.max() == 6.0
    grid, gid = pm.generate_uniform_particle_grid(shift=0, return_id=True)
    assert len(np.unique(gid)) == 16


def test_paint_uniform_grid_exact():
    # painting the unshifted uniform grid gives a uniform field
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4, 4], resampler='cic')
    q = pm.generate_uniform_particle_grid(shift=0)
    real = pm.paint(q)
    assert_allclose(np.asarray(real.value), 1.0, atol=1e-12)


def test_field_arith():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4])
    r1 = pm.create(type='real', value=1.0)
    r2 = pm.create(type='real', value=2.0)
    assert_allclose(np.asarray((r1 + r2).value), 3.0)
    assert_allclose(np.asarray((r1 - r2).value), -1.0)
    assert_allclose(np.asarray((r1 * r2).value), 2.0)
    assert_allclose(np.asarray((r1 / r2).value), 0.5)
    assert_allclose(np.asarray((r1 + 1).value), 2.0)
    assert_allclose(np.asarray((2 * r1).value), 2.0)
    assert_allclose(np.asarray((-r1).value), -1.0)
    assert_allclose(np.asarray(abs(-r1).value), 1.0)
    r1 += 1
    assert_allclose(np.asarray(r1.value), 2.0)
    r1[...] = 7.0
    assert_allclose(np.asarray(r1.value), 7.0)


def test_cast():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4])
    rng = np.random.RandomState(42)
    real = pm.create(type='real', value=rng.uniform(size=(4, 4)))
    c = real.cast(type='complex')
    r2 = c.cast(type='real')
    assert_allclose(np.asarray(r2.value), np.asarray(real.value),
                    atol=1e-12)
    u = c.cast(type='untransposedcomplex')
    assert_allclose(np.asarray(u.value), np.asarray(c.value))


def test_ctranspose():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 8])
    rng = np.random.RandomState(42)
    v = rng.uniform(size=(4, 8))
    real = pm.create(type='real', value=v)
    t = real.ctranspose([1, 0])
    assert t.shape == (8, 4)
    assert_allclose(np.asarray(t.value), v.T, atol=1e-12)


def test_reshape():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4])
    pm2 = pm.reshape(Nmesh=8)
    assert (pm2.Nmesh == [8, 8]).all()
    assert (pm2.BoxSize == pm.BoxSize).all()


def test_respawn():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4])
    pm2 = pm.respawn(pm.comm)
    assert (pm2.Nmesh == pm.Nmesh).all()


def test_decompose_api():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4])
    pos = np.array([[0.5, 0.5], [7.5, 7.5]])
    layout = pm.decompose(pos)
    assert layout.smoothing == 1.0  # cic support / 2
    localpos = layout.exchange(pos)
    assert_array_equal(np.asarray(localpos), pos)
    back = layout.gather(np.ones(2), mode='sum')
    assert_array_equal(np.asarray(back), [1, 1])


def test_slab_iter():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[4, 4, 4])
    real = pm.create(type='real', value=1.0)
    count = 0
    for x, slab in zip(real.slabs.x, real.slabs):
        assert len(x) == 3
        k2 = np.asarray(x.normp(2))
        assert np.ndim(slab) == 2
        count += 1
    assert count == 4


def test_whitenoise_resolution_invariance():
    # reference test_pm.py:634-652: generate at 16^3 and 32^3, resample
    # both down to 8^3, require equality of the shared low-k modes.
    pm16 = ParticleMesh(BoxSize=8.0, Nmesh=[16, 16, 16])
    pm32 = ParticleMesh(BoxSize=8.0, Nmesh=[32, 32, 32])
    pm8 = ParticleMesh(BoxSize=8.0, Nmesh=[8, 8, 8])
    c16 = pm16.generate_whitenoise(seed=99, type='complex')
    c32 = pm32.generate_whitenoise(seed=99, type='complex')
    d16 = pm8.create(type='complex')
    d32 = pm8.create(type='complex')
    c16.resample(d16)
    c32.resample(d32)
    assert_allclose(np.asarray(d16.value), np.asarray(d32.value),
                    atol=1e-13)


@pytest.mark.parametrize("shape", [(4, 4), (4, 4, 4)])
def test_cgetitem_csetitem_every_index(shape):
    """Exhaustive hermitian bookkeeping sweep (reference
    test_pm.py:561-631): for EVERY global mode index, csetitem's
    return value must be read back by cgetitem, and the conjugate
    dual must hold everywhere."""
    pm = ParticleMesh(Nmesh=list(shape), BoxSize=float(shape[0]),
                      dtype='f8')
    rng = np.random.RandomState(0)
    comp = pm.create(type='transposedcomplex')
    for flat in range(int(np.prod(shape))):
        ind = list(np.unravel_index(flat, shape))
        y = complex(rng.normal(), rng.normal())
        ret = comp.csetitem(ind, y)
        got = comp.cgetitem(ind)
        np.testing.assert_allclose(got, ret, atol=1e-12)
        dual = [(-i) % n for i, n in zip(ind, shape)]
        np.testing.assert_allclose(comp.cgetitem(dual),
                                   np.conjugate(got), atol=1e-12)
    # whatever bookkeeping happened, the field must stay hermitian:
    # its inverse transform is real and round-trips (c2r is the
    # unnormalized inverse of the 1/prod(N)-scaled r2c)
    real = comp.c2r()
    assert np.isfinite(np.asarray(real.value)).all()
    back = real.r2c()
    for flat in range(int(np.prod(shape))):
        ind = list(np.unravel_index(flat, shape))
        a = comp.cgetitem(ind)
        b = back.cgetitem(ind)
        np.testing.assert_allclose(a, b, atol=1e-10)
