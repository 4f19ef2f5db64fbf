"""Window kernel tests, mirroring pmesh/tests/test_window.py.

Exact CIC paint matrices, wide/scaled kernels, periodic wrap, affine
shift/scale, anisotropic meshes, derivative kernels, tuned-vs-generic
equivalence and the Fourier-window compensation round trip.
"""
import numpy as np
from numpy.testing import assert_array_equal, assert_allclose

from pmesh_tpu import window
from pmesh_tpu.window import CIC, TSC, LANCZOS2, DB12, Affine


def test_unweighted():
    real = np.zeros((4, 4))
    pos = [
        [0., 0.],
        [1., 1.],
        [2., 2.],
        [3., 3.],
    ]
    real = CIC.paint(real, pos)
    assert_array_equal(real,
                       [[1, 0, 0, 0],
                        [0, 1, 0, 0],
                        [0, 0, 1, 0],
                        [0, 0, 0, 1]])


def test_weighted():
    real = np.zeros((4, 4))
    pos = [
        [0., 0.],
        [1., 1.],
        [2., 2.],
        [3., 3.],
    ]
    mass = [0, 1, 2, 3]
    real = CIC.paint(real, pos, mass=mass)
    assert_array_equal(real,
                       [[0, 0, 0, 0],
                        [0, 1, 0, 0],
                        [0, 0, 2, 0],
                        [0, 0, 0, 3]])


def test_wide():
    wcic = window.ResampleWindow("linear", 4)
    real = np.zeros((4))
    pos = [[1.5]]
    real = wcic.paint(real, pos)
    assert_allclose(real, [0.125, 0.375, 0.375, 0.125])


def test_wide_2d():
    wcic = window.ResampleWindow("linear", 4)
    real = np.zeros((4, 4))
    pos = [[1.5, 1.5]]
    real = wcic.paint(real, pos)
    assert_allclose(real.sum(), 1.0)


def test_hsml():
    # hsml scales the kernel per particle, equivalent to resizing
    wcic = window.ResampleWindow("linear", 2)
    real1 = np.zeros((4,))
    real1 = wcic.paint(real1, [[1.5]], hsml=[2.0])
    wcic4 = window.ResampleWindow("linear", 4)
    real2 = np.zeros((4,))
    real2 = wcic4.paint(real2, [[1.5]])
    assert_allclose(real1, real2)


def test_wrap():
    real = np.zeros((4, 4))
    pos = [[-.5, -.5]]
    affine = Affine(2, period=4)
    real = CIC.paint(real, pos, transform=affine)
    assert_allclose(real,
                    [[0.25, 0, 0, 0.25],
                     [0, 0, 0, 0],
                     [0, 0, 0, 0],
                     [0.25, 0, 0, 0.25]])


def test_wrap_straddle():
    real = np.zeros((4, 4))
    pos = [[3.5, 3.5]]
    affine = Affine(2, period=4)
    real = CIC.paint(real, pos, transform=affine)
    assert_allclose(real,
                    [[0.25, 0, 0, 0.25],
                     [0, 0, 0, 0],
                     [0, 0, 0, 0],
                     [0.25, 0, 0, 0.25]])


def test_translate():
    real = np.zeros((4, 4))
    pos = [[1., 1.]]
    affine = Affine(2, translate=[-1, -1])
    real = CIC.paint(real, pos, transform=affine)
    assert_allclose(real,
                    [[1, 0, 0, 0],
                     [0, 0, 0, 0],
                     [0, 0, 0, 0],
                     [0, 0, 0, 0]])


def test_scale():
    real = np.zeros((4, 4))
    pos = [[2., 2.]]
    affine = Affine(2, scale=0.5)
    real = CIC.paint(real, pos, transform=affine)
    assert_allclose(real,
                    [[0, 0, 0, 0],
                     [0, 1, 0, 0],
                     [0, 0, 0, 0],
                     [0, 0, 0, 0]])


def test_anisotropic():
    real = np.zeros((4, 8))
    pos = [[0., 0.], [1., 1.], [2., 2.], [3., 3.]]
    real = CIC.paint(real, pos)
    truth = np.zeros((4, 8))
    for i in range(4):
        truth[i, i] = 1
    assert_array_equal(real, truth)


def test_readout():
    real = np.ones((4, 4))
    pos = [[1.5, 1.5], [0., 0.]]
    v = CIC.readout(real, pos)
    assert_allclose(v, [1.0, 1.0])


def test_readout_wide():
    wcic = window.ResampleWindow("linear", 4)
    real = np.zeros((4,))
    real[1] = 1.0
    v = wcic.readout(real, [[1.5]])
    assert_allclose(v, [0.375])


def test_diff():
    # gradient kernel: d/dx of readout of a linear ramp is the slope
    real = np.arange(8, dtype='f8')[:, None] * np.ones((8, 8))
    pos = [[3.5, 4.0]]
    v = CIC.readout(real, pos, diffdir=0)
    assert_allclose(v, [1.0])
    v = CIC.readout(real, pos, diffdir=1)
    assert_allclose(v, [0.0], atol=1e-12)


def test_tsc():
    real = np.zeros((5,))
    real = TSC.paint(real, [[2.]])
    assert_allclose(real, [0, 0.125, 0.75, 0.125, 0])


def test_tsc_offcenter():
    real = np.zeros((5,))
    real = TSC.paint(real, [[2.5]])
    # TSC at midpoint: [1/8? ...] each side of the two nearest cells
    assert_allclose(real.sum(), 1.0)
    assert_allclose(real[2], real[3])


def test_pcs():
    real = np.zeros((6,))
    real = window.PCS.paint(real, [[2.5]])
    assert_allclose(real.sum(), 1.0, rtol=1e-7)


def test_lanczos2():
    real = np.zeros((8,))
    real = LANCZOS2.paint(real, [[4.0]])
    # lanczos kernel integrates to ~1 but discrete sum deviates slightly
    assert abs(real.sum() - 1.0) < 5e-2
    assert real.argmax() == 4


def test_db12():
    real = np.zeros((24,))
    real = DB12.paint(real, [[12.0]])
    assert abs(real.sum()) > 0.1  # nontrivial
    v = DB12.readout(np.asarray(real), [[12.0]])
    assert np.isfinite(v).all()


def test_tuned_equals_generic():
    # reference: test_cic_tuned / test_tsc_tuned (test_window.py:311-361)
    rng = np.random.RandomState(42)
    pos = rng.uniform(0, 8, size=(100, 3))
    affine = Affine(3, period=8)
    for tuned, generic in [('cic', 'linear'), ('tsc', 'quadratic'),
                           ('nnb', 'nearest'), ('pcs', 'cubic')]:
        r1 = window.windows[tuned].paint(np.zeros((8, 8, 8)), pos,
                                         transform=affine)
        r2 = window.windows[generic].paint(np.zeros((8, 8, 8)), pos,
                                           transform=affine)
        assert_allclose(r1, r2, atol=1e-12)


def test_compensation_roundtrip():
    # paint a uniform grid, compensate in fourier space -> flat field
    # (reference test_window.py:362+)
    from pmesh_tpu import ParticleMesh
    pm = ParticleMesh(Nmesh=[8, 8], BoxSize=8.0, resampler='cic')
    import numpy as np
    q = pm.generate_uniform_particle_grid(shift=0.5)
    real = pm.paint(q)
    c = real.r2c()
    c = c.apply(pm.resampler.get_compensation(), kind='circular')
    real2 = c.c2r()
    # total mass conserved
    assert_allclose(np.asarray(real2.value).sum(),
                    np.asarray(real.value).sum(), rtol=1e-6)


def test_fwindow():
    w = np.linspace(-np.pi, np.pi, 33)
    T = CIC.get_fwindow(w)
    assert_allclose(np.asarray(T)[16], 1.0)  # w=0
    assert (np.asarray(T) <= 1.0 + 1e-12).all()


def test_resize_support():
    w = window.ResampleWindow('linear', 4)
    assert w.support == 4
