"""Lattice-structured paint/readout (ops/gridpm.py) vs the generic
particle path — the two must agree exactly for lattice particles."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pmesh_tpu.ops import paint as generic
from pmesh_tpu.ops import gridpm


def _lattice_pos(disp):
    """positions (M, ndim) of lattice particles displaced by disp."""
    shape = disp[0].shape
    q = np.stack(np.meshgrid(*[np.arange(n) for n in shape],
                             indexing='ij'), axis=-1).reshape(-1,
                                                              len(shape))
    s = np.stack([np.asarray(d).ravel() for d in disp], axis=-1)
    return q + s


@pytest.mark.parametrize("window", ['nearest', 'cic', 'tsc', 'pcs'])
def test_paint_grid_matches_generic(window):
    rng = np.random.RandomState(5)
    n = 8
    disp = tuple(jnp.asarray(rng.uniform(-1.5, 2.5, (n, n, n)), jnp.float64)
                 for _ in range(3))
    rho = gridpm.paint_grid(disp, bounds=(-1.5, 2.5), window=window)

    pos = _lattice_pos(disp)
    truth = generic.paint(jnp.zeros((n, n, n), jnp.float64), pos,
                          window=window, period=n)
    np.testing.assert_allclose(np.asarray(rho), np.asarray(truth),
                               atol=1e-12)
    np.testing.assert_allclose(float(rho.sum()), n ** 3, rtol=1e-12)


@pytest.mark.parametrize("window", ['cic', 'tsc'])
def test_readout_grid_matches_generic(window):
    rng = np.random.RandomState(6)
    n = 8
    mesh = jnp.asarray(rng.normal(size=(n, n, n)))
    disp = tuple(jnp.asarray(rng.uniform(0, 2.0, (n, n, n)), jnp.float64)
                 for _ in range(3))
    got = gridpm.readout_grid(mesh, disp, bounds=(0.0, 2.0),
                              window=window)

    pos = _lattice_pos(disp)
    truth = generic.readout(mesh, pos, window=window, period=n)
    np.testing.assert_allclose(np.asarray(got).ravel(),
                               np.asarray(truth), atol=1e-12)


def test_readout_grid_multi_mesh():
    rng = np.random.RandomState(7)
    n = 6
    meshes = tuple(jnp.asarray(rng.normal(size=(n, n, n)))
                   for _ in range(3))
    disp = tuple(jnp.asarray(rng.uniform(0, 1.0, (n, n, n)))
                 for _ in range(3))
    got = gridpm.readout_grid(meshes, disp, bounds=(0.0, 1.0))
    for m, g in zip(meshes, got):
        one = gridpm.readout_grid(m, disp, bounds=(0.0, 1.0))
        np.testing.assert_allclose(np.asarray(g), np.asarray(one))


def test_paint_grid_2d():
    rng = np.random.RandomState(8)
    n = 16
    disp = tuple(jnp.asarray(rng.uniform(0, 1.0, (n, n)))
                 for _ in range(2))
    rho = gridpm.paint_grid(disp, bounds=(0.0, 1.0))
    pos = _lattice_pos(disp)
    truth = generic.paint(jnp.zeros((n, n)), pos, window='cic', period=n)
    np.testing.assert_allclose(np.asarray(rho), np.asarray(truth),
                               atol=1e-6)


def test_paint_grid_jit_grad_mass():
    """d(sum(rho^2))/d(mass-mesh) via jax.grad vs finite differences."""
    rng = np.random.RandomState(9)
    n = 6
    disp = tuple(jnp.asarray(rng.uniform(0, 1.0, (n, n, n)))
                 for _ in range(3))
    mass = jnp.asarray(1.0 + 0.1 * rng.normal(size=(n, n, n)))

    def obj(mass):
        rho = gridpm.paint_grid(disp, mass=mass, bounds=(0.0, 1.0))
        return jnp.sum(rho ** 2)

    g = jax.jit(jax.grad(obj))(mass)
    eps = 1e-5
    i = (1, 2, 3)
    m1 = mass.at[i].add(eps)
    m2 = mass.at[i].add(-eps)
    fd = (obj(m1) - obj(m2)) / (2 * eps)
    np.testing.assert_allclose(float(g[i]), float(fd), rtol=1e-4)


def test_paint_grid_grad_disp():
    rng = np.random.RandomState(10)
    n = 6
    disp = tuple(jnp.asarray(rng.uniform(0.1, 0.9, (n, n, n)))
                 for _ in range(3))
    target = jnp.asarray(rng.normal(size=(n, n, n)))

    def obj(disp):
        rho = gridpm.paint_grid(disp, bounds=(-0.5, 1.5))
        return jnp.sum(rho * target)

    g = jax.grad(obj)(disp)
    eps = 1e-5
    i = (2, 3, 4)
    for d in range(3):
        dd = list(disp)
        dd[d] = disp[d].at[i].add(eps)
        f1 = obj(tuple(dd))
        dd[d] = disp[d].at[i].add(-eps)
        f2 = obj(tuple(dd))
        fd = (f1 - f2) / (2 * eps)
        np.testing.assert_allclose(float(g[d][i]), float(fd), rtol=1e-4,
                                   atol=1e-8)


def test_readout_grid_grad():
    rng = np.random.RandomState(11)
    n = 6
    mesh = jnp.asarray(rng.normal(size=(n, n, n)))
    disp = tuple(jnp.asarray(rng.uniform(0.1, 0.9, (n, n, n)))
                 for _ in range(3))

    def obj(mesh, disp):
        val = gridpm.readout_grid(mesh, disp, bounds=(-0.5, 1.5))
        return jnp.sum(val ** 2)

    gm, gd = jax.jit(jax.grad(obj, argnums=(0, 1)))(mesh, disp)
    eps = 1e-5
    i = (1, 4, 2)
    fd = (obj(mesh.at[i].add(eps), disp)
          - obj(mesh.at[i].add(-eps), disp)) / (2 * eps)
    np.testing.assert_allclose(float(gm[i]), float(fd), rtol=1e-4)
    for d in range(3):
        dd = list(disp)
        dd[d] = disp[d].at[i].add(eps)
        f1 = obj(mesh, tuple(dd))
        dd[d] = disp[d].at[i].add(-eps)
        f2 = obj(mesh, tuple(dd))
        np.testing.assert_allclose(float(gd[d][i]),
                                   float((f1 - f2) / (2 * eps)),
                                   rtol=1e-4, atol=1e-8)


def test_out_of_bounds_raises_on_limit():
    disp = tuple(jnp.zeros((4, 4, 4)) for _ in range(3))
    with pytest.raises(ValueError):
        gridpm.paint_grid(disp, bounds=(-200.0, 200.0))


def test_bounds_helper():
    disp = (jnp.asarray([-0.5, 2.0]), jnp.asarray([0.1, 0.3]))
    lo, hi = gridpm.displacement_bounds(disp)
    assert float(lo) == -0.5 and float(hi) == 2.0


def test_impl_pallas_matches_xla():
    rng = np.random.RandomState(12)
    n = 8
    disp = tuple(jnp.asarray(rng.uniform(-1.0, 2.0, (n, n, n)))
                 for _ in range(3))
    mass = jnp.asarray(1.0 + 0.2 * rng.normal(size=(n, n, n)))
    mesh = jnp.asarray(rng.normal(size=(n, n, n)))
    import pmesh_tpu.ops.gridpm as gp
    outs = {}
    for impl in ('xla', 'pallas'):
        old, gp.IMPL = gp.IMPL, impl
        try:
            outs[impl] = (
                gp.paint_grid(disp, mass=mass, bounds=(-1.0, 2.0)),
                gp.readout_grid(mesh, disp, bounds=(-1.0, 2.0)))
        finally:
            gp.IMPL = old
    np.testing.assert_allclose(np.asarray(outs['xla'][0]),
                               np.asarray(outs['pallas'][0]),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(outs['xla'][1]),
                               np.asarray(outs['pallas'][1]),
                               atol=1e-12)


def test_pallas_offset_chunking_matches_xla():
    """Wide offset ranges must chunk the sliding-window refs and still
    match the XLA formulation exactly."""
    import pmesh_tpu.ops.gridpm as gp
    import pmesh_tpu.ops.gridpm_pallas as gpp
    rng = np.random.RandomState(14)
    n = 8
    disp = tuple(jnp.asarray(rng.uniform(-4.0, 5.0, (n, n, n)))
                 for _ in range(3))
    mesh = jnp.asarray(rng.normal(size=(n, n, n)))
    old_budget, gpp._REF_BUDGET_BYTES = gpp._REF_BUDGET_BYTES, \
        8 * n * n * 8 * 2 * 4   # forces ~2-3 offsets per chunk
    old_impl, gp.IMPL = gp.IMPL, 'pallas'
    try:
        rho_p = gp.paint_grid(disp, bounds=(-4.0, 5.0))
        got_p = gp.readout_grid(mesh, disp, bounds=(-4.0, 5.0))
    finally:
        gpp._REF_BUDGET_BYTES = old_budget
        gp.IMPL = old_impl
    rho_x = gp.paint_grid(disp, bounds=(-4.0, 5.0), impl='xla')
    got_x = gp.readout_grid(mesh, disp, bounds=(-4.0, 5.0), impl='xla')
    np.testing.assert_allclose(np.asarray(rho_p), np.asarray(rho_x),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(got_x),
                               atol=1e-12)


def test_anisotropic_mesh_paths():
    """Anisotropic Nmesh through the field API, lattice ops and the
    MXU FFT (reference test_window.py:155-167 covers anisotropy)."""
    from pmesh_tpu import ParticleMesh
    from pmesh_tpu.ops import fft_mxu
    from pmesh_tpu.ops import fft_mxu_ref
    rng = np.random.RandomState(15)
    shape = (4, 8, 16)
    pm = ParticleMesh(Nmesh=list(shape), BoxSize=[4.0, 8.0, 16.0],
                      dtype='f8', resampler='cic')
    pos = jnp.asarray(rng.uniform(0, 4, (200, 3))
                      * np.array([1.0, 2.0, 4.0]))
    rho = pm.paint(pos)
    np.testing.assert_allclose(float(rho.value.sum()), 200.0,
                               rtol=1e-12)
    back = rho.r2c().c2r()
    np.testing.assert_allclose(np.asarray(back.value),
                               np.asarray(rho.value), atol=1e-10)

    # lattice ops on an anisotropic mesh
    disp = tuple(jnp.asarray(rng.uniform(0, 1.0, shape))
                 for _ in range(3))
    lat = gridpm.paint_grid(disp, bounds=(0.0, 1.0))
    np.testing.assert_allclose(float(lat.sum()), float(np.prod(shape)),
                               rtol=1e-12)
    q = np.stack(np.meshgrid(*[np.arange(n) for n in shape],
                             indexing='ij'), -1).reshape(-1, 3)
    s = np.stack([np.asarray(d).ravel() for d in disp], -1)
    from pmesh_tpu.ops import paint as generic
    truth = generic.paint(jnp.zeros(shape), q + s, window='cic',
                          period=np.array(shape))
    np.testing.assert_allclose(np.asarray(lat), np.asarray(truth),
                               atol=1e-12)

    # MXU FFT full and half on anisotropic shapes
    x = rng.normal(size=shape).astype('f4')
    r, i = fft_mxu_ref.fft3_real_forward(jnp.asarray(x))
    tr = np.fft.fftn(x) / x.size
    assert np.abs(np.asarray(r) + 1j * np.asarray(i) - tr).max() \
        < 1e-5 * np.abs(tr).max() + 1e-7
    rh, ih = fft_mxu.fft3_real_forward_half(jnp.asarray(x))
    trh = np.fft.rfftn(x) / x.size
    assert np.abs(np.asarray(rh) + 1j * np.asarray(ih) - trh).max() \
        < 1e-5 * np.abs(trh).max() + 1e-7


def test_multi_diff_readout_fused():
    """diffdir='all': the 3 derivative readouts of ONE mesh in a
    single fused pallas pass (shared plane rolls — the gradient-mode
    force family) match the per-direction readouts, in both kernel
    branches (unrolled and fori) and sharded."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pmesh_tpu.ops import gridpm as gp
    from pmesh_tpu.ops import gridpm_pallas as gpp
    from pmesh_tpu.parallel.pmesh import ProcessMesh

    N = 32
    rng = np.random.RandomState(3)
    mesh = jnp.asarray(rng.normal(size=(N,) * 3), jnp.float32)
    disp = tuple(jnp.asarray(rng.uniform(0, 1, (N,) * 3), jnp.float32)
                 for _ in range(3))
    ones = [gp.readout_grid(mesh, disp, bounds=(0., 1.), diffdir=d,
                            impl='xla') for d in range(3)]

    # fori branch (large chunks) and unrolled branch (1-offset chunks)
    for budget in (72, 1):
        old = gpp._REF_BUDGET_BYTES
        gpp._REF_BUDGET_BYTES = budget * 1024 * 1024
        try:
            alls = gp.readout_grid(mesh, disp, bounds=(0., 1.),
                                   diffdir='all', impl='pallas')
        finally:
            gpp._REF_BUDGET_BYTES = old
        for d in range(3):
            np.testing.assert_allclose(np.asarray(alls[d]),
                                       np.asarray(ones[d]), atol=2e-6)

    pm8 = ProcessMesh(jax.devices()[:8])
    sh = NamedSharding(pm8.mesh, P('x', None, None))
    msh = jax.device_put(mesh, sh)
    dsh = tuple(jax.device_put(x, sh) for x in disp)
    alls8 = gp.readout_grid(msh, dsh, bounds=(0., 1.), diffdir='all',
                            impl='pallas', procmesh=pm8)
    for d in range(3):
        np.testing.assert_allclose(np.asarray(alls8[d]),
                                   np.asarray(ones[d]), atol=2e-6)


def test_gradient_mode_mxu_matches_xla():
    """force_lattice(mode='gradient', fft='mxu'): the ct2 Poisson
    potential (one x-pass + one zy-inverse) + fused diffdir='all'
    readout matches the field-path gradient force; at non-ct sizes
    the mxu request falls back to the field path exactly."""
    from pmesh_tpu import ParticleMesh
    from pmesh_tpu.models.fastpm import Solver
    for N, tol in ((16, 0.0), (256, None)):
        pm = ParticleMesh(Nmesh=[N] * 3, BoxSize=float(N), dtype='f4')
        s = Solver(pm)
        rng = np.random.RandomState(0)
        disp = tuple(jnp.asarray(rng.uniform(0, 1, (N,) * 3),
                                 jnp.float32) for _ in range(3))
        Fx = s.force_lattice(disp, bounds=(0., 1.), mode='gradient',
                             fft='xla')
        Fm = s.force_lattice(disp, bounds=(0., 1.), mode='gradient',
                             fft='mxu')
        for d in range(3):
            e = float(jnp.max(jnp.abs(Fm[d] - Fx[d])))
            sc = float(jnp.max(jnp.abs(Fx[d])))
            if tol == 0.0:
                assert e == 0.0          # same (field) path exactly
            else:
                # d=0 runs through the chunk-permuted x storage with
                # different f32 accumulation order: ~8e-5 max-rel
                assert e / sc < 2e-4, (N, d, e / sc)
