"""Application smoke tests: Klein-Gordon, gravpm driver, LIC
(mirroring tests/test_lic.py + the app-level coverage the reference
exercises manually via examples/)."""
import numpy as np
from numpy.testing import assert_allclose
import jax.numpy as jnp

from pmesh_tpu import ParticleMesh
from pmesh_tpu.models import kleingordon
from pmesh_tpu.models.gravpm import run_sim
from pmesh_tpu.lic import lic


def test_kleingordon_scan_matches_python_loop():
    pm = ParticleMesh(BoxSize=32.0, Nmesh=[32, 32])
    u, du = kleingordon.ring_soliton_ic(pm)
    steps = np.linspace(0, 1.0, 21)
    r1 = kleingordon.kgsolver(steps, u, du, lambda u: jnp.sin(u))
    seen = []
    r2 = kleingordon.kgsolver(steps, u, du, lambda u: jnp.sin(u),
                              monitor=lambda t, dt, uk, duk:
                              seen.append(t))
    assert_allclose(np.asarray(r1.value), np.asarray(r2.value),
                    atol=1e-9)
    assert len(seen) == 21


def test_kleingordon_small_amplitude_dispersion():
    # linear limit (F=0 gives u_tt = nabla^2 u - u): a single k mode
    # oscillates at omega = sqrt(1 + k^2); check period roughly
    pm = ParticleMesh(BoxSize=2 * np.pi * 4, Nmesh=[16, 16])
    u = pm.create(type='real')
    kf = 2 * np.pi / float(pm.BoxSize[0])
    x = pm.create_coords('real')[0]
    A = 1e-3
    u = pm.create(type='real',
                  value=jnp.broadcast_to(A * jnp.cos(kf * 4 * x),
                                         (16, 16)))
    # kf*4 => k=1 in these units; omega = sqrt(2)
    du = pm.create(type='real')
    omega = np.sqrt(1 + 1.0)
    period = 2 * np.pi / omega
    steps = np.linspace(0, period, 200)
    r = kleingordon.kgsolver(steps, u, du, lambda u: 0 * u)
    # after one full period the field returns to the initial state
    assert_allclose(np.asarray(r.value), np.asarray(u.value),
                    atol=A * 0.05)


def test_gravpm_run():
    state, spectra = run_sim(nmesh=8, boxsize=64.0, boost=1, steps=3,
                             monitor_print=False, compat='native',
                             resampler='cic')
    a, k, p = spectra[-1]
    assert a == 1.0
    assert np.isfinite(p).all()
    assert np.isfinite(np.asarray(state.S)).all()


def test_gravpm_snapshot(tmp_path):
    # default container: bigfile (the reference ecosystem format)
    out = str(tmp_path / "run")
    state, spectra = run_sim(nmesh=8, boxsize=64.0, boost=1, steps=3,
                             monitor_print=False, compat='native',
                             resampler='cic', output=out)
    import glob
    snaps = glob.glob(out + "/snapshot_*")
    assert len(snaps) >= 1
    from pmesh_tpu.models.gravpm import read_ic
    pos, vel, ids, attrs = read_ic(snaps[0])
    assert pos.shape == (512, 3)
    assert vel.shape == (512, 3)
    assert abs(float(attrs['BoxSize']) - 64.0) < 1e-12

    # npz container still available
    out2 = str(tmp_path / "run2")
    run_sim(nmesh=8, boxsize=64.0, boost=1, steps=3,
            monitor_print=False, compat='native', resampler='cic',
            output=out2, snapshot_format='npz')
    files = glob.glob(out2 + "/snapshot_*.npz")
    assert len(files) >= 1
    d = np.load(files[0])
    assert d['Position'].shape == (512, 3)
    assert d['Velocity'].shape == (512, 3)


def test_lic_smoke():
    # reference tests/test_lic.py: smoke over a rotational field
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[16, 16])
    x = pm.create_coords('real')
    vx = pm.create(type='real',
                   value=jnp.broadcast_to(-x[1], (16, 16)))
    vy = pm.create(type='real',
                   value=jnp.broadcast_to(x[0], (16, 16)))
    r = lic([vx, vy], kernel=lambda s: 1.0 - abs(s), length=4.0, ds=1.0,
            resampler='linear')
    assert np.isfinite(np.asarray(r.value)).all()


def test_gravpm_lattice_matches_generic():
    """The lattice-path driver reproduces the generic driver's final
    P(k) (same config, boost=1, cic)."""
    from pmesh_tpu.models.gravpm import run_sim
    kw = dict(nmesh=32, boxsize=128.0, boost=1, resampler='cic',
              seed=7, ainit=0.2, afinal=0.4, steps=4, order=2,
              compat='native', dtype='f8', monitor_print=False)
    _, spec_g = run_sim(lattice=False, **kw)
    _, spec_l = run_sim(lattice=True, **kw)
    a_g, k_g, p_g = spec_g[-1]
    a_l, k_l, p_l = spec_l[-1]
    assert abs(a_g - a_l) < 1e-9
    sel = np.isfinite(p_g) & np.isfinite(p_l) & (p_g > 0)
    np.testing.assert_allclose(p_l[sel], p_g[sel], rtol=1e-3)


def test_linear_growth_end_to_end():
    """Physics regression: large-scale power grows as D^2(a) through
    the full lattice pipeline (2LPT ICs -> 12-step KDK -> P(k))."""
    from pmesh_tpu.models.gravpm import run_sim
    from pmesh_tpu.models.cosmology import Planck15

    nmesh, box = 64, 512.0
    (_, spectra) = run_sim(
        nmesh=nmesh, boxsize=box, boost=1, resampler='cic', seed=42,
        ainit=0.1, afinal=1.0, steps=5, order=2, compat='native',
        dtype='f8', monitor_print=False, lattice=True,
        snapshot_times=[0.1001])
    a0, k0, p0 = spectra[0]
    a1, k1, p1 = spectra[-1]
    assert abs(a1 - 1.0) < 1e-9
    # lattice particles carry no Poisson shot noise; undo the
    # subtracted convention term before taking the ratio
    SN = box ** 3 / nmesh ** 3
    D2 = (Planck15.D1(1.0) / Planck15.D1(a0)) ** 2
    sel = (k0 > 0) & (k0 < 0.06)
    ratio = (p1[sel] + SN) / (p0[sel] + SN)
    # a few % from nonlinear growth and stepping error
    np.testing.assert_allclose(ratio, D2, rtol=0.05)


def test_gravpm_gradient_mode_catalog():
    """--force-mode gradient on the boosted/catalog (non-lattice)
    path: the solver's QPM-family force drives the full run (the
    reference's own route, nbody/qpm.py:82-109) and tracks the
    spectral run closely at these scales."""
    # a quasi-linear stretch (a: 0.3 -> 0.6): both force families
    # must track; a deep nonlinear run would amplify the stencil-
    # noise difference chaotically
    kw = dict(nmesh=16, boxsize=128.0, boost=2, steps=4,
              ainit=0.3, afinal=0.6, seed=100, monitor_print=False)
    _, spec_s = run_sim(force_mode='spectral', **kw)
    _, spec_g = run_sim(force_mode='gradient', **kw)
    a_s, k_s, p_s = spec_s[-1]
    a_g, k_g, p_g = spec_g[-1]
    assert a_s == a_g
    good = np.isfinite(p_s) & np.isfinite(p_g) & (p_s > 0)
    assert good.any()
    # the derivative-window family agrees on the largest scales and
    # drifts at the stencil-noise level toward the grid scale
    assert np.allclose(p_g[good][0], p_s[good][0], rtol=0.1)
    assert np.all(p_g[good] > 0)
