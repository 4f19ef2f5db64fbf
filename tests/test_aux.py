"""Auxiliary subsystem tests: qpm, genic, gradcheck, measure,
timers, checkpoint."""
import numpy as np
from numpy.testing import assert_allclose
import jax.numpy as jnp
import pytest

from pmesh_tpu import ParticleMesh
from pmesh_tpu.models.qpm import QPM
from pmesh_tpu.models.genic import GridIC
from pmesh_tpu.models.powerspectrum import EHPower
from pmesh_tpu.models.cosmology import Planck15
from pmesh_tpu.models.fastpm import State
from pmesh_tpu.gradcheck import check_grad
from pmesh_tpu.utils.measure import snapshot_power, strain_tensor
from pmesh_tpu.utils.timers import Timer, Timers
from pmesh_tpu.utils import checkpoint


def test_qpm_run_events():
    qpm = QPM(Planck15, BoxSize=64.0, Nmesh=16, a0=0.5, dtype='f8')
    rng = np.random.RandomState(42)
    n = 64
    P = {
        'Position': jnp.asarray(rng.uniform(0, 64, size=(n, 3))),
        'Velocity': jnp.zeros((n, 3)),
        'Accel': jnp.zeros((n, 3)),
        'Mass': 1.0,
    }
    events = list(qpm.run(P, aout=[0.8]))
    kinds = [e[0] for e in events]
    assert QPM.FINISHED in kinds
    assert QPM.WRITE_SNAPSHOT in kinds
    assert np.isfinite(np.asarray(P['Position'])).all()
    assert np.isfinite(np.asarray(P['Velocity'])).all()


def test_genic():
    power = EHPower(Planck15, redshift=0.0)
    D1 = float(Planck15.D1(0.1))
    P, stats = GridIC(power, BoxSize=64.0, Ngrid=8, D1=D1, seed=42,
                      compat='native')
    assert P['ZA'].shape == (512, 3)
    assert P['2LPT'].shape == (512, 3)
    assert stats['stdZA'] > 0
    # 2LPT correction is smaller than ZA at early times
    assert stats['std2LPT'] < stats['stdZA']


def test_check_grad_harness():
    pm = ParticleMesh(BoxSize=8.0, Nmesh=[8, 8])
    rng = np.random.RandomState(42)
    pos = rng.uniform(1, 7, size=(4, 2))

    def obj(pos):
        real = pm.paint(jnp.asarray(pos))
        c = real.r2c()
        return (c.cnorm() * 1e2)

    check_grad(obj, pos, eps=1e-5, rtol=1e-4, atol=1e-7)


def test_check_grad_catches_wrong_gradient():
    import jax

    # a function whose jax gradient is fine: validate harness failure
    # by comparing against an objective evaluated differently
    def obj(x):
        return jnp.sum(jnp.sin(x))

    # sabotage: use mismatched eps direction via a wrapped objective
    def bad_obj(x):
        return jnp.sum(jnp.sin(x)) + (0.5 if isinstance(x, np.ndarray)
                                      else 0.0)
    # gradient of bad_obj via jax == gradient of obj; numerical diff
    # sees the constant offset cancel, so this passes; instead check a
    # genuinely wrong gradient via custom_vjp
    @jax.custom_vjp
    def wrong(x):
        return jnp.sum(jnp.sin(x))

    def fwd(x):
        return wrong(x), x

    def bwd(x, g):
        return (2.0 * jnp.cos(x) * g,)  # wrong factor

    wrong.defvjp(fwd, bwd)
    with pytest.raises(AssertionError):
        check_grad(wrong, np.array([0.3, 0.7]), rtol=1e-4)


def test_snapshot_power_shotnoise():
    # random (poisson) particles: P(k) ~ shot noise; after subtraction
    # the spectrum is near zero compared to the shot level
    rng = np.random.RandomState(42)
    pos = rng.uniform(0, 64, size=(4096, 3))
    k, p, n = snapshot_power(pos, BoxSize=64.0, Nmesh=16,
                             resampler='cic', Nbins=4)
    shot = 64.0 ** 3 / 4096
    assert np.abs(np.asarray(p)[1:3]).max() < shot * 1.5


def test_strain_tensor_trace():
    # trace of the strain tensor = -laplacian phi = -delta (up to the
    # sign/window details); check it is finite and symmetric shape
    rng = np.random.RandomState(42)
    pos = rng.uniform(0, 16, size=(128, 3))
    s = strain_tensor(pos, BoxSize=16.0, Nmesh=16)
    assert s.shape == (128, 6)
    assert np.isfinite(np.asarray(s)).all()


def test_timers():
    t = Timers()
    with t['phase1']:
        _ = jnp.zeros(16) + 1
    rep = t.report()
    assert 'phase1' in rep
    assert rep['phase1'][1] == 1


def test_checkpoint_npz(tmp_path):
    rng = np.random.RandomState(42)
    Q = jnp.asarray(rng.uniform(0, 8, (16, 3)))
    S = jnp.asarray(rng.normal(size=(16, 3)) * 0.1)
    V = jnp.asarray(rng.normal(size=(16, 3)))
    state = State(Q, S, V)
    fn = str(tmp_path / "snap.npz")
    checkpoint.save_npz(fn, state, a=0.5)
    state2, a = checkpoint.load_npz(fn)
    assert a == 0.5
    assert_allclose(np.asarray(state2.V), np.asarray(V))
    assert_allclose(np.asarray(state2.S), np.asarray(S), atol=1e-12)


def test_checkpoint_orbax(tmp_path):
    rng = np.random.RandomState(42)
    Q = jnp.asarray(rng.uniform(0, 8, (16, 3)))
    state = State(Q, Q * 0.1, Q * 0.2)
    path = str(tmp_path / "ckpt")
    checkpoint.save_state(path, state, extra={'a': np.float64(0.5)})
    state2, extra = checkpoint.restore_state(path)
    assert_allclose(np.asarray(state2.Q), np.asarray(Q))
    assert float(extra['a']) == 0.5


def test_bigfile_roundtrip_and_gadget_layout():
    """utils/bigfile.py: write a Gadget-layout snapshot, read it back
    through the BigFile API, attributes and checksums intact (format
    validated byte-for-byte against the reference's debug-32/IC
    fixture; the folded checksum convention is s%65536 + s//65536)."""
    import tempfile
    import os
    from pmesh_tpu.utils import bigfile as bf
    rng = np.random.RandomState(0)
    pos = rng.uniform(0, 100, (1000, 3))
    ids = np.arange(1000, dtype='i8')
    with tempfile.TemporaryDirectory() as d:
        root = os.path.join(d, 'snap')
        bf.write_block(root, 'header', data=None,
                       attrs={'BoxSize': 100.0,
                              'TotNumPart': np.array([0, 1000],
                                                     dtype='i8')})
        bf.write_block(root, '1/Position', pos)
        bf.write_block(root, '1/ID', ids)
        f = bf.BigFile(root)
        assert set(f.blocks) == {'header', '1/Position', '1/ID'}
        np.testing.assert_array_equal(f['1/Position'].read(), pos)
        np.testing.assert_array_equal(f['1/ID'].read(), ids)
        np.testing.assert_array_equal(f['1/Position'].read(100, 50),
                                      pos[100:150])
        assert float(f.attrs['BoxSize']) == 100.0
        np.testing.assert_array_equal(f.attrs['TotNumPart'],
                                      [0, 1000])
        # checksum lines follow the reference convention
        hdr = open(os.path.join(root, '1/ID/header')).read()
        import re
        m = re.search(r"000000: (\d+) : (\d+) : (\d+)", hdr)
        s = int(m.group(2))
        assert int(m.group(3)) == s % 65536 + s // 65536


def test_gravpm_bigfile_snapshot_and_read_ic():
    """gravpm writes bigfile snapshots; read_ic ingests them (the
    reference's Gadget IC reading role, gravpm.py:89-109)."""
    import tempfile
    from pmesh_tpu.models import gravpm
    with tempfile.TemporaryDirectory() as d:
        state, spectra = gravpm.run_sim(
            nmesh=8, boxsize=32.0, boost=1, steps=3, order=1,
            seed=1, snapshot_times=[], output=d,
            monitor_print=False)
        import os
        snaps = [x for x in os.listdir(d) if x.startswith('snapshot')]
        assert snaps, os.listdir(d)
        pos, vel, ids, attrs = gravpm.read_ic(
            os.path.join(d, snaps[0]))
        assert pos.shape == (8 ** 3, 3)
        assert vel.shape == (8 ** 3, 3)
        assert ids.shape == (8 ** 3,)
        assert abs(float(attrs['BoxSize']) - 32.0) < 1e-12
