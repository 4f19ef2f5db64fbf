"""Binned slot-lattice path (ops/binned.py + Solver.nbody_binned):
the general-position regime without scatters, and the never-drop-mass
guarantee (rebase absorbs drift; overflow/escape poisons, never
warns-after-the-fact)."""
import numpy as np
import pytest
from numpy.testing import assert_allclose
import jax
import jax.numpy as jnp

from pmesh_tpu import ParticleMesh
from pmesh_tpu.ops import binned as bn
from pmesh_tpu.ops import paint as po
from pmesh_tpu.models.fastpm import Solver


def test_from_positions_paint_matches_generic():
    N = 16
    rng = np.random.RandomState(0)
    pos = rng.uniform(0, N, (2000, 3))
    dslots, valid, over = bn.from_positions(jnp.asarray(pos),
                                            (N, N, N), nslots=8)
    assert int(over) == 0
    rho_b = bn.paint_binned(dslots, valid, bounds=(0., 1.))
    rho_g = po.paint(jnp.zeros((N, N, N)), jnp.asarray(pos),
                     window='cic', scale=1.0, translate=0.0,
                     period=(N, N, N))
    assert_allclose(np.asarray(rho_b), np.asarray(rho_g), atol=1e-10)


def test_rebase_preserves_density_and_extras():
    N = 16
    rng = np.random.RandomState(1)
    pos = rng.uniform(0, N, (1500, 3))
    dslots, valid, _ = bn.from_positions(jnp.asarray(pos), (N, N, N),
                                         nslots=8)
    shift = tuple(tuple(d + rng.uniform(-1.5, 1.5) for d in dk)
                  for dk in dslots)
    vel = tuple(tuple(jnp.asarray(rng.normal(size=(N, N, N)))
                      for _ in range(3)) for _ in range(8))
    before = bn.paint_binned(shift, valid, bounds=(-1.5, 2.5))
    nd, nv, (nvel,), over = bn.rebase(shift, valid, (-1.5, 2.5),
                                      extras=(vel,))
    assert int(over) == 0
    after = bn.paint_binned(nd, nv, bounds=(0., 1.))
    assert_allclose(np.asarray(after), np.asarray(before), atol=1e-9)
    mom_in = sum(float(jnp.sum(vel[k][0] * valid[k]))
                 for k in range(8))
    mom_out = sum(float(jnp.sum(nvel[k][0] * nv[k]))
                  for k in range(8))
    assert abs(mom_in - mom_out) < 1e-8


def test_fold_lattice_matches_rebase():
    """the sort-based initial fold (O(N) memory, any excursion) must
    agree with the roll-based rebase on a wide-excursion lattice
    state: same density, same per-slot-aggregate momentum, same
    needed slot count."""
    N = 12
    rng = np.random.RandomState(5)
    disp = tuple(jnp.asarray(rng.uniform(-2.4, 3.1, (N, N, N)))
                 for _ in range(3))
    vel = tuple(jnp.asarray(rng.normal(size=(N, N, N)))
                for _ in range(3))

    need = int(jax.jit(bn.fold_needed)(disp))
    ds_r, vs_r, va_r = bn.from_lattice(disp, vel, nslots=need)
    ds_r, va_r, (vs_r,), ov_r = bn.rebase(
        ds_r, va_r, (-2.4, 4.1), extras=(vs_r,), nslots_out=need)
    assert int(ov_r) == 0

    ds_f, vs_f, va_f, ov_f = bn.fold_lattice(disp, vel, nslots=need)
    assert int(ov_f) == 0

    rho_r = bn.paint_binned(ds_r, va_r, bounds=(0., 1.))
    rho_f = bn.paint_binned(ds_f, va_f, bounds=(0., 1.))
    assert_allclose(np.asarray(rho_f), np.asarray(rho_r), atol=1e-9)
    for d in range(3):
        mom_r = sum(float(jnp.sum(vs_r[k][d] * va_r[k]))
                    for k in range(need))
        mom_f = sum(float(jnp.sum(vs_f[k][d] * va_f[k]))
                    for k in range(need))
        assert abs(mom_r - mom_f) < 1e-8
    # one slot short must poison, never drop
    ds_o, vs_o, va_o, ov_o = bn.fold_lattice(disp, vel,
                                             nslots=need - 1)
    assert int(ov_o) > 0
    assert np.isnan(np.asarray(ds_o[0][0])).all()


def test_rebase_escape_poisons():
    """a particle drifting beyond the declared drift bounds must
    poison the state, never silently vanish (the VERDICT's
    boundary-crossing criterion)."""
    N = 8
    dslots, valid = bn.from_lattice(
        tuple(jnp.zeros((N, N, N)) for _ in range(3)), nslots=1)
    # one particle pushed 2.7 cells while declaring drift <= 1.5
    d0 = dslots[0][0].at[2, 3, 4].set(2.7)
    bad = ((d0, dslots[0][1], dslots[0][2]),)
    nd, nv, _, over = bn.rebase(bad, valid, (-0.5, 1.5))
    assert int(over) > 0
    assert np.isnan(np.asarray(nd[0][0])).all()


def test_overflow_poisons():
    N = 8
    rng = np.random.RandomState(2)
    pos = rng.uniform(0, N, (600, 3))
    d1, v1, over = bn.from_positions(jnp.asarray(pos), (4, 4, 4),
                                     nslots=1, scale=4.0 / N)
    assert int(over) > 0
    assert np.isnan(np.asarray(d1[0][0])).all()


def test_nbody_binned_matches_lattice():
    """a short run where displacements stay in the lattice bounds:
    the binned integrator (with mid-run rebases) must reproduce the
    lattice integrator's final density."""
    N = 8
    pm = ParticleMesh(Nmesh=[N] * 3, BoxSize=float(N), dtype='f8')
    solver = Solver(pm)
    dlin = solver.linear_field(lambda k: 0.5 * jnp.ones_like(k),
                               seed=42, compat='native')
    disp, vel = solver.lpt_lattice(dlin, a0=0.3, shift=0.3, order=1)
    steps = np.linspace(0.3, 0.5, 3)

    S_l, V_l = solver.nbody_lattice(disp, vel, steps,
                                    bounds=(-1.0, 2.0))
    from pmesh_tpu.ops import gridpm as gp
    rho_l = gp.paint_grid(S_l, bounds=(-1.0, 2.0))

    dsl, vsl, valid, over = solver.nbody_binned(
        disp, vel, steps, nslots=2, rebase_every=2, step_drift=0.5)
    assert int(over) == 0
    rho_b = bn.paint_binned(dsl, valid, bounds=(-1.0, 2.0))
    assert_allclose(np.asarray(rho_b), np.asarray(rho_l), atol=1e-8)
    # totals conserved
    tot, occ = bn.occupancy(valid)
    assert float(tot) == N ** 3


def test_nbody_binned_deep_drift():
    """displacements that outgrow any static lattice bounds keep
    integrating exactly under periodic rebase (the regime where
    nbody_lattice would have warned after dropping mass)."""
    N = 8
    pm = ParticleMesh(Nmesh=[N] * 3, BoxSize=float(N), dtype='f8')
    solver = Solver(pm)
    # uniform density (delta == 0, forces vanish) drifting coherently
    # ~0.3 cells/step: the total displacement crosses several cells —
    # far outside any static lattice bounds — and must stay exact
    disp = tuple(jnp.full((N, N, N), 0.5) for _ in range(3))
    vel = tuple(jnp.full((N, N, N), 0.1 * (d + 1)) for d in range(3))
    steps = np.linspace(0.3, 0.9, 7)
    dsl, vsl, valid, over = solver.nbody_binned(
        disp, vel, steps, nslots=2, rebase_every=1, step_drift=1.0,
        factors='naive')
    assert int(over) == 0
    tot, occ = bn.occupancy(valid)
    assert float(tot) == N ** 3
    assert float(occ) == 1.0  # coherent drift keeps one per cell
    rho = bn.paint_binned(dsl, valid, bounds=(-1.0, 2.0))
    assert np.isfinite(np.asarray(rho)).all()
    assert_allclose(np.asarray(rho), 1.0, atol=1e-9)


def test_rebase_pallas_bit_identical():
    """the fused plane-walk rebase kernel (ops/binned_pallas.py,
    interpret mode off-TPU) is BIT-identical to the XLA formulation,
    including slot assignment order, extras, Kout != K, and the
    overflow count."""
    N = 8
    rng = np.random.RandomState(7)
    ds = tuple(tuple(jnp.asarray(
        rng.uniform(-0.9, 1.9, (N, N, N)).astype('f4'))
        for _ in range(3)) for _ in range(2))
    va = (jnp.asarray((rng.uniform(size=(N, N, N)) < 0.35)
                      .astype('f4')),
          jnp.asarray((rng.uniform(size=(N, N, N)) < 0.15)
                      .astype('f4')))
    vel = tuple(tuple(jnp.asarray(
        rng.normal(size=(N, N, N)).astype('f4'))
        for _ in range(3)) for _ in range(2))
    rx = bn.rebase(ds, va, (-0.9, 1.9), extras=(vel,), nslots_out=4,
                   impl='xla')
    rp = bn.rebase(ds, va, (-0.9, 1.9), extras=(vel,), nslots_out=4,
                   impl='pallas')
    assert int(rx[3]) == int(rp[3]) == 0
    for j in range(4):
        np.testing.assert_array_equal(np.asarray(rp[1][j]),
                                      np.asarray(rx[1][j]))
        for a in range(3):
            np.testing.assert_array_equal(np.asarray(rp[0][j][a]),
                                          np.asarray(rx[0][j][a]))
            np.testing.assert_array_equal(
                np.asarray(rp[2][0][j][a]),
                np.asarray(rx[2][0][j][a]))


def test_rebase_sharded_matches_single():
    """the slab-sharded plane-walk rebase (ring-halo x planes under
    shard_map) is bit-identical to the single-device kernel on the
    8-device mesh — the rolls really lower to collective permutes."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pmesh_tpu.parallel.pmesh import ProcessMesh
    assert len(jax.devices()) >= 8
    pm8 = ProcessMesh(jax.devices()[:8])
    N = 16
    rng = np.random.RandomState(11)
    ds = tuple(tuple(jnp.asarray(
        rng.uniform(-0.9, 1.9, (N, N, N)).astype('f4'))
        for _ in range(3)) for _ in range(2))
    va = (jnp.asarray((rng.uniform(size=(N, N, N)) < 0.25)
                      .astype('f4')),
          jnp.asarray((rng.uniform(size=(N, N, N)) < 0.1)
                      .astype('f4')))
    vel = tuple(tuple(jnp.asarray(
        rng.normal(size=(N, N, N)).astype('f4'))
        for _ in range(3)) for _ in range(2))
    ref = bn.rebase(ds, va, (-0.9, 1.9), extras=(vel,), impl='pallas',
                    nslots_out=4)

    def shard(t):
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, NamedSharding(
                pm8.mesh, P('x', None, None))), t)

    got = bn.rebase(shard(ds), shard(va), (-0.9, 1.9),
                    extras=(shard(vel),), impl='pallas',
                    procmesh=pm8, nslots_out=4)
    assert int(got[3]) == int(ref[3]) == 0
    for j in range(4):
        np.testing.assert_array_equal(np.asarray(got[1][j]),
                                      np.asarray(ref[1][j]))
        for a in range(3):
            np.testing.assert_array_equal(np.asarray(got[0][j][a]),
                                          np.asarray(ref[0][j][a]))
            np.testing.assert_array_equal(
                np.asarray(got[2][0][j][a]),
                np.asarray(ref[2][0][j][a]))


def test_nbody_binned_sharded_matches():
    """the full binned KDK loop (force_binned + periodic rebase) on
    the 8-device mesh matches the single-device run — the previously
    untested multi-device claim of ops/binned.py."""
    import jax
    from pmesh_tpu.parallel.pmesh import ProcessMesh
    assert len(jax.devices()) >= 8
    pm8 = ProcessMesh(jax.devices()[:8])
    N = 16
    rng = np.random.RandomState(12)
    disp = tuple(jnp.asarray(rng.uniform(0.1, 0.9, (N, N, N))
                             .astype('f4')) for _ in range(3))
    vel = tuple(jnp.asarray(0.05 * rng.normal(size=(N, N, N))
                            .astype('f4')) for _ in range(3))
    steps = np.linspace(0.3, 0.5, 3)

    pm1 = ParticleMesh(Nmesh=[N] * 3, BoxSize=float(N), dtype='f4')
    ref = Solver(pm1).nbody_binned(disp, vel, steps, nslots=2,
                                   rebase_every=1, step_drift=1.0)
    pms = ParticleMesh(Nmesh=[N] * 3, BoxSize=float(N), dtype='f4',
                       procmesh=pm8)
    got = Solver(pms).nbody_binned(disp, vel, steps, nslots=2,
                                   rebase_every=1, step_drift=1.0)
    assert int(ref[3]) == int(got[3]) == 0
    for k in range(2):
        np.testing.assert_allclose(np.asarray(got[2][k]),
                                   np.asarray(ref[2][k]), atol=0)
        for a in range(3):
            np.testing.assert_allclose(
                np.asarray(got[0][k][a]) * np.asarray(got[2][k]),
                np.asarray(ref[0][k][a]) * np.asarray(ref[2][k]),
                atol=2e-5)
            np.testing.assert_allclose(
                np.asarray(got[1][k][a]) * np.asarray(got[2][k]),
                np.asarray(ref[1][k][a]) * np.asarray(ref[2][k]),
                atol=2e-5)


def test_rebase_pallas_x_direction():
    """a single particle crossing an x-plane boundary lands in the
    right neighbor (regression: the kernel's sliding-window source
    slot is p - ox, not p + ox — the mirrored form survived a
    uniform-shift test)."""
    N = 8
    dslots, valid = bn.from_lattice(
        tuple(jnp.zeros((N, N, N), jnp.float32) for _ in range(3)),
        nslots=2)
    d0 = dslots[0][0].at[3, 4, 5].set(1.3)
    ds = ((d0, dslots[0][1], dslots[0][2]), dslots[1])
    for impl in ('xla', 'pallas'):
        nd, nv, ne, ov = bn.rebase(ds, valid, (-0.5, 1.5), impl=impl)
        v1 = np.asarray(nv[1])
        assert np.argwhere(v1 > 0).tolist() == [[4, 4, 5]], impl
        assert abs(float(np.asarray(nd[1][0])[4, 4, 5]) - 0.3) < 1e-6


def test_force_binned_gradient_mode():
    """force_binned(mode='gradient'): ONE Poisson inverse + fused
    3-derivative readout per slot.  A fresh from_lattice state (slot
    0 = the lattice) must match force_lattice(mode='gradient')
    exactly — same potential, same diff windows."""
    from pmesh_tpu import ParticleMesh
    from pmesh_tpu.models.fastpm import Solver
    from pmesh_tpu.ops import binned as bn
    N = 16
    pm = ParticleMesh(Nmesh=[N] * 3, BoxSize=float(N), dtype='f4')
    s = Solver(pm)
    rng = np.random.RandomState(0)
    disp = tuple(jnp.asarray(rng.uniform(0.05, 0.95, (N,) * 3),
                             jnp.float32) for _ in range(3))
    dsl, valid = bn.from_lattice(disp, nslots=2)
    Fg = s.force_binned(dsl, valid, (-0.5, 1.5), fft='xla',
                        mode='gradient')
    Fl = s.force_lattice(disp, bounds=(-0.5, 1.5), mode='gradient',
                         fft='xla')
    for d in range(3):
        np.testing.assert_array_equal(np.asarray(Fg[0][d]),
                                      np.asarray(Fl[d]))


@pytest.mark.slow
def test_nbody_binned_adaptive_growth():
    """A cell exceeding the slot budget mid-run GROWS the state
    instead of poisoning it (adaptive=True measures the needed slot
    count before every rebase) — the any-clustering role of the
    reference's per-particle loop (_window_generics.h:21-72).
    Parity: the adaptive run from nslots=1 must equal a roomy
    non-adaptive run bit-for-bit in the painted density."""
    N = 8
    pm = ParticleMesh(Nmesh=[N] * 3, BoxSize=float(N), dtype='f8')
    solver = Solver(pm)
    disp = tuple(jnp.full((N, N, N), 0.5) for _ in range(3))
    # even x-columns drift right (total ~1.1 cells over the run:
    # naive D1 factors sum to 2.24) while odd columns stand still:
    # movers catch the stationary column's cell mid-run
    x = jnp.arange(N)
    vx = jnp.where(x % 2 == 0, 0.5, 0.0)[:, None, None] \
        * jnp.ones((N, N, N))
    vel = (vx, jnp.zeros((N, N, N)), jnp.zeros((N, N, N)))
    steps = np.linspace(0.3, 0.8, 6)
    kw = dict(rebase_every=1, step_drift=1.0, factors='naive')

    # non-adaptive with one slot: overflow reported, state poisoned
    _, _, _, ov1 = solver.nbody_binned(disp, vel, steps, nslots=1,
                                       **kw)
    assert int(ov1) > 0

    # adaptive from the same one slot: grows, never poisons
    da, vsa, vaa, ova = solver.nbody_binned(disp, vel, steps,
                                            nslots=1, adaptive=True,
                                            **kw)
    assert int(ova) == 0
    assert len(da) > 1                      # it actually grew
    tot, occ = bn.occupancy(vaa)
    assert float(tot) == N ** 3             # mass conserved
    assert float(occ) == float(len(da)) or float(occ) <= len(da)

    # parity with a roomy non-adaptive run
    d4, vs4, va4, ov4 = solver.nbody_binned(disp, vel, steps,
                                            nslots=4, **kw)
    assert int(ov4) == 0
    rho_a = np.asarray(bn.paint_binned(da, vaa, bounds=(-1.0, 2.0)))
    rho_4 = np.asarray(bn.paint_binned(d4, va4, bounds=(-1.0, 2.0)))
    assert_allclose(rho_a, rho_4, atol=1e-9)


@pytest.mark.slow
def test_rebase_pallas_fori_bit_identical():
    """the fori_loop kernel form (wide planes, N2 >= 128 — the
    production VMEM shape; see binned_pallas._use_fori) is
    BIT-identical to the XLA formulation too.  (4, 8, 128) planes:
    small everywhere except the lane dim that selects the dynamic-
    rotate path."""
    from pmesh_tpu.ops import binned_pallas as bp
    shape = (4, 8, 128)
    assert bp._use_fori(shape[1], shape[2])
    rng = np.random.RandomState(11)
    ds = tuple(tuple(jnp.asarray(
        rng.uniform(-0.9, 1.9, shape).astype('f4'))
        for _ in range(3)) for _ in range(2))
    va = (jnp.asarray((rng.uniform(size=shape) < 0.35)
                      .astype('f4')),
          jnp.asarray((rng.uniform(size=shape) < 0.15)
                      .astype('f4')))
    vel = tuple(tuple(jnp.asarray(
        rng.normal(size=shape).astype('f4'))
        for _ in range(3)) for _ in range(2))
    Kout = int(bn.needed_slots(ds, va, (-0.9, 1.9)))
    rx = bn.rebase(ds, va, (-0.9, 1.9), extras=(vel,),
                   nslots_out=Kout, impl='xla')
    rp = bn.rebase(ds, va, (-0.9, 1.9), extras=(vel,),
                   nslots_out=Kout, impl='pallas')
    assert int(rx[3]) == int(rp[3]) == 0
    for j in range(Kout):
        np.testing.assert_array_equal(np.asarray(rp[1][j]),
                                      np.asarray(rx[1][j]))
        for a in range(3):
            np.testing.assert_array_equal(np.asarray(rp[0][j][a]),
                                          np.asarray(rx[0][j][a]))
            np.testing.assert_array_equal(
                np.asarray(rp[2][0][j][a]),
                np.asarray(rx[2][0][j][a]))
