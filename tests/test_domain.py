"""Domain decomposition (parallel/domain.py) — the reference's
test_domain.py analog on global arrays.

The placement tests mirror the reference's collective assertions
(pmesh/tests/test_domain.py:65-91 test_exchange and friends): the
exact Layout's exchange result, grouped by destination rank, must
equal what the reference's allgathered per-rank buffers would hold.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pmesh_tpu.parallel.domain import Layout, GridND, FakeComm


def _comm(size):
    c = FakeComm()
    c.size = size
    return c


# --- trivial single-domain plan (the D=1 degenerate case) -------------

def test_layout_trivial_exchange():
    layout = Layout(npart=5, smoothing=1.0)
    x = jnp.arange(5.0)
    assert layout.exchange(x) is x
    a, b = layout.exchange(x, 2 * x)
    assert a is x and b is not None
    assert layout.exchange() is None
    assert layout.exchange_scalar(3.0) == 3.0
    assert layout.sendlength == 5 and layout.recvlength == 5


@pytest.mark.parametrize("mode", ['sum', 'mean', 'any', 'all', 'local'])
def test_layout_trivial_gather_modes(mode):
    layout = Layout(npart=4)
    x = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    got = layout.gather(x, mode=mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x))


def test_layout_trivial_ufunc_and_invalid():
    layout = Layout(npart=3)
    x = jnp.ones(3)
    assert layout.gather(x, mode=np.add) is x
    with pytest.raises(NotImplementedError):
        layout.gather(x, mode='frobnicate')


# --- exact decomposition (reference test_domain.py:65-91) -------------

def test_exchange_placement():
    """The reference's test_exchange: 2x1 domain grid, 4 particles,
    smoothing 0 — each domain receives exactly its own particles, in
    source order."""
    grid = GridND([[0, 1, 2], [0, 2]], comm=_comm(2), periodic=True)
    pos = np.array(list(np.ndindex((2, 2))), dtype='f8')
    mass = np.array([0.0, 1, 2, 3])
    layout = grid.decompose(pos, smoothing=0)
    np.testing.assert_array_equal(layout.sendcounts, [2, 2])
    npos = np.asarray(layout.exchange(pos))
    np.testing.assert_array_equal(npos[:2], [[0, 0], [0, 1]])
    np.testing.assert_array_equal(npos[2:], [[1, 0], [1, 1]])
    nmass = layout.exchange(mass)
    np.testing.assert_array_equal(np.asarray(nmass), [0, 1, 2, 3])
    np.testing.assert_array_equal(
        np.asarray(layout.gather(nmass, 'sum')), mass)


def test_exchange_smoothing_ghosts():
    """With smoothing, boundary particles are duplicated into every
    intersecting domain (reference test_domain.py:231+); gather('sum')
    counts each image, 'mean'/'any' recover the original."""
    grid = GridND([[0, 1, 2], [0, 2]], comm=_comm(2), periodic=True)
    pos = np.array(list(np.ndindex((2, 2))), dtype='f8')
    mass = np.array([1.0, 2, 3, 4])
    layout = grid.decompose(pos, smoothing=0.6)
    # every particle is within 0.6 of both domains (width-1 domains)
    assert layout.recvlength == 8
    nmass = layout.exchange(mass)
    np.testing.assert_array_equal(
        np.asarray(layout.gather(nmass, 'sum')), 2 * mass)
    np.testing.assert_array_equal(
        np.asarray(layout.gather(nmass, 'mean')), mass)
    np.testing.assert_array_equal(
        np.asarray(layout.gather(nmass, 'any')), mass)
    got_all = np.asarray(layout.gather(nmass, 'all'))
    assert got_all.shape == (8,)


def test_exchange_periodic_wrap_ghost():
    """A particle near the box edge ghosts into the wrapped domain."""
    grid = GridND([[0, 4, 8], [0, 8]], comm=_comm(2), periodic=True)
    pos = np.array([[7.9, 1.0]])
    layout = grid.decompose(pos, smoothing=0.5)
    # intersects domain 1 (home) and, via wrap, domain 0
    np.testing.assert_array_equal(layout.sendcounts, [1, 1])


def test_exchange_rank_dedup():
    """Two domains assigned to the SAME rank receive one copy
    (reference _domain.pyx unique-target push, 103-115)."""
    grid = GridND([[0, 1, 2], [0, 2]], comm=_comm(1), periodic=True)
    # both domains on rank 0
    pos = np.array([[0.95, 1.0]])
    layout = grid.decompose(pos, smoothing=0.2)
    np.testing.assert_array_equal(layout.sendcounts, [1])
    assert layout.recvlength == 1


def test_degenerate_domain_receives_nothing():
    edges = [np.array([0.0, 4.0, 4.0, 8.0]), np.array([0.0, 8.0])]
    grid = GridND(edges, comm=_comm(3), periodic=True)
    assert grid.DomainDegenerate[1]
    pos = np.array([[3.9, 1.0], [4.1, 2.0]])
    layout = grid.decompose(pos, smoothing=0.5)
    assert layout.sendcounts[1] == 0


def test_domain_assign_consumed():
    """loadbalance rewrites DomainAssign and decompose routes by it."""
    grid = GridND([np.linspace(0, 8, 5)], comm=_comm(2))
    grid.loadbalance(np.array([8.0, 1.0, 7.0, 2.0]))
    assign = np.asarray(grid.DomainAssign)
    assert set(assign.tolist()) == {0, 1}
    pos = np.array([[0.5], [2.5], [4.5], [6.5]])  # one per domain
    layout = grid.decompose(pos, smoothing=0)
    expect = np.bincount(assign, minlength=2)
    np.testing.assert_array_equal(layout.sendcounts, expect)
    # exchanged order groups by rank
    vals = np.asarray(layout.exchange(np.arange(4.0)))
    by_rank = [sorted(vals[:expect[0]]), sorted(vals[expect[0]:])]
    want = [sorted(np.nonzero(assign == r)[0].astype('f8'))
            for r in range(2)]
    assert by_rank == [list(w) for w in want]


def test_isprimary_partitions():
    grid = GridND([[0, 4, 8], [0, 8]], comm=_comm(2), periodic=True)
    pos = np.random.RandomState(0).uniform(0, 8, (20, 2))
    p0 = grid.isprimary(pos, rank=0)
    p1 = grid.isprimary(pos, rank=1)
    # primary regions partition the box
    np.testing.assert_array_equal(p0 ^ p1, np.ones(20, dtype='?'))
    np.testing.assert_array_equal(grid.which_rank(pos), (~p0).astype(int))


def test_gridnd_load_counts():
    """Per-domain cost is (particle count)^gamma (reference
    domain.py:409-465)."""
    edges = [np.array([0.0, 4.0, 8.0]), np.array([0.0, 8.0])]
    grid = GridND(edges, periodic=True)
    pos = np.array([[1.0, 2.0], [2.0, 3.0], [3.5, 1.0], [6.0, 5.0]])
    load = grid.load(pos, gamma=2)
    np.testing.assert_allclose(load, [9.0, 1.0])
    np.testing.assert_allclose(grid.load(pos, gamma=1), [3.0, 1.0])
    load2 = grid.load(np.array([[9.0, 1.0]]), gamma=1)
    np.testing.assert_allclose(load2, [1.0, 0.0])


def test_gridnd_loadbalance_greedy():
    edges = [np.linspace(0, 8, 5)]
    grid = GridND(edges, comm=_comm(2))
    grid.loadbalance(np.array([8.0, 1.0, 7.0, 2.0]))
    assign = np.asarray(grid.DomainAssign)
    loads = [np.sum(np.array([8.0, 1.0, 7.0, 2.0])[assign == r])
             for r in range(2)]
    assert abs(loads[0] - loads[1]) <= 2.0, loads
    assert set(assign.tolist()) == {0, 1}


def test_gridnd_uniform_and_gather_grad():
    grid = GridND.uniform([8.0, 8.0, 8.0], comm=_comm(4))
    pos = np.random.RandomState(0).uniform(0, 8, (16, 3))
    layout = grid.decompose(pos, smoothing=1.0)
    assert layout.sendlength == 16
    assert layout.recvlength >= 16
    # exchange->gather('sum') is differentiable end to end
    import jax
    mass = jnp.linspace(1.0, 2.0, 16)
    nim = np.bincount(layout.indices, minlength=16)

    def f(m):
        return jnp.sum(layout.gather(layout.exchange(m), 'sum'))

    g = np.asarray(jax.grad(f)(mass))
    np.testing.assert_allclose(g, nim, rtol=1e-6)
