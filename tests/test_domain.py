"""Domain decomposition API (parallel/domain.py) — the reference's
test_domain.py analog.  With global jax arrays the Layout is an
identity routing plan; these tests pin the API semantics (exchange/
gather modes, load measurement, greedy load balancing, isprimary)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pmesh_tpu.parallel.domain import Layout, GridND, FakeComm


def test_layout_exchange_identity():
    layout = Layout(smoothing=1.0, npart=5)
    x = jnp.arange(5.0)
    assert layout.exchange(x) is x
    a, b = layout.exchange(x, 2 * x)
    assert a is x and b is not None
    assert layout.exchange() is None
    assert layout.exchange_scalar(3.0) == 3.0
    assert layout.sendlength == 5 and layout.recvlength == 5


@pytest.mark.parametrize("mode", ['sum', 'mean', 'any', 'all', 'local'])
def test_layout_gather_modes(mode):
    layout = Layout(npart=4)
    x = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    got = layout.gather(x, mode=mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x))


def test_layout_gather_ufunc_and_invalid():
    layout = Layout(npart=3)
    x = jnp.ones(3)
    assert layout.gather(x, mode=np.add) is x
    with pytest.raises(NotImplementedError):
        layout.gather(x, mode='frobnicate')


def test_gridnd_load_counts():
    """Per-domain cost is (particle count)^gamma (reference
    domain.py:409-465)."""
    edges = [np.array([0.0, 4.0, 8.0]), np.array([0.0, 8.0])]
    grid = GridND(edges, periodic=True)
    # 3 particles in x<4, 1 in x>=4
    pos = np.array([[1.0, 2.0], [2.0, 3.0], [3.5, 1.0], [6.0, 5.0]])
    load = grid.load(pos, gamma=2)
    np.testing.assert_allclose(load, [9.0, 1.0])
    # gamma=1 gives raw counts
    np.testing.assert_allclose(grid.load(pos, gamma=1), [3.0, 1.0])
    # periodic wrap: x=9 lands in the first domain
    load2 = grid.load(np.array([[9.0, 1.0]]), gamma=1)
    np.testing.assert_allclose(load2, [1.0, 0.0])


def test_gridnd_loadbalance_greedy():
    """Greedy heap packing: heaviest domains spread across ranks
    (reference domain.py:468-499)."""
    edges = [np.linspace(0, 8, 5)]  # 4 domains
    comm = FakeComm()
    comm.size = 2
    grid = GridND(edges, comm=comm)
    grid.loadbalance(np.array([8.0, 1.0, 7.0, 2.0]))
    assign = np.asarray(grid.DomainAssign)
    loads = [np.sum(np.array([8.0, 1.0, 7.0, 2.0])[assign == r])
             for r in range(2)]
    assert abs(loads[0] - loads[1]) <= 2.0, loads
    # both ranks used
    assert set(assign.tolist()) == {0, 1}


def test_gridnd_isprimary_and_decompose():
    grid = GridND.uniform([8.0, 8.0, 8.0])
    pos = np.random.RandomState(0).uniform(0, 8, (10, 3))
    assert grid.isprimary(pos).all()
    layout = grid.decompose(pos, smoothing=1.5)
    assert layout.npart == 10
    assert layout.get_exchange_cost().sum() == 0
