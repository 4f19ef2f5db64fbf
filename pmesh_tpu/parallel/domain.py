"""Domain decomposition and the Layout routing plan.

The reference (pmesh/domain.py) decomposes space into cubinoid domains
owned by MPI ranks and moves ghost copies of particles across ranks
with packed Alltoallv exchanges (Layout.exchange, domain.py:138-206)
and reduction gathers (Layout.gather, domain.py:208-318).

In the TPU rebuild the mesh and the particle arrays are *global* jax
Arrays; XLA materializes whatever cross-device movement a paint or
readout needs (and the shard_map fast paths in parallel/halo.py move
fixed-size mesh halos instead of ragged particle ghosts — static
shapes, which is what the hardware wants).  The Layout object is kept
for API parity: downstream code does

    layout = pm.decompose(pos)
    field = pm.paint(pos, layout=layout)
    values = field.readout(pos, layout=layout)

and relies on exchange/gather round-tripping.  Here exchange is the
identity (the "domain" of the single logical process is the whole
box) and gather's reduction modes operate on the identity routing.
"""
import numpy as np
import jax.numpy as jnp

__all__ = ["Layout", "GridND", "FakeComm"]


class FakeComm(object):
    """Single-logical-process stand-in for an MPI communicator.

    The SPMD jax program is logically one process; collective scalars
    (reference: comm.allreduce at pm.py:296, 739, ...) are identities.
    """
    rank = 0
    size = 1

    def allreduce(self, value, op=None):
        return value

    def allgather(self, value):
        return [value]

    def bcast(self, value, root=0):
        return value

    def barrier(self):
        pass

    Barrier = barrier

    def Allreduce(self, sendbuf, recvbuf=None, op=None):
        return sendbuf


class Layout(object):
    """Identity routing plan of a global-array decomposition.

    Mirrors pmesh.domain.Layout (reference domain.py:82-318).  With a
    single logical domain every particle is primary and has exactly one
    image, so exchange is the identity permutation and every gather
    reduction collapses to the identity as well.
    """

    def __init__(self, smoothing=0, npart=None):
        self.smoothing = smoothing
        self.npart = npart
        self.sendlength = npart
        self.recvlength = npart

    def exchange(self, *args, pack=True):
        """Deliver data to intersecting domains (identity here)."""
        if len(args) == 0:
            return None
        if len(args) == 1:
            return args[0]
        return tuple(args)

    def exchange_scalar(self, value):
        """reference pm.py:1146-1157: scalars skip the exchange."""
        return value

    def gather(self, data, mode='sum', out=None):
        """Reduce ghost images back to their hosts (identity here).

        Supported modes mirror the reference: 'sum', 'any', 'mean',
        'all', 'local' (domain.py:208-318).
        """
        if mode in ('sum', 'any', 'mean', 'all', 'local'):
            return data
        if isinstance(mode, np.ufunc):
            return data
        raise NotImplementedError(mode)

    def get_exchange_cost(self):
        return np.array([0])


class GridND(object):
    """Decomposition geometry (reference domain.py:320-652).

    Retained for API parity and for host-side load introspection; the
    device-side routing is handled by jax sharding.
    """

    def __init__(self, edges, comm=None, periodic=True, DomainAssign=None):
        self.edges = [np.asarray(g) for g in edges]
        self.shape = np.array([len(g) - 1 for g in edges], dtype='int32')
        self.ndim = len(self.shape)
        self.periodic = periodic
        self.size = int(np.prod(self.shape))
        self.comm = comm if comm is not None else FakeComm()
        if DomainAssign is None:
            DomainAssign = np.zeros(self.size, dtype='int32')
        self.DomainAssign = DomainAssign

    @classmethod
    def uniform(cls, BoxSize, comm=None, periodic=True):
        ndim = len(BoxSize)
        edges = [np.linspace(0, BoxSize[i], 2, endpoint=True)
                 for i in range(ndim)]
        return cls(edges, comm, periodic)

    def decompose(self, pos, smoothing=0, transform=None):
        return Layout(smoothing=smoothing, npart=len(pos))

    def load(self, pos, transform=None, gamma=2):
        """Per-domain particle-count cost N^gamma (domain.py:409-465)."""
        pos = np.asarray(pos)
        if transform is None:
            transform = lambda x: x
        if len(pos) == 0:
            return np.zeros(self.size)
        chunk = np.asarray(transform(pos))
        sil = np.empty((self.ndim, len(pos)), dtype='i8')
        for j in range(self.ndim):
            t = chunk[:, j]
            if self.periodic:
                t = np.remainder(t, self.edges[j][-1])
            sil[j] = np.digitize(t, self.edges[j]) - 1
        mode = 'raise' if self.periodic else 'clip'
        dom = np.ravel_multi_index(sil, self.shape, mode=mode)
        counts = np.bincount(dom, minlength=self.size)
        return counts.astype('f8') ** gamma

    def loadbalance(self, domainload):
        """Greedy heap bin-packing of domains onto ranks
        (domain.py:468-499)."""
        import heapq
        if self.size <= self.comm.size:
            return
        domains = sorted([(domainload[i], i) for i in range(self.size)],
                         reverse=True)
        processes = [(0, i) for i in range(self.comm.size)]
        heapq.heapify(processes)
        for dload, dindex in domains:
            pload, rank = heapq.heappop(processes)
            pload += dload
            self.DomainAssign[dindex] = rank
            heapq.heappush(processes, (pload, rank))

    def isprimary(self, pos, transform=None):
        """All positions are primary on the single logical domain."""
        return np.ones(len(pos), dtype='?')
