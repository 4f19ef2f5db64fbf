"""Domain decomposition and the Layout routing plan.

The reference (pmesh/domain.py) decomposes space into cubinoid domains
owned by MPI ranks and moves ghost copies of particles across ranks
with packed Alltoallv exchanges (Layout.exchange, domain.py:138-206)
and reduction gathers (Layout.gather, domain.py:208-318).  The patch
enumeration and rank dedup live in a Cython kernel
(pmesh/_domain.pyx:9-122, gridnd_fill).

This module provides the same semantics on global arrays:

- :class:`GridND` — the decomposition geometry: N-d grid of domains,
  ``DomainAssign`` mapping domains onto ranks, degenerate-domain
  masking, load measurement and greedy load balancing.
- :meth:`GridND.decompose` — the gridnd_fill role: for every particle,
  enumerate the domains its smoothing ball intersects (with periodic
  wrap), map them through DomainAssign, dedup repeated ranks, and
  build a :class:`Layout`.
- :class:`Layout` — the exact routing plan.  ``exchange`` produces
  the ghost image array grouped by destination rank (the reference's
  packed-Alltoallv receive buffer, viewed globally); ``gather``
  reduces images back to their source particles with
  sum/mean/any/all/local/ufunc modes.

The decomposition here is *host-built*: ``decompose`` needs concrete
positions (it is the analog of the reference's collective Alltoall of
counts, which also cannot run inside a traced program).  The rebuilt
``exchange``/``gather`` are pure jnp gathers/scatter-adds over the
host-computed index plan, so they trace, jit and differentiate.

For particle arrays that are **device-sharded** over a jax mesh, the
capacity-padded, fully-jittable routing plan lives in
:mod:`pmesh_tpu.parallel.exchange` (ShardedLayout); ParticleMesh picks
between the two in :meth:`pmesh_tpu.pm.ParticleMesh.decompose`.
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
    """Routing plan of a domain decomposition over global arrays.

    Mirrors pmesh.domain.Layout (reference domain.py:82-318).  The
    plan is a host-computed ``indices`` array grouped by destination
    rank: image ``j`` is a copy of source particle ``indices[j]``
    delivered to rank ``ranks[j]`` (non-decreasing).  ``exchange``
    materializes the image buffer with one gather; ``gather`` reduces
    it back with one scatter-add (or the requested reduction).

    Do not construct directly; use :meth:`GridND.decompose` (or
    ``ParticleMesh.decompose``).
    """

    def __init__(self, npart, nranks=1, counts=None, indices=None,
                 ranks=None, smoothing=0, comm=None):
        self.comm = comm if comm is not None else FakeComm()
        self.smoothing = smoothing
        self.npart = npart
        self.nranks = nranks
        if indices is None:
            # trivial single-domain plan: one image per particle
            counts = np.array([npart], dtype='i8')
            indices = None           # identity; materialized lazily
            ranks = None
            nranks = 1
        self.sendcounts = (np.asarray(counts, dtype='i8')
                           if counts is not None
                           else np.array([npart], dtype='i8'))
        self.indices = indices       # None means identity
        self.ranks = ranks
        self.sendlength = npart
        self.recvlength = (npart if indices is None
                           else int(len(indices)))
        self.recvcounts = self.sendcounts
        offsets = np.zeros(len(self.sendcounts) + 1, dtype='i8')
        offsets[1:] = np.cumsum(self.sendcounts)
        self.offsets = offsets

    @property
    def trivial(self):
        return self.indices is None

    def exchange(self, *args, pack=True):
        """Deliver data to intersecting domains (reference
        domain.py:138-206).  Returns, per argument, the image buffer:
        ``data.take(indices)`` grouped by destination rank."""
        if len(args) == 0:
            return None
        if self.trivial:
            r = args
        else:
            idx = jnp.asarray(self.indices)
            r = tuple(jnp.take(jnp.asarray(a), idx, axis=0)
                      for a in args)
        if len(args) == 1:
            return r[0]
        return tuple(r)

    def exchange_scalar(self, value):
        """reference pm.py:1146-1157: scalars skip the exchange."""
        return value

    def gather(self, data, mode='sum', out=None):
        """Reduce ghost images back to their source particles
        (reference domain.py:208-318).

        Modes: 'sum', 'mean', 'any', 'all', 'local', or a numpy ufunc.
        'all' returns the un-reduced image buffer.  'local' keeps only
        the image delivered to the particle's own primary rank
        (reference: the entries that did not leave their origin rank).
        """
        if self.trivial:
            if mode in ('sum', 'any', 'mean', 'all', 'local'):
                return data
            if isinstance(mode, np.ufunc):
                return data
            raise NotImplementedError(mode)

        data = jnp.asarray(data)
        if data.shape[0] != self.recvlength:
            raise ValueError(
                "gather expects data of the exchange result length %d, "
                "got %d" % (self.recvlength, data.shape[0]))
        idx = jnp.asarray(self.indices)
        shape = (self.sendlength,) + data.shape[1:]

        if mode == 'all':
            return data
        if mode == 'sum':
            return jnp.zeros(shape, data.dtype).at[idx].add(data)
        if mode == 'mean':
            s = jnp.zeros(shape, data.dtype).at[idx].add(data)
            n = np.bincount(self.indices, minlength=self.sendlength)
            n = n.reshape((self.sendlength,) + (1,) * (data.ndim - 1))
            return s / jnp.asarray(n, dtype=data.dtype)
        if mode == 'any':
            return jnp.zeros(shape, data.dtype).at[idx].set(data)
        if mode == 'local':
            # images delivered to the primary rank of their particle
            mask = np.asarray(self._primary_image_mask())
            out = jnp.zeros(shape, data.dtype)
            sel = np.nonzero(mask)[0]
            return out.at[self.indices[sel]].set(data[jnp.asarray(sel)])
        if isinstance(mode, np.ufunc):
            # host-side general reduction (reference reduceat path)
            datah = np.asarray(data)
            order = np.argsort(self.indices, kind='stable')
            sortd = datah[order]
            n = np.bincount(self.indices, minlength=self.sendlength)
            off = np.zeros(self.sendlength, dtype='intp')
            off[1:] = np.cumsum(n)[:-1]
            return mode.reduceat(sortd, off)
        raise NotImplementedError(mode)

    def _primary_image_mask(self):
        if getattr(self, '_primary_mask', None) is None:
            # first image of each particle (lowest rank) is primary
            mask = np.zeros(self.recvlength, dtype='?')
            order = np.argsort(self.indices, kind='stable')
            firsts = order[np.unique(self.indices[order],
                                     return_index=True)[1]]
            mask[firsts] = True
            self._primary_mask = mask
        return self._primary_mask

    def get_exchange_cost(self):
        """Per-rank count of items sent to another rank (reference
        domain.py:125-136).  In the global-array embedding all data
        conceptually originates on rank 0."""
        cost = np.array(self.sendcounts, dtype='i8', copy=True)
        if len(cost) > 0:
            cost[0] = 0
        return cost


class GridND(object):
    """Domain decomposition on a uniform N-d grid of cubinoids
    (reference domain.py:320-652).

    ``DomainAssign`` maps each of ``prod(shape)`` domains onto one of
    ``comm.size`` logical ranks; :meth:`loadbalance` rewrites it from
    measured loads and :meth:`decompose` consumes it.
    """

    def __init__(self, edges, comm=None, periodic=True, DomainAssign=None):
        self.edges = [np.asarray(g, dtype='f8') for g in edges]
        self.shape = np.array([len(g) - 1 for g in edges], dtype='int32')
        self.ndim = len(self.shape)
        self.periodic = periodic
        self.size = int(np.prod(self.shape))
        self.comm = comm if comm is not None else FakeComm()

        if DomainAssign is None:
            if self.comm.size >= self.size:
                DomainAssign = np.arange(self.size, dtype='int32')
            else:
                DomainAssign = np.empty(self.size, dtype='int32')
                for i in range(self.comm.size):
                    start = i * self.size // self.comm.size
                    end = (i + 1) * self.size // self.comm.size
                    DomainAssign[start:end] = i
        self.DomainAssign = np.asarray(DomainAssign, dtype='int32')

        # degenerate domains have an empty edge along some direction
        # (reference domain.py:397-405); they receive no particles
        dd = np.zeros(tuple(self.shape), dtype='?')
        for i, edge in enumerate(self.edges):
            d1 = (edge[1:] == edge[:-1])
            dd |= d1.reshape([-1 if ii == i else 1
                              for ii in range(self.ndim)])
        self.DomainDegenerate = dd.ravel()

        self._update_primary_regions()

    @classmethod
    def uniform(cls, BoxSize, comm=None, periodic=True):
        """Near-cubical domain grid for ``comm.size`` ranks
        (reference domain.py:349-368)."""
        comm = comm if comm is not None else FakeComm()
        ndim = len(BoxSize)
        r = (1.0 * comm.size / np.prod(BoxSize) * min(BoxSize)) \
            ** (1.0 / ndim)
        shape = np.array([r * (BoxSize[i] / min(BoxSize))
                          for i in range(ndim)])
        imax = shape.argmax()
        shape = np.int32(shape)
        shape[shape < 1] = 1
        shape[imax] = 1
        shape[imax] = comm.size // np.prod(shape)
        edges = [np.linspace(0, BoxSize[i], shape[i] + 1, endpoint=True)
                 for i in range(ndim)]
        return cls(edges, comm, periodic)

    # --- geometry helpers -------------------------------------------
    def _sil_sir(self, pos, smoothing, transform):
        """Per-axis domain patch [sil, sir) of every particle
        (reference domain.py:605-634)."""
        if transform is None:
            transform = lambda x: x
        pos = np.asarray(pos)
        chunk = np.asarray(transform(pos))[..., :self.ndim]
        n = len(pos)
        sil = np.empty((self.ndim, n), dtype='i8')
        sir = np.empty((self.ndim, n), dtype='i8')
        sm = np.empty(self.ndim, dtype='f8')
        sm[:] = smoothing
        for j in range(self.ndim):
            tmp = chunk[:, j]
            if self.periodic:
                boxsize = self.edges[j][-1]
                c = np.remainder(tmp, boxsize)
                l = np.digitize((c - sm[j]) % boxsize, self.edges[j])
                r = np.digitize((c + sm[j]) % boxsize, self.edges[j])
                p = np.digitize(c, self.edges[j])
                l = p - (p - l) % self.shape[j] - 1
                r = p + (r - p) % self.shape[j]
                sil[j] = l
                sir[j] = r
            else:
                l = np.digitize(tmp - sm[j], self.edges[j])
                r = np.digitize(tmp + sm[j], self.edges[j])
                sil[j] = np.clip(l - 1, 0, self.shape[j])
                sir[j] = np.clip(r, 0, self.shape[j])
        return sil, sir

    def decompose(self, pos, smoothing=0, transform=None):
        """Build the exact :class:`Layout` for these positions
        (reference domain.py:561-652 + _domain.pyx:9-122).

        Needs concrete (host-available) positions; inside a jitted
        trace use the device-sharded plan from parallel/exchange.py.
        """
        try:
            pos = np.asarray(pos)
        except Exception:
            raise ValueError(
                "GridND.decompose needs concrete positions (it "
                "builds the exact ragged routing plan on the host); "
                "under jit use ParticleMesh.decompose on a device "
                "mesh, which builds the capacity-padded "
                "ShardedLayout instead")
        npart = len(pos)
        nranks = self.comm.size
        if npart == 0:
            return Layout(npart=0, nranks=nranks,
                          counts=np.zeros(nranks, dtype='i8'),
                          indices=np.empty(0, dtype='i8'),
                          ranks=np.empty(0, dtype='i8'),
                          smoothing=smoothing, comm=self.comm)

        sil, sir = self._sil_sir(pos, smoothing, transform)

        # enumerate the patch offsets up to the max patch extent per
        # axis; mask offsets beyond each particle's own [sil, sir)
        extents = [int(np.max(sir[j] - sil[j])) for j in range(self.ndim)]
        strides = np.ones(self.ndim, dtype='i8')
        for j in range(self.ndim - 2, -1, -1):
            strides[j] = strides[j + 1] * self.shape[j + 1]

        pairs_part = []
        pairs_rank = []
        import itertools
        for offs in itertools.product(*[range(max(e, 0))
                                        for e in extents]):
            valid = np.ones(npart, dtype='?')
            target = np.zeros(npart, dtype='i8')
            for j in range(self.ndim):
                t = sil[j] + offs[j]
                valid &= t < sir[j]
                if self.periodic:
                    t = np.remainder(t, self.shape[j])
                target += t * strides[j]
            target = np.where(valid, target, 0)
            degen = self.DomainDegenerate[target]
            valid &= ~degen
            rank = self.DomainAssign[target]
            sel = np.nonzero(valid)[0]
            pairs_part.append(sel)
            pairs_rank.append(rank[sel])

        part = np.concatenate(pairs_part) if pairs_part else \
            np.empty(0, dtype='i8')
        rank = np.concatenate(pairs_rank) if pairs_rank else \
            np.empty(0, dtype='i8')

        # dedup (particle, rank) pairs: a patch spanning two domains
        # of the same rank ships ONE copy (reference _domain.pyx
        # unique-target push, 103-115)
        key = part * np.int64(nranks) + rank
        key = np.unique(key)
        part = key // nranks
        rank = key % nranks

        # group by destination rank, source order within each rank
        order = np.lexsort((part, rank))
        part = part[order]
        rank = rank[order]
        counts = np.bincount(rank, minlength=nranks)
        return Layout(npart=npart, nranks=nranks, counts=counts,
                      indices=part, ranks=rank, smoothing=smoothing,
                      comm=self.comm)

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
        (domain.py:468-499); rewrites DomainAssign and the primary
        regions that :meth:`isprimary` and :meth:`decompose` consume."""
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
        self._update_primary_regions()

    def _update_primary_regions(self):
        """Per-rank list of (start, end) boxes of owned domains
        (reference domain.py:501-517), for all ranks at once."""
        regions = []
        for r in range(self.comm.size):
            my = np.nonzero(self.DomainAssign == r)[0]
            if len(my) == 0:
                regions.append(None)
                continue
            start = np.empty((len(my), self.ndim))
            end = np.empty((len(my), self.ndim))
            for i, dom in enumerate(my):
                di = np.unravel_index(dom, tuple(self.shape))
                start[i] = [g[k] for g, k in zip(self.edges, di)]
                end[i] = [g[k + 1] for g, k in zip(self.edges, di)]
            regions.append({'start': start, 'end': end})
        self.primary_regions = regions
        self.primary_region = regions[self.comm.rank]

    def isprimary(self, pos, transform=None, rank=None):
        """True where pos falls in ``rank``'s primary region
        (reference domain.py:519-559)."""
        if rank is None:
            rank = self.comm.rank
        region = self.primary_regions[rank]
        if region is None:
            return np.zeros(len(pos), dtype='?')
        if transform is None:
            transform = lambda x: x
        chunk = np.asarray(transform(np.asarray(pos)))[..., :self.ndim]
        if self.periodic:
            BoxSize = np.array([self.edges[j][-1]
                                for j in range(self.ndim)])
            chunk = np.remainder(chunk, BoxSize)
        r = np.zeros(len(pos), dtype='?')
        for j in range(len(region['start'])):
            r |= ((chunk >= region['start'][j])
                  & (chunk < region['end'][j])).all(axis=-1)
        return r

    def which_rank(self, pos, transform=None):
        """Rank owning each position's home domain."""
        if transform is None:
            transform = lambda x: x
        chunk = np.asarray(transform(np.asarray(pos)))[..., :self.ndim]
        sil = np.empty((self.ndim, len(chunk)), dtype='i8')
        for j in range(self.ndim):
            t = chunk[:, j]
            if self.periodic:
                t = np.remainder(t, self.edges[j][-1])
            sil[j] = np.digitize(t, self.edges[j]) - 1
        mode = 'raise' if self.periodic else 'clip'
        dom = np.ravel_multi_index(sil, tuple(self.shape), mode=mode)
        return self.DomainAssign[dom]
