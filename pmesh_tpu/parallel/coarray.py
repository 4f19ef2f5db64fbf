"""CoArray-style one-sided access over a device mesh (experimental).

Parity shim for the reference's pmesh/coarray.py — which its own
docstring calls a failed experiment in one-sided MPI-style messaging
(reference coarray.py:1-57) and which nothing else in the library
uses.  On TPU the experiment actually has a natural home: a shard of
a global ``jax.Array`` *is* addressable from every device through
collectives, so "fetch rank r's block" is an ``all_gather`` + index
rather than an Isend/Irecv rendezvous, and the deferred-sync window of
the reference (coarray.py:258-296) corresponds to XLA batching the
collectives of one jitted program.

This stays experimental here too: it is not used by the engine and is
exported only for API-parity exploration.

Usage::

    ca = CoArray(global_array, procmesh)     # sharded over axis 0
    blk = ca[r]          # the block owned by device r (host value)
    ca2 = ca.map(fn)     # elementwise update, lazily, per shard
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["CoArray"]


class CoArray(object):
    """A global array viewed as per-device blocks.

    The array is slab-sharded over ``procmesh``'s axis.  Indexing with
    an integer device index returns that device's block; slicing
    semantics beyond that are intentionally not provided (the failed
    part of the reference experiment was exactly the proxy/slicing
    algebra, coarray.py:100-250 — we keep the surface minimal).
    """

    def __init__(self, value, procmesh):
        value = jnp.asarray(value)
        self.procmesh = procmesh
        n = procmesh.size
        if value.shape[0] % n != 0:
            raise ValueError("axis 0 (%d) must divide evenly over %d "
                             "devices" % (value.shape[0], n))
        sharding = NamedSharding(
            procmesh.mesh, P(procmesh.axis,
                             *([None] * (value.ndim - 1))))
        self.value = jax.device_put(value, sharding)

    @property
    def blocksize(self):
        return self.value.shape[0] // self.procmesh.size

    def __len__(self):
        return self.procmesh.size

    def __getitem__(self, rank):
        """One-sided read of device ``rank``'s block (to host)."""
        rank = int(rank)
        b = self.blocksize
        return np.asarray(self.value[rank * b:(rank + 1) * b])

    def map(self, fn):
        """Apply ``fn`` per block, returning a new CoArray; the update
        runs where the data lives (the put side of the experiment)."""
        out = jax.jit(jax.vmap(fn))(
            self.value.reshape((len(self),) + (self.blocksize,)
                               + self.value.shape[1:]))
        return CoArray(out.reshape(self.value.shape), self.procmesh)

    def allgather(self):
        """The full array on host (the sync point)."""
        return np.asarray(self.value)
