"""ProcessMesh — the device-mesh analog of pfft.ProcMesh.

The reference builds an (npx, npy) MPI process grid
(pfft.ProcMesh, pm.py:1319-1327) and partitions the FFT mesh into
pencils over it.  Here the process grid is a jax.sharding.Mesh over
TPU devices; fields are global jax Arrays with NamedShardings and the
FFT/paint fast paths drop into shard_map over this mesh.

The primary decomposition is a 1-d slab over axis 'x' of the mesh
(the full device count).  A slab split needs exactly one all_to_all
per transform direction, no padding of the hermitian-compressed axis,
and its transposes ride ICI as one large fused collective — the right
trade for pods up to Nmesh devices.  (The reference defaults to a 2-d
pencil because MPI rank counts routinely exceed Nmesh; TPU pod sizes
do not.)
"""
import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ProcessMesh"]


class ProcessMesh(object):
    """A 1-d slab decomposition over a jax device mesh.

    Parameters
    ----------
    devices : list of jax devices, or None for all.
    axis : str
        mesh axis name, default 'x'.
    """

    def __init__(self, devices=None, axis='x'):
        if devices is None:
            devices = jax.devices()
        self.devices = tuple(devices)
        self.axis = axis
        self.mesh = Mesh(np.array(self.devices), (axis,))

    @property
    def size(self):
        return len(self.devices)

    @property
    def shape(self):
        return (len(self.devices),)

    def _key(self):
        return (tuple(d.id for d in self.devices), self.axis)

    def __eq__(self, other):
        return (isinstance(other, ProcessMesh)
                and self._key() == other._key())

    def __hash__(self):
        return hash(self._key())

    # --- shardings for the field layouts ---
    def real_spec(self, ndim):
        """RealField: slab over the first axis."""
        return P(self.axis, *([None] * (ndim - 1)))

    def transposed_spec(self, ndim):
        """TransposedComplexField: the post-FFT layout — first axis
        full, second axis sharded (the pfft TRANSPOSED_OUT analog)."""
        if ndim < 2:
            return P(*([None] * ndim))
        return P(None, self.axis, *([None] * (ndim - 2)))

    def untransposed_spec(self, ndim):
        """UntransposedComplexField: same slab layout as RealField."""
        return self.real_spec(ndim)

    def replicated_sharding(self, ndim):
        """fully-replicated layout: the fallback for meshes whose
        extents do not divide the device count — jax rejects uneven
        block NamedShardings everywhere (device_put AND
        with_sharding_constraint), so the reference's uneven pfft
        edges (pm.py:1319-1327) map to replication here.  Only small
        or odd-sized meshes hit this; the data stays resident on the
        process mesh so it composes with pjit steps over it."""
        return NamedSharding(self.mesh, P(*([None] * ndim)))

    def real_sharding(self, ndim):
        return NamedSharding(self.mesh, self.real_spec(ndim))

    def transposed_sharding(self, ndim):
        return NamedSharding(self.mesh, self.transposed_spec(ndim))

    def untransposed_sharding(self, ndim):
        return NamedSharding(self.mesh, self.untransposed_spec(ndim))
