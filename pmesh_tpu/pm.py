"""ParticleMesh and Field types — the core public API.

TPU-native rebuild of pmesh.pm (reference: pmesh/pm.py).  The headline
design difference: fields hold **global** jax arrays.  Where the
reference keeps per-rank local slabs plus (start, cshape) bookkeeping
and threads an MPI communicator through every call, here the global
mesh is a single jax.Array whose sharding over a device mesh is a
*layout property* handled by jax.sharding / shard_map, not an API
concept.  Consequences:

- ``cgetitem/csetitem`` (reference pm.py:287-345) are plain global
  indexing with the hermitian dual bookkeeping preserved;
- ``ravel/unravel`` (pm.py:389-448, via mpsort) are reshapes;
- ``resample`` (pm.py:479-547, via mpsort.take) is a gather;
- collective reductions (csum/cdot/cnorm, pm.py:725-743, 897-974) are
  jnp reductions — XLA inserts the cross-device psums.

All operations are functional: ops return new Fields; the reference's
``out=Ellipsis`` in-place convention is honored by rebinding the
Python-level ``.value`` of the Field object (safe under jit tracing).

Differentiability: paint/readout/r2c/c2r carry custom VJPs matching
the reference's analytic operators (pm.py:793-859, 865-870, 1021-1045,
1872-1935), so whole pipelines jax.grad end-to-end.
"""
import functools
import operator
import numbers

import numpy as np
import jax
import jax.numpy as jnp

from .window import Affine, FindResampler, ResampleWindow
from .ops import fft as _fft
from .ops import paint as _paint_ops
from .parallel.domain import Layout, FakeComm

__all__ = ["ParticleMesh", "RealField", "ComplexField",
           "TransposedComplexField", "UntransposedComplexField", "Field"]

_gettype = type


@functools.lru_cache(maxsize=None)
def _constrain_uneven_fn(sharding):
    # jit cached per sharding: with_sharding_constraint is the only
    # entry point jax allows for uneven block NamedShardings
    return jax.jit(lambda v: jax.lax.with_sharding_constraint(
        v, sharding))


def _constrain_uneven(value, sharding):
    return _constrain_uneven_fn(sharding)(value)


def is_inplace(out):
    return out is Ellipsis


@jax.jit
def _split_complex(value):
    return jnp.real(value), jnp.imag(value)


def to_numpy(value):
    """Device -> host transfer that works for complex arrays on
    backends without native complex transfer (the axon TPU tunnel
    reports UNIMPLEMENTED): split into (real, imag) inside jit and
    reassemble on the host."""
    value = jnp.asarray(value)
    if jnp.issubdtype(value.dtype, jnp.complexfloating):
        re, im = _split_complex(value)
        return np.asarray(re) + 1j * np.asarray(im)
    return np.asarray(value)


class xlist(list):
    """A list of broadcastable coordinate arrays with the reference's
    ``normp`` helper (reference xslab, pm.py:122-136)."""

    def normp(self, p=2, zeromode=None):
        kk = sum([abs(ki) ** p for ki in self])
        if zeromode is not None:
            kk = jnp.where(kk == 0, zeromode, kk)
        return kk


class slabiter(object):
    """Host-side iteration over the slowest axis, for porting code that
    used the reference slab iterator (pm.py:87-120).  Slabs are
    read-only jnp slices here; use ``apply`` for mutation."""

    def __init__(self, field):
        self.field = field
        self.nslabs = field.shape[0] if field.ndim > 2 else 1
        self.x = _xslabiter(field, 'x', self.nslabs)
        self.i = _xslabiter(field, 'i', self.nslabs)

    def __iter__(self):
        f = self.field
        if f.ndim <= 2:
            yield f.value
            return
        for irow in range(self.nslabs):
            yield f.value[irow]


class _xslabiter(object):
    def __init__(self, field, attr, nslabs):
        self.field = field
        self.attr = attr
        self.nslabs = nslabs

    def __iter__(self):
        f = self.field
        coords = getattr(f, self.attr)
        if f.ndim <= 2:
            s = xlist(coords)
            s.BoxSize = f.BoxSize
            s.Nmesh = f.Nmesh
            yield s
            return
        for irow in range(self.nslabs):
            s = xlist([coords[0].reshape(-1)[irow].reshape((1,) * (f.ndim - 1))
                       if d == 0 else coords[d][0]
                       for d in range(f.ndim)])
            s.BoxSize = f.BoxSize
            s.Nmesh = f.Nmesh
            yield s


class Field(object):
    """Base class of RealField and the ComplexFields.

    Holds a single global jax array in ``.value``.  Registered as a
    jax pytree so Fields pass through jit/grad/vmap directly.
    """

    def __init__(self, pm, value=None, base=None):
        self.pm = pm
        self.BoxSize = pm.BoxSize
        self.Nmesh = pm.Nmesh
        self.ndim = pm.ndim
        shape, dtype = pm._shape_dtype(type(self))
        self.cshape = np.array(shape, dtype='intp')
        if value is None:
            value = jnp.zeros(shape, dtype=dtype)
        else:
            value = jnp.asarray(value)
            if value.shape != tuple(shape):
                value = jnp.broadcast_to(value, tuple(shape))
            value = value.astype(dtype)
        sharding = pm._sharding_for(type(self))
        if sharding is not None and not isinstance(
                value, jax.core.Tracer):
            value = jax.device_put(value, sharding)
        elif ((pm._uneven1d or pm._pencil2d)
              and not isinstance(value, jax.core.Tracer)):
            # uneven extents: device_put rejects uneven NamedShardings
            # but with_sharding_constraint inside jit accepts them —
            # XLA derives the best divisor block split (far below the
            # O(mesh)-per-device cost of replication)
            value = _constrain_uneven(
                value, pm._uneven_sharding_for(type(self)))
        self.value = value

    # --- pytree protocol ---
    def tree_flatten(self):
        return (self.value,), self.pm

    @classmethod
    def tree_unflatten(cls, pm, children):
        obj = cls.__new__(cls)
        obj.pm = pm
        obj.BoxSize = pm.BoxSize
        obj.Nmesh = pm.Nmesh
        obj.ndim = pm.ndim
        obj.cshape = np.array(pm._shape_dtype(cls)[0], dtype='intp')
        obj.value = children[0]
        return obj

    # --- basic array-protocol conveniences ---
    def __repr__(self):
        return '%s:%r' % (type(self).__name__, self.value)

    @property
    def shape(self):
        return self.value.shape

    @property
    def size(self):
        return self.value.size

    @property
    def csize(self):
        return int(functools.reduce(operator.mul, self.cshape, 1))

    @property
    def dtype(self):
        return self.value.dtype

    @property
    def start(self):
        # global arrays: the local view begins at the origin
        return np.zeros(self.ndim, dtype='intp')

    @property
    def slices(self):
        return tuple([slice(0, n) for n in self.shape])

    @property
    def real(self):
        return self.value.real

    @property
    def imag(self):
        return self.value.imag

    @property
    def flat(self):
        return self.value.reshape(-1)

    def __getitem__(self, index):
        return self.value.__getitem__(index)

    def __setitem__(self, index, value):
        """Functional in-place update: rebinds .value."""
        if isinstance(value, Field):
            value = value.value
        if index is Ellipsis:
            value = jnp.asarray(value)
            self.value = jnp.broadcast_to(
                value, self.value.shape).astype(self.dtype)
            return
        self.value = self.value.at[index].set(value)

    def __array__(self, dtype=None):
        a = to_numpy(self.value)
        return a.astype(dtype) if dtype is not None else a

    def numpy(self):
        """The field value as a host numpy array."""
        return to_numpy(self.value)

    def _cast_binop(self, other):
        if isinstance(other, Field):
            return other.value
        return other

    def _wrap(self, value):
        if jnp.shape(value) != self.value.shape or value.dtype.kind == 'b':
            return value
        return self.pm.create(type=_gettype(self), value=value)

    def __add__(self, other):
        return self._wrap(self.value + self._cast_binop(other))
    __radd__ = __add__

    def __sub__(self, other):
        return self._wrap(self.value - self._cast_binop(other))

    def __rsub__(self, other):
        return self._wrap(self._cast_binop(other) - self.value)

    def __mul__(self, other):
        return self._wrap(self.value * self._cast_binop(other))
    __rmul__ = __mul__

    def __truediv__(self, other):
        return self._wrap(self.value / self._cast_binop(other))

    def __rtruediv__(self, other):
        return self._wrap(self._cast_binop(other) / self.value)

    def __pow__(self, other):
        return self._wrap(self.value ** self._cast_binop(other))

    def __neg__(self):
        return self._wrap(-self.value)

    def __abs__(self):
        return self._wrap(jnp.abs(self.value))

    def __iadd__(self, other):
        self.value = self.value + self._cast_binop(other)
        return self

    def __isub__(self, other):
        self.value = self.value - self._cast_binop(other)
        return self

    def __imul__(self, other):
        self.value = self.value * self._cast_binop(other)
        return self

    def __itruediv__(self, other):
        self.value = self.value / self._cast_binop(other)
        return self

    def __eq__(self, other):
        if isinstance(other, Field):
            other = other.value
        return self.value == other

    # elementwise __eq__ with identity hashing (the torch-tensor
    # convention): fields can key dicts/sets by object identity
    # instead of raising through a None __hash__
    __hash__ = object.__hash__

    def copy(self):
        return self.pm.create(_gettype(self), value=self.value)

    def _check_compatible(self, other):
        if isinstance(other, Field):
            if not isinstance(other, _gettype(self)):
                raise TypeError(
                    "type of two operands of cdot must be the same type")
        else:
            assert np.shape(other) == tuple(self.shape)

    # --- coordinates ---
    @property
    def x(self):
        return self.pm.create_coords(_gettype(self), return_indices=False)

    @property
    def i(self):
        return self.pm.create_coords(_gettype(self), return_indices=True)

    @property
    def slabs(self):
        return slabiter(self)

    @property
    def compressed(self):
        """Whether the field stores the hermitian-compressed half
        spectrum (reference pm.py:356-375)."""
        if self.Nmesh[-1] == self.cshape[-1]:
            return False
        elif self.Nmesh[-1] // 2 + 1 == self.cshape[-1]:
            return True
        raise ValueError("inconsistent Nmesh %s / cshape %s"
                         % (self.Nmesh, self.cshape))

    # --- collective accessors (global arrays: plain indexing) ---
    def _normalize_index(self, index):
        index = np.array(index, copy=True)
        if len(index) == self.ndim + 1:
            comp = int(index[-1])
            index1 = index[:-1]
        elif len(index) == self.ndim:
            comp = None
            index1 = index
        else:
            raise IndexError("only vector index is supported; for complex "
                             "append 0/1 for real/imag")
        index1[index1 < 0] += self.Nmesh[index1 < 0]
        return tuple(index1), comp

    def cgetitem(self, index):
        """Get a value by absolute (global) index (pm.py:287-296).

        On a hermitian-compressed complex field, modes stored only as
        conjugates (last-axis index beyond the compressed extent) are
        reconstructed from the dual index — mirroring csetitem's
        bookkeeping instead of letting JAX clamp the out-of-bounds
        read to a neighbor.
        """
        ind, comp = self._normalize_index(index)
        conj = False
        shape = self.value.shape
        if any(ind[d] >= shape[d] for d in range(self.ndim)):
            ind = tuple((self.Nmesh[d] - ind[d]) % self.Nmesh[d]
                        for d in range(self.ndim))
            conj = True
            if any(ind[d] >= shape[d] for d in range(self.ndim)):
                raise IndexError("index %s out of bounds for shape %s"
                                 % (ind, shape))
        v = to_numpy(self.value[ind])
        if conj:
            v = np.conjugate(v)
        if comp is None:
            return v[()]
        return (v.imag if comp == 1 else v.real)[()]

    def csetitem(self, index, y):
        """Set a value by absolute index, maintaining the hermitian
        conjugate bookkeeping; returns the value actually set
        (pm.py:298-345)."""
        ind, comp = self._normalize_index(index)
        v = self.value

        if not isinstance(self, BaseComplexField):
            if comp is not None:
                raise IndexError("real field has no real/imag index")
            self.value = v.at[ind].set(y)
            return y

        # dual (hermitian conjugate) index
        dual = tuple((self.Nmesh[d] - ind[d]) % self.Nmesh[d]
                     for d in range(self.ndim))
        shape = self.value.shape
        has_local = all(ind[d] < shape[d] for d in range(self.ndim))
        has_dual = all(dual[d] < shape[d] for d in range(self.ndim))

        y_in = y
        dualy = y_in
        if comp == 1:
            dualy = -dualy
            if has_local and has_dual and ind == dual:
                y_in = 0
                dualy = 0
            if has_local:
                v = v.at[ind].set(v[ind].real + 1j * y_in)
            if has_dual:
                v = v.at[dual].set(v[dual].real + 1j * dualy)
            # an index stored only as its conjugate still takes the
            # value (via the dual): report what cgetitem will read
            ret = y_in if (has_local or has_dual) else 0
        elif comp == 0:
            if has_local:
                v = v.at[ind].set(1j * v[ind].imag + y_in)
            if has_dual:
                v = v.at[dual].set(1j * v[dual].imag + y_in)
            ret = y_in if (has_local or has_dual) else 0
        else:
            dualy = np.conjugate(dualy)
            if has_local and has_dual and ind == dual:
                dualy = dualy.real
                y_in = np.real(y_in) if np.iscomplexobj(y_in) else y_in
            if has_local:
                v = v.at[ind].set(y_in)
            if has_dual:
                v = v.at[dual].set(dualy)
            ret = y_in if (has_local or has_dual) else 0
        self.value = v
        return ret

    def _bind_value(self, value):
        """Re-apply this field type's declared device layout before
        rebinding ``value`` (the same rule Field.__init__ uses): an
        ``out=`` of a different field type must not silently keep the
        source layout on a device mesh."""
        pm = self.pm
        sharding = pm._sharding_for(type(self))
        if sharding is not None:
            if isinstance(value, jax.core.Tracer):
                value = jax.lax.with_sharding_constraint(value,
                                                         sharding)
            else:
                value = jax.device_put(value, sharding)
        elif ((pm._uneven1d or pm._pencil2d)
              and not isinstance(value, jax.core.Tracer)):
            value = _constrain_uneven(
                value, pm._uneven_sharding_for(type(self)))
        return value

    # --- global reshaping ---
    def ravel(self, out=None):
        """C-ordered flattening of the global field (reference needs
        mpsort, pm.py:389-424; global arrays make this a reshape).

        ``out`` accepts only None or Ellipsis: jax arrays are
        immutable, so the reference's fill-into-buffer form has no
        meaning here — both forms return the flat array."""
        if out is not None and not is_inplace(out):
            raise ValueError(
                "ravel(out=...) cannot fill a caller buffer (jax "
                "arrays are immutable); pass out=None or out=... "
                "and use the returned array")
        return self.value.reshape(-1)

    def unravel(self, flat):
        if isinstance(flat, Field):
            flat = flat.value
        self.value = jnp.asarray(flat).reshape(self.value.shape).astype(
            self.dtype)

    def sort(self, out=None):
        return self.ravel(out)

    def cast(self, type, out=None):
        """Cast between field types, preserving meaning (pm.py:450-477)."""
        type = _typestr_to_type(type)
        if isinstance(self, RealField) and issubclass(type, BaseComplexField):
            r = self.r2c()
            r = self.pm.create(type, value=r.value)
        elif isinstance(self, RealField) and issubclass(type, RealField):
            r = self.pm.create(type, value=self.value)
        elif isinstance(self, BaseComplexField) and issubclass(type, RealField):
            r = self.c2r()
        else:
            r = self.pm.create(type, value=self.value)
        if out is not None and isinstance(out, Field):
            out.value = out._bind_value(r.value)
            return out
        return r

    def resample(self, out):
        """Resample by truncating or zero-filling modes (pm.py:479-547).

        ``out`` must be a Field of a different ParticleMesh.
        """
        assert isinstance(out, Field)

        if all(out.Nmesh == self.Nmesh):
            return self.cast(type=_gettype(out), out=out)

        selfc = self.cast(type=TransposedComplexField)
        target_pm = out.pm
        complex = target_pm.create(type=TransposedComplexField)

        # index table: for each output mode, the index in the source mesh
        indtable = [reindex(self.Nmesh[d], out.Nmesh[d])
                    for d in range(self.ndim)]
        ind = build_index(
            [t[np.arange(n)] for t, n in zip(indtable, complex.cshape)],
            self.cshape)

        mask = ind >= 0
        flat_src = selfc.value.reshape(-1)
        filled = jnp.where(jnp.asarray(mask),
                           flat_src[jnp.where(jnp.asarray(ind) < 0, 0,
                                              jnp.asarray(ind))],
                           0)
        cvalue = filled.reshape(tuple(complex.cshape))

        # enforce reality of self-conjugate modes; zero both Nyquists
        ii = complex.i
        selfconj = functools.reduce(
            jnp.logical_and,
            [(n - i0) % n == i0 for i0, n in zip(ii, complex.Nmesh)])
        cvalue = jnp.where(selfconj, cvalue.real + 0j, cvalue)
        nyq_out = functools.reduce(
            jnp.logical_or,
            [i0 == n // 2 for i0, n in zip(ii, complex.Nmesh)])
        nyq_in = functools.reduce(
            jnp.logical_or,
            [i0 == n // 2 for i0, n in zip(ii, self.Nmesh)])
        cvalue = jnp.where(nyq_out | nyq_in, 0, cvalue)
        complex.value = cvalue

        if isinstance(out, RealField):
            out.value = complex.c2r().value
        elif isinstance(out, UntransposedComplexField):
            out.value = cvalue
        else:
            out.value = cvalue
        return out

    def preview(self, Nmesh=None, axes=None, resampler=None, method=None):
        """Project (and optionally resample) the mesh to a numpy array
        broadcast to the host (pm.py:549-615)."""
        if axes is None:
            axes = range(self.ndim)
        if not hasattr(axes, '__iter__'):
            axes = (axes,)
        axes = list(axes)

        if isinstance(self, BaseComplexField):
            self = self.c2r()

        if Nmesh is not None and np.all(np.asarray(Nmesh) == self.Nmesh):
            Nmesh = None

        if Nmesh is not None:
            pm = self.pm.reshape(Nmesh)
            if method is None:
                method = 'downsample' if np.any(np.asarray(Nmesh)
                                                < self.Nmesh) else 'upsample'
            if method == 'downsample':
                out = pm.downsample(self, resampler=resampler, keep_mean=True)
            elif method == 'upsample':
                out = pm.upsample(self, resampler=resampler, keep_mean=True)
            else:
                raise ValueError("method must be downsample or upsample")
        else:
            out = self

        removeaxes = sorted(set(range(out.ndim)) - set(axes))
        v = out.value
        if removeaxes:
            v = v.sum(axis=tuple(removeaxes))
        # axes of v are now the kept axes in increasing order; permute
        # them into the order requested by `axes`.
        current = [a for a in range(out.ndim) if a not in removeaxes]
        perm = [current.index(a) for a in axes]
        if perm != list(range(len(perm))):
            v = v.transpose(perm)
        return np.asarray(v)

    def apply(self, func, kind, out):
        """Apply func(coords, value) over the whole field in one fused
        XLA op (the reference iterates slabs, pm.py:617-648)."""
        x = self.pm._apply_coords(_gettype(self), kind)
        result = func(x, self.value)
        if isinstance(result, Field):
            result = result.value
        result = jnp.asarray(result).astype(self.dtype)

        if out is None:
            return self.pm.create(type=_gettype(self), value=result)
        if is_inplace(out):
            self.value = result
            return self
        if isinstance(out, Field):
            out.value = result
            return out
        raise TypeError("out must be None, Ellipsis or a Field")


@jax.tree_util.register_pytree_node_class
class RealField(Field):
    def __init__(self, pm, value=None, base=None):
        Field.__init__(self, pm, value=value, base=base)

    def r2c(self, out=None):
        """Real-to-complex transform, normalized by prod(Nmesh)^-1
        (pm.py:655-694)."""
        cvalue = self.pm._r2c_value(self.value)
        if out is None or is_inplace(out) or out is self:
            return self.pm.create(type=TransposedComplexField, value=cvalue)
        assert isinstance(out, BaseComplexField)
        out.value = out._bind_value(cvalue.astype(out.dtype))
        return out

    def ctranspose(self, axes):
        """Collectively transpose the field coordinates (pm.py:696-723)."""
        assert len(np.unique(axes)) == self.ndim
        assert np.max(axes) == self.ndim - 1
        pm = self.pm.reshape(BoxSize=self.BoxSize[list(axes)],
                             Nmesh=self.Nmesh[list(axes)])
        return pm.create(type=RealField,
                         value=self.value.transpose(axes))

    def csum(self, dtype=None):
        """Collective sum over the entire mesh (pm.py:725-739)."""
        v = self.value if dtype is None else self.value.astype(dtype)
        return v.sum()

    def cmean(self, dtype=None):
        return self.csum(dtype=dtype) / self.csize

    def readout(self, pos, hsml=None, out=None, resampler=None,
                transform=None, gradient=None, layout=None,
                hsml_max=None):
        """Read out field values at positions (pm.py:745-791).

        ``hsml`` scales each particle's window support (reference
        _window_imp.c:24-47); on the sharded path a static
        ``hsml_max`` bound is required and the layout must have been
        decomposed with smoothing >= support/2 * hsml_max."""
        if transform is None:
            transform = self.pm.affine
        if resampler is None:
            resampler = self.pm.resampler
        resampler = FindResampler(resampler)

        from .parallel.exchange import ShardedLayout, readout_sharded
        from .parallel.exchange2d import (ShardedLayout2D,
                                          readout_sharded2d)
        if isinstance(layout, (ShardedLayout, ShardedLayout2D)):
            value = (self.value.real if _fft.is_c2c(self.dtype)
                     else self.value)
            _readout_fn = (readout_sharded2d
                           if isinstance(layout, ShardedLayout2D)
                           else readout_sharded)
            return _readout_fn(layout, value, pos,
                               transform.scale, resampler.window,
                               diffdir=gradient, hsml=hsml,
                               hsml_max=hsml_max,
                               translate=transform.translate)

        if layout is not None:
            pos = layout.exchange(pos)
            hsml = layout.exchange(hsml) if hsml is not None else None

        value = self.value.real if _fft.is_c2c(self.dtype) else self.value
        r = _paint_ops.readout(value, pos, window=resampler.window,
                               scale=transform.scale,
                               translate=transform.translate,
                               period=transform.period,
                               diffdir=gradient, hsml=hsml)
        if layout is not None:
            r = layout.gather(r, mode='sum')
        return r

    def readout_vjp(self, pos, v, resampler=None, transform=None,
                    gradient=None, out_self=None, out_pos=None, layout=None):
        """Analytic back-propagation of readout (pm.py:793-845)."""
        if out_pos is not False:
            if gradient is not None:
                raise ValueError("gradient of gradient is not supported")
            cols = []
            for d in range(pos.shape[1]):
                g = self.readout(pos, resampler=resampler,
                                 transform=transform, gradient=d,
                                 layout=layout)
                cols.append(g * v)
            out_pos = jnp.stack(cols, axis=-1)
        if out_self is not False:
            out_self = self.pm.paint(pos, mass=v, resampler=resampler,
                                     transform=transform, gradient=gradient,
                                     hold=False, layout=layout)
        return out_self, out_pos

    def readout_jvp(self, pos, v_self=None, v_pos=None, resampler=None,
                    transform=None, gradient=None, layout=None):
        """Forward-mode of readout (pm.py:848-859)."""
        jvp = jnp.zeros(len(pos))
        if v_pos is not None:
            for d in range(self.ndim):
                jvp = jvp + self.readout(
                    pos, resampler=resampler, transform=transform,
                    gradient=d, layout=layout) * v_pos[..., d]
        if v_self is not None:
            jvp = jvp + v_self.readout(pos, resampler=resampler,
                                       transform=transform, gradient=None,
                                       layout=layout)
        return jvp

    def paint(self, pos, mass=1.0, resampler=None, transform=None,
              hold=False, gradient=None, layout=None):
        """Deprecated in the reference (pm.py:861-863); provided for
        compatibility.  Accumulates into self."""
        out = self.pm.paint(pos, mass=mass, resampler=resampler,
                            transform=transform, hold=hold,
                            gradient=gradient, layout=layout, out=self)
        return out

    def c2r_vjp(v, out=None):
        """Back-propagate c2r gradient (pm.py:865-870)."""
        out = v.r2c(out)
        out.value = out.value * float(np.prod(out.pm.Nmesh))
        return out

    def apply(self, func, kind="relative", out=None):
        assert kind in ['relative', 'index', 'absolute']
        return Field.apply(self, func, kind, out)

    def cdot(self, other):
        self._check_compatible(other)
        other_value = other.value if isinstance(other, Field) else other
        return jnp.sum(self.value * other_value)

    def cnorm(self):
        return self.cdot(self)


class BaseComplexField(Field):

    def _expand_hermitian(self, i, y):
        """Double the weight of modes whose conjugate is not stored
        (pm.py:908-918)."""
        if not self.compressed:
            return y
        mask = (i[-1] != 0) & (i[-1] != self.Nmesh[-1] // 2)
        return y + mask * y

    def cnorm(self, metric=None, norm=lambda x: x.real ** 2 + x.imag ** 2):
        """Collective norm including hermitian conjugates (pm.py:920-943)."""
        def filter2(k, y):
            y = norm(y)
            if metric is not None:
                kk = k.normp(p=2) ** 0.5
                y = y * metric(kk)
            return y
        r = self.apply(filter2)
        r = r.apply(self._expand_hermitian, kind='index', out=Ellipsis)
        return jnp.sum(r.value).real

    def cdot(self, other, metric=None):
        """Collective inner product over independent modes (pm.py:945-974)."""
        if isinstance(other, Field):
            if not isinstance(other, _gettype(self)):
                raise TypeError(
                    "type of two operands of cdot must be the same type")
            other = other.value
        r = self.pm.create(type=_gettype(self),
                           value=jnp.conj(other) * self.value)
        r.apply(self._expand_hermitian, kind='index', out=Ellipsis)
        if metric is not None:
            r.apply(lambda k, y: y * metric(k.normp() ** 0.5), out=Ellipsis)
        return jnp.sum(r.value)

    def cdot_vjp(self, v, metric=None):
        """Gradient of cdot against other (pm.py:976-985)."""
        r = self * v
        if metric is not None:
            r.apply(lambda k, y: y * metric(k.normp() ** 0.5), out=Ellipsis)
        return r

    def c2r(self, out=None):
        rvalue = self.pm._c2r_value(self.value)
        if out is None or is_inplace(out) or out is self:
            return self.pm.create(type=RealField, value=rvalue)
        assert isinstance(out, RealField)
        out.value = out._bind_value(rvalue.astype(out.dtype))
        return out

    def r2c_vjp(v, out=None):
        """Back-propagate r2c gradient (pm.py:1021-1026)."""
        out = v.c2r(out)
        out.value = out.value * float(np.prod(out.pm.Nmesh) ** -1.0)
        return out

    def decompress_vjp(v, out=None):
        """Hermitian-compression weighting of gradients (pm.py:1028-1045)."""
        i = v.i
        mask = functools.reduce(
            jnp.logical_and,
            [(n - ii) % n == ii for ii, n in zip(i, v.Nmesh)])
        value = jnp.where(mask, v.value, 2 * v.value)
        if out is None or is_inplace(out):
            return v.pm.create(type=_gettype(v), value=value)
        out.value = value
        return out

    def apply(self, func, kind="wavenumber", out=None):
        assert kind in ['wavenumber', 'circular', 'index']
        return Field.apply(self, func, kind, out)


@jax.tree_util.register_pytree_node_class
class UntransposedComplexField(BaseComplexField):
    """Complex field preferring the input-pencil sharding layout
    (reference pm.py:1072-1078)."""
    def __init__(self, pm, value=None, base=None):
        Field.__init__(self, pm, value=value, base=base)


@jax.tree_util.register_pytree_node_class
class TransposedComplexField(BaseComplexField):
    """Complex field in the transposed (post-FFT) sharding layout —
    the fast path output of r2c (reference pm.py:1080-1086)."""
    def __init__(self, pm, value=None, base=None):
        Field.__init__(self, pm, value=value, base=base)


ComplexField = TransposedComplexField


def build_index(indices, fullshape):
    """Linear index array from per-dimension indices; -1 propagates
    (reference pm.py:1091-1126)."""
    localshape = [len(i) for i in indices]
    ndim = len(localshape)
    ind = np.zeros(localshape, dtype='i8')
    for d in range(len(indices)):
        i = np.asarray(indices[d])
        i = i.reshape([-1 if dd == d else 1 for dd in range(ndim)])
        ind[...] *= fullshape[d]
        ind[...] += i
    mask = np.zeros(localshape, dtype='?')
    for d in range(len(indices)):
        i = np.asarray(indices[d])
        i = i.reshape([-1 if dd == d else 1 for dd in range(ndim)])
        mask |= i == -1
    ind[mask] = -1
    return ind


def reindex(Nsrc, Ndest):
    """Index of each mode of an Ndest mesh in an Nsrc mesh; -1 where
    absent (reference pm.py:1128-1144)."""
    reindex = np.arange(Ndest)
    reindex[Ndest // 2 + 1:] = np.arange(Nsrc - Ndest // 2 + 1, Nsrc, 1)
    reindex[Nsrc // 2 + 1: Ndest - Nsrc // 2 + 1] = -1
    return reindex


def _typestr_to_type(typestr):
    if not isinstance(typestr, type):
        lookup = {
            'real': RealField,
            'complex': ComplexField,
            'transposedcomplex': TransposedComplexField,
            'untransposedcomplex': UntransposedComplexField,
        }
        if typestr not in lookup:
            raise ValueError("type must be real or complex")
        return lookup[typestr]
    if not issubclass(typestr, Field):
        raise TypeError("type must be a subclass of Field")
    return typestr


class ParticleMesh(object):
    """Geometry + transforms + FFT/paint entry points.

    Reference: pmesh/pm.py:1245-2028.  Differences by design:

    - no FFT plans: XLA compiles jnp.fft (single chip) or the
      shard_map pencil FFT (multi-chip) on first trace;
    - no MPI communicator: ``procmesh`` is an optional
      pmesh_tpu.parallel.ProcessMesh describing a jax device mesh;
      ``comm`` is a compatibility shim with size==1 semantics
      (the SPMD program is logically a single process);
    - fields are global; see module docstring.
    """

    def __init__(self, Nmesh, BoxSize=1.0, comm=None, np_=None, dtype='f8',
                 plan_method='estimate', resampler='cic', procmesh=None,
                 np=None):
        # `np` kept for reference API compat (process mesh shape) but the
        # numpy module is aliased carefully here.
        import numpy as _np
        if np is not None and np_ is None:
            np_ = np
        self.Nmesh = _np.array(Nmesh, dtype='i8')
        self.ndim = len(self.Nmesh)
        self.BoxSize = _np.empty(self.ndim, dtype='f8')
        self.BoxSize[:] = BoxSize
        self.dtype = _np.dtype(dtype)
        self.comm = comm if comm is not None else FakeComm()
        self.procmesh = procmesh
        self.np = (tuple(np_) if np_ is not None
                   else (procmesh.shape if procmesh is not None else ()))
        self.resampler = FindResampler(resampler)
        self.plan_method = plan_method

        self._even_mesh = True
        self._pencil2d = False
        self._uneven1d = False
        if self.procmesh is not None and self.procmesh.size > 1:
            D = self.procmesh.size
            if self.ndim < 2:
                raise ValueError(
                    "distributed 1-d meshes are not supported (the "
                    "reference is also single-rank there, "
                    "pm.py:1316-1317); drop procmesh")
            if getattr(self.procmesh, 'is2d', False):
                # 2-d (npx, npy) pencil grid (reference
                # pm.py:1319-1327): fields carry pencil shardings and
                # execution is GSPMD-global (XLA inserts the pencil
                # collectives); the hand-written shard_map fast paths
                # stay 1-d, so _even_mesh is False here by design
                self._even_mesh = False
                npx, npy = self.procmesh.grid
                self._pencil2d = all(
                    int(self.Nmesh[d]) % s == 0
                    for d in (0, 1) for s in (npx, npy))
            else:
                # the fast shard_map paths need equal blocks; a mesh
                # that does not divide (legal in the reference via
                # uneven pfft edges, pm.py:1319-1327) runs the SAME
                # slab paths with pad-and-slice (parallel/pfft
                # _r2c_uneven, exchange padded slabs) when the slabs
                # are deep enough to reach across the dead seam;
                # only tiny meshes fall back to replicated GSPMD
                self._even_mesh = all(int(self.Nmesh[d]) % D == 0
                                      for d in (0, 1))
                if not self._even_mesh:
                    from .parallel import exchange as _ex
                    rows = _ex._slab_rows(int(self.Nmesh[0]), D)
                    s = self.resampler.support * 0.5
                    need = (int(_np.ceil(s / rows)) + 1 + (D - 1)
                            - (int(self.Nmesh[0]) - 1) // rows)
                    self._uneven1d = need <= max(1, (D - 1) // 2)

        if self.dtype in (_np.dtype('f8'), _np.dtype('f4')):
            self._is_c2c = False
            self._ctype = (_np.dtype('complex128')
                           if self.dtype == _np.dtype('f8')
                           else _np.dtype('complex64'))
            self._rtype = self.dtype
        elif self.dtype in (_np.dtype('complex128'), _np.dtype('complex64')):
            self._is_c2c = True
            self._ctype = self.dtype
            self._rtype = self.dtype
        else:
            raise ValueError("dtype must be f8, f4, c16 or c8")

        # affine: simulation units -> global grid units (pm.py:1466-1475);
        # global arrays mean translate == 0.
        self.affine = Affine(self.ndim,
                             translate=0,
                             scale=1.0 * self.Nmesh / self.BoxSize,
                             period=self.Nmesh)
        self.affine_grid = Affine(self.ndim,
                                  translate=0,
                                  scale=1.0,
                                  period=self.Nmesh)
        self._coords_cache = {}

    # --- identity for pytree static comparisons ---
    def _key(self):
        return (tuple(self.Nmesh), tuple(self.BoxSize), str(self.dtype),
                self.resampler.kind, self.procmesh)

    def __eq__(self, other):
        return (isinstance(other, ParticleMesh)
                and self._key() == other._key())

    def __hash__(self):
        return hash(self._key())

    def _sharding_for(self, field_type):
        """NamedSharding of a field type over the process mesh; None
        for single-device meshes."""
        if self.procmesh is None or self.procmesh.size <= 1:
            return None
        if self._uneven1d:
            # uneven extents on the slab path: fields are stored
            # with the best block sharding GSPMD can derive (jax
            # rejects uneven NamedShardings in device_put, but
            # with_sharding_constraint accepts them and XLA picks a
            # divisor split) — handled in Field.__init__ via
            # _constrain_uneven; the compute paths pad-and-slice
            return None
        if not self._even_mesh and not self._pencil2d:
            # tiny uneven extents: too shallow to slab-shard (the
            # ghost reach would wrap the ring) — live replicated on
            # the process mesh (reference: uneven pfft edges,
            # pm.py:1319-1327)
            return self.procmesh.replicated_sharding(self.ndim)
        sh = self._named_sharding_for(field_type)
        if self._pencil2d:
            # pencil transposed layouts split the compressed last
            # axis (Zh = Nz//2+1, usually odd) over the second grid
            # axis; device_put rejects the uneven block, so route
            # through _constrain_uneven in Field.__init__
            shape, _ = self._shape_dtype(field_type)
            try:
                sh.shard_shape(tuple(int(n) for n in shape))
            except (ValueError, AssertionError):
                # fall back to splitting the second axis over BOTH
                # grid axes (even, device_put-able, still a full
                # D-way split); inside jit the pencil pipelines
                # compose on the shard_map layouts and never pay
                # this at-rest reshard
                from jax.sharding import (NamedSharding as _NS,
                                          PartitionSpec as _P)
                alt = _NS(self.procmesh.mesh,
                          _P(None, tuple(self.procmesh.axes),
                             *([None] * (self.ndim - 2))))
                try:
                    alt.shard_shape(tuple(int(n) for n in shape))
                    return alt
                except (ValueError, AssertionError):
                    return None
        return sh

    def _named_sharding_for(self, field_type):
        if issubclass(field_type, RealField):
            return self.procmesh.real_sharding(self.ndim)
        if issubclass(field_type, TransposedComplexField):
            if self.ndim == 2 and not self._is_c2c:
                # the 2-d compressed axis (Ny//2+1, odd) cannot be
                # sharded evenly; keep 2-d T fields in the slab layout
                return self.procmesh.untransposed_sharding(self.ndim)
            return self.procmesh.transposed_sharding(self.ndim)
        if issubclass(field_type, UntransposedComplexField):
            return self.procmesh.untransposed_sharding(self.ndim)
        raise TypeError(field_type)

    def _uneven_sharding_for(self, field_type):
        """The at-rest sharding request for uneven slab meshes:
        the same specs as the even layouts (GSPMD resolves the
        uneven extent to its best divisor block split)."""
        return self._named_sharding_for(field_type)

    # --- shapes ---
    def _shape_dtype(self, field_type):
        if issubclass(field_type, RealField):
            return tuple(self.Nmesh), self._rtype
        if issubclass(field_type, BaseComplexField):
            if self._is_c2c:
                return tuple(self.Nmesh), self._ctype
            shape = tuple(self.Nmesh[:-1]) + (int(self.Nmesh[-1]) // 2 + 1,)
            return shape, self._ctype
        raise TypeError(field_type)

    # --- transforms ---
    def _r2c_value(self, value):
        if self.procmesh is not None and self.procmesh.size > 1:
            if self._even_mesh or self._uneven1d:
                from .parallel import pfft as _pfft
                return _pfft.r2c(self.procmesh, value,
                                 norm=1.0 / float(np.prod(self.Nmesh)))
            if self._pencil2d:
                from .parallel import pfft as _pfft
                if _pfft.pencil_ok(self.procmesh, self.Nmesh,
                                   self.ndim):
                    # shard_map pencil transform: two explicit
                    # all_to_alls (the pfft TRANSPOSED_OUT scheme,
                    # reference pm.py:1409-1411)
                    return _pfft.r2c_pencil(
                        self.procmesh, value,
                        norm=1.0 / float(np.prod(self.Nmesh)))
                # 2-d fields / odd splits: per-axis DFT matmuls — XLA
                # partitions each contraction over the mesh (fft
                # thunks RET_CHECK the partitioned layouts GSPMD
                # assigns inside a fused step); the constraint lands
                # the transposed pencil layout
                out = _fft.r2c_matmul(
                    value, norm=1.0 / float(np.prod(self.Nmesh)))
                return _constrain_uneven(
                    out, self.procmesh.transposed_sharding(self.ndim))
            # uneven mesh: GSPMD-global transform on the replicated
            # layout (jax rejects uneven block NamedShardings)
            out = _fft.r2c(value, norm=1.0 / float(np.prod(self.Nmesh)))
            return jax.lax.with_sharding_constraint(
                out, self.procmesh.replicated_sharding(self.ndim))
        return _fft.r2c(value, norm=1.0 / float(np.prod(self.Nmesh)))

    def _c2r_value(self, value):
        if self.procmesh is not None and self.procmesh.size > 1:
            if self._even_mesh or self._uneven1d:
                from .parallel import pfft as _pfft
                return _pfft.c2r(self.procmesh, value, self.Nmesh,
                                 self._rtype,
                                 norm=float(np.prod(self.Nmesh)))
            if self._pencil2d:
                from .parallel import pfft as _pfft
                if _pfft.pencil_ok(self.procmesh, self.Nmesh,
                                   self.ndim):
                    return _pfft.c2r_pencil(
                        self.procmesh, value, self.Nmesh, self._rtype,
                        norm=float(np.prod(self.Nmesh)))
                out = _fft.c2r_matmul(value, self.Nmesh, self._rtype,
                                      norm=float(np.prod(self.Nmesh)))
                return jax.lax.with_sharding_constraint(
                    out, self.procmesh.real_sharding(self.ndim))
            out = _fft.c2r(value, self.Nmesh, self._rtype,
                           norm=float(np.prod(self.Nmesh)))
            return jax.lax.with_sharding_constraint(
                out, self.procmesh.replicated_sharding(self.ndim))
        return _fft.c2r(value, self.Nmesh, self._rtype,
                        norm=float(np.prod(self.Nmesh)))

    # --- coordinates ---
    def create_coords(self, field_type, return_indices=False):
        """Broadcastable global coordinate arrays (pm.py:1505-1531)."""
        field_type = _typestr_to_type(field_type)
        iscomplex = issubclass(field_type, BaseComplexField)
        key = (iscomplex, )
        if key not in self._coords_cache:
            # cache host (numpy) arrays: coordinate arrays are created
            # both in and out of jit traces, and cached tracers leak.
            x, i = [], []
            shape, _ = self._shape_dtype(
                TransposedComplexField if iscomplex else RealField)
            fdtype = 'f8' if self.dtype.itemsize >= 8 else 'f4'
            for d in range(self.ndim):
                n = shape[d]
                t = [1] * self.ndim
                t[d] = n
                ind = np.arange(n)
                ri = np.arange(n).astype(fdtype)
                ri[ri >= self.Nmesh[d] // 2] -= self.Nmesh[d]
                if iscomplex:
                    wi = ri * (2 * np.pi / self.Nmesh[d])
                    xi = (wi * self.Nmesh[d] / self.BoxSize[d]).astype(fdtype)
                else:
                    xi = (ri * (self.BoxSize[d] / self.Nmesh[d])).astype(
                        fdtype)
                x.append(xi.reshape(t))
                i.append(ind.reshape(t))
            self._coords_cache[key] = (x, i)
        x, i = self._coords_cache[key]
        if return_indices:
            return [jnp.asarray(ii) for ii in i]
        return [jnp.asarray(xx) for xx in x]

    def _apply_coords(self, field_type, kind):
        iscomplex = issubclass(field_type, BaseComplexField)
        if kind == 'index':
            coords = self.create_coords(field_type, return_indices=True)
        else:
            coords = self.create_coords(field_type, return_indices=False)
            if kind == 'circular':
                coords = [ki * (L / n) for ki, L, n
                          in zip(coords, self.BoxSize, self.Nmesh)]
            # 'relative'/'absolute'/'wavenumber' use coords as-is
        s = xlist(coords)
        s.BoxSize = self.BoxSize
        s.Nmesh = self.Nmesh
        return s

    @property
    def partition(self):
        return None

    def reshape(self, Nmesh=None, BoxSize=None):
        """A ParticleMesh with a different resolution (pm.py:1541-1573)."""
        if Nmesh is None:
            Nmesh = self.Nmesh
        elif np.isscalar(Nmesh):
            Nmesh = [Nmesh for _ in range(self.ndim)]
        if BoxSize is None:
            BoxSize = self.BoxSize[:len(Nmesh)]
        elif np.isscalar(BoxSize):
            BoxSize = [BoxSize for _ in range(len(Nmesh))]
        if len(BoxSize) != len(Nmesh):
            raise ValueError("dimension of BoxSize and Nmesh disagree")
        return ParticleMesh(BoxSize=BoxSize, Nmesh=Nmesh, dtype=self.dtype,
                            comm=self.comm, resampler=self.resampler,
                            procmesh=self.procmesh)

    def resize(self, Nmesh):
        return self.reshape(Nmesh=Nmesh)

    def respawn(self, comm, np=None):
        """Same geometry on a new 'communicator' (pm.py:1575-1600); with
        global arrays this is a plain copy."""
        return ParticleMesh(BoxSize=self.BoxSize, Nmesh=self.Nmesh,
                            dtype=self.dtype, comm=comm,
                            resampler=self.resampler)

    def create(self, type=None, base=None, value=None, mode=None):
        if mode is not None and type is None:
            type = mode
        type = _typestr_to_type(type)
        return type(self, value=value)

    def unravel(self, type, flat):
        r = self.create(type=type)
        r.unravel(flat)
        return r

    def generate_whitenoise(self, seed, unitary=False, mean=0,
                            type=TransposedComplexField, mode=None,
                            base=None, compat='gadget'):
        """Gadget-compatible resolution-invariant white noise
        (pm.py:1656-1696).  compat='gadget' reproduces the reference /
        N-GenIC modes bit-for-bit; compat='native' uses the
        counter-based on-device generator (also resolution invariant,
        different stream)."""
        from . import whitenoise

        if mode is not None and type is None:
            type = mode
        type = _typestr_to_type(type)
        complex_type = (UntransposedComplexField if type is RealField
                        else type)
        complex = self.create(type=complex_type)
        distributed = (self.procmesh is not None
                       and self.procmesh.size > 1)
        value = None
        if distributed and compat == 'gadget' and self.ndim == 3:
            # fill each device's local columns separately and
            # assemble the sharded array directly — no global-cube
            # host detour on ANY distributed geometry (slab, padded
            # uneven slab, 2-d pencil; the reference fills only
            # locally-present columns per rank,
            # _whitenoise_generics.h:44-70).  The field's own
            # concrete sharding supplies the block map, so whatever
            # layout the geometry resolved to is what gets filled.
            value = whitenoise.generate_gadget_sharded(
                tuple(int(n) for n in self.Nmesh),
                complex.value.shape, seed, bool(unitary),
                complex.dtype, complex.value.sharding)
        elif distributed and compat == 'native':
            # the counter-based fill runs INSIDE shard_map: each
            # device computes only its own block (round-4 verdict #5
            # — compat='native' must not materialize the cube on one
            # device)
            import jax.sharding as _sh
            sharding = complex.value.sharding
            if (isinstance(sharding, _sh.NamedSharding)
                    and whitenoise._even_block_shape(
                        complex.value.shape, sharding) is not None):
                value = whitenoise.generate_native_sharded(
                    tuple(int(n) for n in self.Nmesh),
                    complex.value.shape, seed, bool(unitary),
                    complex.dtype, sharding)
        if value is None:
            value = whitenoise.generate(
                tuple(int(n) for n in self.Nmesh),
                complex.value.shape, seed, bool(unitary),
                dtype=complex.dtype, compat=compat)
        complex.value = value

        def filter(k, v):
            mask = functools.reduce(jnp.logical_and,
                                    [ki == 0 for ki in k])
            return jnp.where(mask, mean, v)
        complex.apply(filter, out=Ellipsis)
        return complex.cast(type=type)

    def mesh_coordinates(self, dtype=None):
        """Integer mesh coordinates of every grid point (pm.py:1698-1703)."""
        if dtype is None:
            dtype = self.dtype
        axes = [jnp.arange(n) for n in self.Nmesh]
        grids = jnp.meshgrid(*axes, indexing='ij')
        coord = jnp.stack([g.reshape(-1) for g in grids], axis=-1)
        return coord.astype(dtype)

    def generate_uniform_particle_grid(self, shift=0.5, dtype=None,
                                       return_id=False):
        """One particle per mesh point, in BoxSize units (pm.py:1705-1752)."""
        if dtype is None:
            dtype = self.dtype
        shift = np.broadcast_to(shift, self.ndim)
        source = self.mesh_coordinates(dtype)
        source = (source + jnp.asarray(shift)) \
            * jnp.asarray(self.BoxSize / self.Nmesh)
        if not return_id:
            return source
        isource = np.asarray(self.mesh_coordinates('i4'))
        id = np.int64(isource[:, 0])
        for i in range(1, self.ndim):
            id[...] *= self.Nmesh[i]
            id[...] += isource[:, i]
        return source, id

    def decompose(self, pos, smoothing=None, transform=None,
                  kside=None, capacity=None):
        """Domain-decomposition layout (pm.py:1754-1793).

        Single device: every particle already sees the whole mesh —
        the Layout is the trivial single-domain routing plan.

        On a device mesh (``procmesh``): builds the capacity-padded
        :class:`~pmesh_tpu.parallel.exchange.ShardedLayout` ghost
        routing plan — particle arrays stay sharded over the mesh
        axis and ghost copies ride ``ppermute`` to the neighboring
        slabs (the reference's Layout.exchange role,
        domain.py:138-206).  Particles must reside near their home
        slab (see parallel/exchange.py residency contract;
        :meth:`reshard_particles` restores it).
        """
        if smoothing is None:
            smoothing = self.resampler
        try:
            smoothing = FindResampler(smoothing)
            smoothing = smoothing.support * 0.5
        except TypeError:
            pass
        if transform is None:
            transform = self.affine
        if (self.procmesh is not None and self.procmesh.size > 1
                and (self._even_mesh or self._uneven1d)):
            from .parallel import exchange as _ex
            pos = jnp.asarray(pos)
            # the plan is built in the TRANSLATED grid frame so a
            # shifted affine's kernel footprint is exactly what the
            # ghost channels cover (paint/readout fold the same
            # translate into their coordinates; the reference instead
            # drops translate because its translate is the local-rank
            # offset, pm.py:1786-1790 — here translate is global)
            g0 = pos[:, 0] * jnp.asarray(transform.scale[0],
                                         pos.dtype) \
                + jnp.asarray(transform.translate[0], pos.dtype)
            return _ex.decompose(self.procmesh, g0, int(self.Nmesh[0]),
                                 pos.shape[0], float(smoothing),
                                 kside=kside, capacity=capacity)
        if (self.procmesh is not None and self.procmesh.size > 1
                and self._pencil2d and self.ndim >= 2):
            # 2-d (npx, npy) pencil grid: the Moore-neighborhood
            # ghost plan over both mesh axes (reference
            # domain.py:561-652 + pm.py:1444-1461 build the same plan
            # from the pfft pencil ranks)
            from .parallel import exchange2d as _ex2
            pos = jnp.asarray(pos)
            g0 = pos[:, 0] * jnp.asarray(transform.scale[0],
                                         pos.dtype) \
                + jnp.asarray(transform.translate[0], pos.dtype)
            g1 = pos[:, 1] * jnp.asarray(transform.scale[1],
                                         pos.dtype) \
                + jnp.asarray(transform.translate[1], pos.dtype)
            return _ex2.decompose2d(
                self.procmesh, g0, g1, int(self.Nmesh[0]),
                int(self.Nmesh[1]), pos.shape[0], float(smoothing),
                ksides=kside, capacity=capacity)
        if self.procmesh is not None and self.procmesh.size > 1:
            # no sharded particle plan exists for this geometry
            # (pencil grid with indivisible Nmesh, or a mesh too
            # small to slab-shard): paint/readout will run as a
            # GSPMD-global scatter/gather — CORRECT but ~100x slower
            # than the ghost-exchange fast path (measured: 67 s per
            # 512^3 step, README.md).  Never degrade silently.
            import warnings
            warnings.warn(
                "pm.decompose: no sharded particle plan for this "
                "geometry (procmesh %s, Nmesh %s) — paint/readout "
                "fall back to the GSPMD global scatter, which is "
                "orders of magnitude slower; use a mesh whose "
                "extents divide the process grid"
                % (getattr(self.procmesh, 'grid', None),
                   tuple(self.Nmesh)),
                RuntimeWarning, stacklevel=2)
        # single device, or an uneven mesh (GSPMD-global paint path)
        return Layout(smoothing=smoothing, npart=len(pos))

    def reshard_particles(self, pos, *arrays):
        """Globally re-sort particle arrays into home-slab order so
        :meth:`decompose`'s residency contract holds (the mpsort
        re-layout role, reference pm.py:389-448)."""
        if self.procmesh is None or self.procmesh.size <= 1 \
                or not (self._even_mesh or self._uneven1d
                        or self._pencil2d):
            return (pos,) + tuple(arrays) if arrays else pos
        pos = jnp.asarray(pos)
        if self._pencil2d:
            from .parallel import exchange2d as _ex2
            g0 = pos[:, 0] * jnp.asarray(self.affine.scale[0],
                                         pos.dtype)
            g1 = pos[:, 1] * jnp.asarray(self.affine.scale[1],
                                         pos.dtype)
            return _ex2.reshard2d(self.procmesh, g0, g1,
                                  int(self.Nmesh[0]),
                                  int(self.Nmesh[1]), pos, *arrays)
        from .parallel import exchange as _ex
        g0 = pos[:, 0] * jnp.asarray(self.affine.scale[0], pos.dtype)
        out = _ex.reshard(self.procmesh, g0, int(self.Nmesh[0]),
                          pos, *arrays)
        return out

    def paint(self, pos, hsml=None, mass=1.0, resampler=None, transform=None,
              hold=False, gradient=None, layout=None, out=None,
              hsml_max=None):
        """Paint particles to a RealField (pm.py:1795-1869).

        Functional: returns the painted field; when ``out`` is given its
        value is rebound.  ``hold=True`` accumulates into ``out``.
        ``hsml`` scales each particle's window support; the sharded
        path needs a static ``hsml_max`` and a layout decomposed with
        smoothing >= support/2 * hsml_max.
        """
        if transform is None:
            transform = self.affine
        if resampler is None:
            resampler = self.resampler
        resampler = FindResampler(resampler)

        from .parallel.exchange import ShardedLayout, paint_sharded
        from .parallel.exchange2d import (ShardedLayout2D,
                                          paint_sharded2d)
        if isinstance(layout, (ShardedLayout, ShardedLayout2D)):
            if out is None:
                out = self.create(type=RealField)
            base = out.value if hold else None
            _paint_fn = (paint_sharded2d
                         if isinstance(layout, ShardedLayout2D)
                         else paint_sharded)
            painted = _paint_fn(
                layout, pos, mass, tuple(self.Nmesh), transform.scale,
                resampler.window, diffdir=gradient, dtype=self._rtype,
                base=base, hsml=hsml, hsml_max=hsml_max,
                translate=transform.translate)
            out.value = painted.astype(out.dtype)
            return out

        if layout is not None:
            pos = layout.exchange(pos)
            mass = layout.exchange_scalar(mass)
            hsml = layout.exchange_scalar(hsml)

        if out is None:
            out = self.create(type=RealField)
        if not hold:
            base = jnp.zeros_like(out.value)
        else:
            base = out.value
        if _fft.is_c2c(base.dtype):
            basereal = base.real
        else:
            basereal = base
        painted = _paint_ops.paint(basereal, pos, mass=mass,
                                   window=resampler.window,
                                   scale=transform.scale,
                                   translate=transform.translate,
                                   period=transform.period,
                                   diffdir=gradient, hsml=hsml)
        sh = self._sharding_for(RealField)
        if sh is not None:
            # pin the declared field layout at the op boundary — the
            # GSPMD scatter otherwise picks its own output sharding
            # (e.g. a slab on a 2-d pencil grid)
            painted = jax.lax.with_sharding_constraint(painted, sh)
        out.value = painted.astype(out.dtype)
        return out

    def paint_jvp(self, pos, mass=1.0, v_pos=None, v_mass=None,
                  resampler=None, transform=None, gradient=None, layout=None,
                  out=None):
        """Forward-mode of paint (pm.py:1872-1888)."""
        assert gradient is None
        if out is None:
            out = self.create(type=RealField)
        out.value = jnp.zeros_like(out.value)
        if v_pos is not None:
            for d in range(pos.shape[1]):
                out = self.paint(pos, mass=v_pos[..., d] * mass,
                                 resampler=resampler, transform=transform,
                                 gradient=d, hold=True, layout=layout,
                                 out=out)
        if v_mass is not None:
            out = self.paint(pos, mass=v_mass, resampler=resampler,
                             transform=transform, gradient=None, hold=True,
                             layout=layout, out=out)
        return out

    def paint_vjp(self, v, pos, mass=1.0, resampler=None, transform=None,
                  gradient=None, out_pos=None, out_mass=None, layout=None):
        """Analytic back-propagation of paint (pm.py:1890-1935)."""
        if out_pos is not False:
            if gradient is not None:
                raise ValueError("gradient of gradient is not supported")
            cols = []
            for d in range(pos.shape[1]):
                g = v.readout(pos, resampler=resampler, transform=transform,
                              gradient=d, layout=layout)
                cols.append(g * mass)
            out_pos = jnp.stack(cols, axis=-1)
        if out_mass is not False:
            out_mass = v.readout(pos, resampler=resampler,
                                 transform=transform, gradient=gradient,
                                 layout=layout)
        return out_pos, out_mass

    def upsample(self, source, resampler=None, keep_mean=False):
        """Read out source at this mesh's pixel positions (pm.py:1937-1986)."""
        assert isinstance(source, RealField)
        q = self.mesh_coordinates(dtype=self.dtype)
        transform = Affine(self.ndim,
                           translate=0,
                           scale=1.0 * source.Nmesh / self.Nmesh,
                           period=source.Nmesh)
        f = source.readout(q, resampler=resampler, transform=transform)
        if not keep_mean:
            f = f * float((source.pm.Nmesh.prod() / source.pm.BoxSize.prod())
                          / (self.Nmesh.prod() / self.BoxSize.prod()))
        return self.paint(q, mass=f, resampler='nnb',
                          transform=self.affine_grid)

    def downsample(self, source, resampler=None, keep_mean=False):
        """Paint source pixel values onto this mesh (pm.py:1988-2027)."""
        assert isinstance(source, RealField)
        q = source.pm.mesh_coordinates(dtype=self.dtype)
        f = source.readout(q, resampler='nnb',
                           transform=source.pm.affine_grid)
        transform = self.affine_grid.rescale(1.0 * self.Nmesh / source.Nmesh)
        if keep_mean:
            f = f / float((source.pm.Nmesh.prod()
                           / source.pm.BoxSize.prod())
                          / (self.Nmesh.prod() / self.BoxSize.prod()))
        return self.paint(q, mass=f, resampler=resampler,
                          transform=transform)
