"""Vectorized particle<->mesh resampling (paint / readout).

TPU-native replacement for the per-particle C loops of the reference
(pmesh/_window_generics.h:4-142, pmesh/_window.pyx:128-205).

Instead of scalar scatter/gather with OpenMP atomics, every particle's
support^ndim stencil is evaluated as a vectorized outer product of 1-d
kernel weights and committed with a single XLA scatter-add (paint) or
gather-sum (readout).  The scatter-add is deterministic (XLA TPU
scatter with add combiner), so there is no atomics-induced
non-determinism to worry about (reference relies on
`#pragma omp atomic`, _window_generics.h:58-61).

Both ops carry custom VJPs implementing the analytic gradient pairs of
the reference (readout_vjp: pmesh/pm.py:793-845, paint_vjp:
pmesh/pm.py:1890-1935): the derivative against position uses the
window's analytic/tabulated differentiation kernel with the affine
scale folded in (reference _fill_k, _window_imp.c:50-83).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from .kernels import Window, find_window

__all__ = ["paint", "readout", "PaintGeometry"]


class PaintGeometry(object):
    """Static geometry of a paint/readout call: affine transform +
    mesh shape + window.  Hashable so it can live in trace-time caches.

    Mirrors the (Affine, PMeshPainter) pair of the reference
    (pmesh/window.py:18-55, pmesh/_window_imp.h:48-86).
    """

    def __init__(self, window, shape, scale, translate, period, diffdir=None,
                 hsml_support=None):
        self.window = find_window(window)
        self.shape = tuple(int(n) for n in shape)
        self.ndim = len(self.shape)
        self.scale = tuple(float(s) for s in np.broadcast_to(scale, self.ndim))
        self.translate = tuple(
            float(t) for t in np.broadcast_to(translate, self.ndim))
        self.period = tuple(
            int(p) for p in np.broadcast_to(period, self.ndim))
        self.diffdir = diffdir
        # static stencil size when per-particle hsml scaling is active
        self.hsml_support = hsml_support

    def _key(self):
        return (self.window.kind, self.window.support_float, self.shape,
                self.scale, self.translate, self.period, self.diffdir,
                self.hsml_support)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, PaintGeometry) and self._key() == other._key()

    def with_diffdir(self, diffdir):
        return PaintGeometry(self.window, self.shape, self.scale,
                             self.translate, self.period, diffdir,
                             self.hsml_support)


def _window_params(geom):
    """Static window support parameters (reference
    pmesh_window_info_init, _window_imp.c:24-47)."""
    w = geom.window
    s_float = w.support_float
    isupport = int(np.ceil(s_float))
    left = (isupport - 1) // 2
    shift = s_float / 2.0 - isupport // 2
    vfactor = w.nativesupport / s_float
    return s_float, isupport, left, shift, vfactor


def _fill_base(geom, pos, hsml):
    """Per-axis integer base indices and fractional offsets.

    Returns (ipos, dx, vfac, isup, S): lists of 1-d (N,) arrays for
    ipos/dx; vfac/isup per-particle only for hsml scaling.
    reference: _fill_k, _window_imp.c:50-83.

    Everything is kept 1-d on purpose: TPU tiles pad the trailing two
    dimensions to (sublane, 128), so an (N, S) temporary with S of
    2..12 would waste up to 64x HBM.  Flat (N,) vectors tile densely.
    """
    w = geom.window
    dtype = pos.dtype
    s_float, isupport, left, shift, vfactor = _window_params(geom)

    if hsml is not None:
        # per-particle support scaling (reference _window_generics.h:8:
        # support = painter->support * hsml).  The static stencil size
        # is sized for the max hsml; offsets beyond a particle's own
        # support are masked to zero.
        hsml = jnp.asarray(hsml, dtype=dtype)
        sp = s_float * hsml                                # (N,)
        isup = jnp.maximum(jnp.ceil(sp).astype(jnp.int32), 1)
        left_p = (isup - 1) // 2
        shift_p = sp / 2.0 - isup // 2
        vfac = w.nativesupport / sp                        # (N,)
        S = geom.hsml_support
    else:
        isup = None
        vfac = vfactor
        S = isupport

    ipos, dxs = [], []
    for d in range(geom.ndim):
        gd = pos[:, d] * dtype.type(geom.scale[d]) \
            + dtype.type(geom.translate[d])                # (N,)
        if hsml is not None:
            ip = (jnp.floor(gd + shift_p) - left_p).astype(jnp.int32)
        else:
            ip = jnp.floor(gd + shift).astype(jnp.int32) - left
        ipos.append(ip)
        dxs.append((gd - ip).astype(dtype))
    return ipos, dxs, vfac, isup, S


def _kweight(geom, dx_d, d, i, vfac, isup):
    """Kernel weight of stencil offset i along axis d, computed
    inline (fuses into the scatter/gather update computation)."""
    w = geom.window
    x = (dx_d - i) * vfac
    if geom.diffdir == d:
        ki = w.diff(x) * (geom.scale[d] * vfac * vfac)
    else:
        ki = w.kernel(x) * vfac
    if isup is not None:
        ki = jnp.where(i < isup, ki, 0.0)
    return ki.astype(dx_d.dtype)


def _fill_k(geom, pos, hsml):
    """Materialized per-axis weight lists (used by the big-stencil
    fori path)."""
    ipos, dxs, vfac, isup, S = _fill_base(geom, pos, hsml)
    kvals = [[_kweight(geom, dxs[d], d, i, vfac, isup)
              for i in range(S)] for d in range(geom.ndim)]
    return ipos, kvals, S


def _wrapped_axis(geom, ipos_d, off, d):
    """Wrapped target index along axis d for stencil offset `off`,
    plus validity (reference _window_generics.h:44-55)."""
    t = ipos_d + off
    if geom.period[d] > 0:
        t = jnp.remainder(t, geom.period[d])
    ok = (t >= 0) & (t < geom.shape[d])
    return t, ok


def _offset_terms(geom, ipos, dxs, vfac, isup, offsets, base_w):
    """Flat mesh index and weight of one stencil offset (all 1-d)."""
    ndim = geom.ndim
    shape = geom.shape
    size = int(np.prod(shape, dtype=np.int64))
    idx = None
    w = base_w
    ok = None
    for d in range(ndim):
        t, okd = _wrapped_axis(geom, ipos[d], offsets[d], d)
        idx = t if idx is None else idx * shape[d] + t
        ok = okd if ok is None else (ok & okd)
        w = w * _kweight(geom, dxs[d], d, offsets[d], vfac, isup)
    # out-of-bounds sentinel must be >= size: jax .at[] modes wrap
    # NEGATIVE indices (numpy semantics) even under 'drop'/'fill'
    idx = jnp.where(ok, idx, size)
    return idx, w


def _all_offsets(S, ndim):
    import itertools
    return list(itertools.product(range(S), repeat=ndim))


# above this particle count, stencil offsets are strictly sequenced
# with optimization barriers so XLA cannot hoist every offset's index
# buffer to the front of the schedule (HBM liveness control)
_SEQUENTIAL_N = 1 << 25


def _tie(seq_mode, *arrays):
    """Barrier-tie arrays to the running accumulator when sequencing
    is on, so each stencil offset's temporaries are computed after the
    previous offset committed (keeps ~one (N,) index buffer live)."""
    if not seq_mode:
        return arrays
    return jax.lax.optimization_barrier(arrays)


def _paint_impl(mesh, pos, mass, hsml, geom):
    if pos.shape[0] == 0:
        return mesh
    ipos, dxs, vfac, isup, S = _fill_base(geom, pos, hsml)
    N = pos.shape[0]
    ndim = geom.ndim
    mass = jnp.broadcast_to(jnp.asarray(mass, dtype=mesh.dtype), (N,))
    flat_mesh = mesh.reshape(-1)

    npoints = S ** ndim
    if npoints <= 64:
        seq = N >= _SEQUENTIAL_N
        for o in _all_offsets(S, ndim):
            if seq:
                # recompute the stencil base from the (barrier-tied)
                # positions each offset: cheaper than keeping 6 (N,)
                # base arrays live across the whole scatter chain, and
                # the fresh tie stops XLA from hoisting every offset's
                # index buffer to the front of the schedule
                flat_mesh, pos_t = jax.lax.optimization_barrier(
                    (flat_mesh, pos))
                ipos, dxs, vfac, isup, _ = _fill_base(geom, pos_t, hsml)
            idx, wgt = _offset_terms(geom, ipos, dxs, vfac, isup, o,
                                     mass)
            flat_mesh = flat_mesh.at[idx].add(
                wgt.astype(mesh.dtype), mode='drop')
    else:
        ipos, kvals, S = _fill_k(geom, pos, hsml)
        # big stencils (lanczos/acg/wavelets): fori_loop over offsets,
        # one scatter per stencil point
        kstack = [jnp.stack(kd) for kd in kvals]      # ndim x (S, N)
        # under shard_map the carry must carry the same varying axes
        # as the body output (which inherits them from pos/mass);
        # tie the initial mesh to a varying scalar so the fori types
        # match on replicated-mesh + sharded-particle calls
        flat_mesh = flat_mesh + (0 * pos[0, 0]).astype(flat_mesh.dtype)

        size = int(np.prod(geom.shape, dtype=np.int64))

        def body(o, fm):
            idx = None
            w = mass
            ok = None
            rem = o
            for d in range(ndim - 1, -1, -1):
                od = rem % S
                rem = rem // S
                t, okd = _wrapped_axis(geom, ipos[d], od, d)
                # idx built most-significant-first; accumulate with
                # the positional weight of axis d
                stride = int(np.prod(geom.shape[d + 1:], dtype=np.int64))
                term = t * stride
                idx = term if idx is None else idx + term
                ok = okd if ok is None else (ok & okd)
                w = w * jnp.take(kstack[d], od, axis=0)
            idx = jnp.where(ok, idx, size)  # see _offset_terms
            return fm.at[idx].add(w.astype(fm.dtype), mode='drop')

        flat_mesh = jax.lax.fori_loop(0, npoints, body, flat_mesh)
    out = flat_mesh.reshape(geom.shape)
    if N >= _SEQUENTIAL_N:
        # pin the nd layout at the op boundary: without this, XLA
        # propagates the scatter's linear layout into a downstream FFT
        # and materializes a 32x lane-padded relayout copy (16 GB for
        # a 512^3 mesh)
        out = jax.lax.optimization_barrier(out)
    return out


def _readout_impl(mesh, pos, hsml, geom):
    """Gather mesh values at particle stencils.

    ``mesh`` may carry a leading batch axis (M, *shape): all M meshes
    are gathered with the SAME index/weight computation — that is the
    memory-critical fast path of the PM force step, where the three
    directional force meshes are read out at once instead of tripling
    the liveness of the (N,)-sized index buffers.
    """
    istuple = isinstance(mesh, (list, tuple))
    if pos.shape[0] == 0:
        if istuple:
            return tuple(jnp.zeros((0,), dtype=pos.dtype) for _ in mesh)
        if mesh.ndim == geom.ndim + 1:
            return jnp.zeros((mesh.shape[0], 0), dtype=pos.dtype)
        return jnp.zeros((0,), dtype=pos.dtype)
    ipos, dxs, vfac, isup, S = _fill_base(geom, pos, hsml)
    N = pos.shape[0]
    ndim = geom.ndim

    if istuple:
        batched = True
        flat_meshes = [m.reshape(-1) for m in mesh]
    elif mesh.ndim == ndim + 1:
        batched = True
        flat_meshes = [mesh[m].reshape(-1) for m in range(mesh.shape[0])]
    else:
        batched = False
        flat_meshes = [mesh.reshape(-1)]
    ones = jnp.ones((N,), dtype=pos.dtype)

    npoints = S ** ndim
    if npoints <= 64:
        seq = N >= _SEQUENTIAL_N
        outs = [jnp.zeros((N,), dtype=pos.dtype) for _ in flat_meshes]
        for o in _all_offsets(S, ndim):
            if seq:
                outs[0], pos_t = jax.lax.optimization_barrier(
                    (outs[0], pos))
                ipos, dxs, vfac, isup, _ = _fill_base(geom, pos_t, hsml)
            idx, w = _offset_terms(geom, ipos, dxs, vfac, isup, o, ones)
            for m, fm in enumerate(flat_meshes):
                vals = fm.at[idx].get(mode='fill', fill_value=0)
                outs[m] = outs[m] + vals * w
        if istuple:
            return tuple(outs)
        if batched:
            return jnp.stack(outs)
        return outs[0]
    else:
        ipos, kvals, S = _fill_k(geom, pos, hsml)
        flat_mesh = flat_meshes[0]
        kstack = [jnp.stack(kd) for kd in kvals]

        size = int(np.prod(geom.shape, dtype=np.int64))

        def body(o, acc):
            idx = None
            w = ones
            ok = None
            rem = o
            for d in range(ndim - 1, -1, -1):
                od = rem % S
                rem = rem // S
                t, okd = _wrapped_axis(geom, ipos[d], od, d)
                stride = int(np.prod(geom.shape[d + 1:], dtype=np.int64))
                term = t * stride
                idx = term if idx is None else idx + term
                ok = okd if ok is None else (ok & okd)
                w = w * jnp.take(kstack[d], od, axis=0)
            idx = jnp.where(ok, idx, size)  # see _offset_terms
            new = [a + fm.at[idx].get(mode='fill', fill_value=0) * w
                   for a, fm in zip(acc, flat_meshes)]
            return tuple(new)

        # tie to a mesh element too: under shard_map the body output
        # carries the union of pos/mesh varying axes and the carry
        # types must match (see _paint_impl's fori note)
        tie = (0 * pos[0, 0]).astype(pos.dtype) \
            + (0 * flat_meshes[0][0]).astype(pos.dtype)
        init = tuple(jnp.zeros((N,), dtype=pos.dtype) + tie
                     for _ in flat_meshes)
        outs = jax.lax.fori_loop(0, npoints, body, init)
        if istuple:
            return tuple(outs)
        if batched:
            return jnp.stack(outs)
        return outs[0]


def _hsml_support(window, hsml, hsml_max):
    """Choose the static stencil size for per-particle hsml."""
    if hsml is None:
        return None
    if hsml_max is None:
        try:
            hsml_max = float(np.max(np.asarray(hsml)))
        except Exception:
            raise ValueError(
                "hsml under jit requires an explicit static hsml_max")
    return int(np.ceil(window.support_float * float(hsml_max)))


# --- custom-JVP wrappers ----------------------------------------------------
#
# The analytic derivative pairs of the reference (readout_vjp:
# pm.py:793-845, readout_jvp: 848-859, paint_vjp: 1890-1935,
# paint_jvp: 1872-1888) are expressed as FORWARD rules here: the
# tangent of a paint is a paint of the tangent mass plus
# derivative-window paints against the position tangents.  jax
# derives reverse mode by transposing the (linear-in-tangent) rule —
# the transpose of the scatter-add paint is exactly the readout
# gather, so jax.grad produces the reference's analytic adjoints
# while jax.jvp/jvp-of-vmap etc. compose for free (the custom_vjp
# form used previously made forward mode raise).

@functools.partial(jax.custom_jvp, nondiff_argnums=(4,))
def _paint_vjpable(mesh, pos, mass, hsml, geom):
    return _paint_impl(mesh, pos, mass, hsml, geom)


@_paint_vjpable.defjvp
def _paint_jvp(geom, primals, tangents):
    mesh, pos, mass, hsml = primals
    d_mesh, d_pos, d_mass, _ = tangents
    out = _paint_impl(mesh, pos, mass, hsml, geom)
    N = pos.shape[0]
    zeros = jnp.zeros(geom.shape, dtype=out.dtype)

    def is_zero(t):
        return type(t).__name__ in ('Zero', 'SymbolicZero')

    dout = jnp.zeros_like(out)
    if not is_zero(d_mesh):
        dout = dout + d_mesh
    if not is_zero(d_mass):
        dm = jnp.broadcast_to(jnp.asarray(d_mass, out.dtype), (N,))
        dout = dout + _paint_impl(zeros, pos, dm, hsml, geom)
    if not is_zero(d_pos):
        if geom.diffdir is not None:
            raise ValueError(
                "gradient of gradient is not supported "
                "(reference pm.py:823)")
        m = jnp.broadcast_to(jnp.asarray(mass, out.dtype), (N,))
        for d in range(geom.ndim):
            dout = dout + _paint_impl(
                zeros, pos, m * d_pos[:, d], hsml,
                geom.with_diffdir(d))
    return out, dout


@functools.partial(jax.custom_jvp, nondiff_argnums=(3,))
def _readout_vjpable(mesh, pos, hsml, geom):
    return _readout_impl(mesh, pos, hsml, geom)


@_readout_vjpable.defjvp
def _readout_jvp(geom, primals, tangents):
    mesh, pos, hsml = primals
    d_mesh, d_pos, _ = tangents
    out = _readout_impl(mesh, pos, hsml, geom)

    def is_zero(t):
        return type(t).__name__ in ('Zero', 'SymbolicZero')

    def zeros_like_out(o):
        if isinstance(o, tuple):
            return tuple(jnp.zeros_like(x) for x in o)
        return jnp.zeros_like(o)

    def add(a, b):
        if isinstance(a, tuple):
            return tuple(x + y for x, y in zip(a, b))
        return a + b

    dout = zeros_like_out(out)
    if not is_zero(d_mesh):
        dout = add(dout, _readout_impl(d_mesh, pos, hsml, geom))
    if not is_zero(d_pos):
        if geom.diffdir is not None:
            raise ValueError(
                "gradient of gradient is not supported "
                "(reference pm.py:823)")
        for d in range(geom.ndim):
            g = _readout_impl(mesh, pos, hsml, geom.with_diffdir(d))
            if isinstance(g, tuple):
                dout = add(dout, tuple(gm * d_pos[:, d] for gm in g))
            elif isinstance(out, jnp.ndarray) and \
                    out.ndim == 2 and not isinstance(mesh, tuple):
                dout = dout + g * d_pos[None, :, d]
            else:
                dout = dout + g * d_pos[:, d]
    return out, dout


# --- public API -------------------------------------------------------------

def paint(mesh, pos, mass=1.0, window='cic', scale=1.0, translate=0.0,
          period=0, diffdir=None, hsml=None, hsml_max=None):
    """Scatter particles onto a mesh; returns mesh + contribution.

    Parameters mirror ResampleWindow.paint (pmesh/window.py:106-163);
    ``mesh`` is not mutated (functional update).
    """
    mesh = jnp.asarray(mesh)
    pos = jnp.asarray(pos)
    win = find_window(window)
    geom = PaintGeometry(win, mesh.shape, scale, translate, period,
                         diffdir, _hsml_support(win, hsml, hsml_max))
    mass = jnp.asarray(mass, dtype=mesh.dtype)
    return _paint_vjpable(mesh, pos, mass, hsml, geom)


def readout(mesh, pos, window='cic', scale=1.0, translate=0.0,
            period=0, diffdir=None, hsml=None, hsml_max=None):
    """Gather mesh values at particle positions.

    Parameters mirror ResampleWindow.readout (pmesh/window.py:165-221).
    """
    pos = jnp.asarray(pos)
    win = find_window(window)
    ndim = pos.shape[-1]
    # a tuple of meshes (or a leading batch axis) gathers M meshes
    # with one shared index computation (see _readout_impl)
    if isinstance(mesh, (list, tuple)):
        mesh = tuple(jnp.asarray(m) for m in mesh)
        shape = mesh[0].shape
    else:
        mesh = jnp.asarray(mesh)
        shape = mesh.shape[1:] if mesh.ndim == ndim + 1 else mesh.shape
    geom = PaintGeometry(win, shape, scale, translate, period,
                         diffdir, _hsml_support(win, hsml, hsml_max))
    return _readout_vjpable(mesh, pos, hsml, geom)
