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


def _fill_k(geom, pos, hsml):
    """Compute per-axis integer base indices and kernel weight rows.

    Returns (ipos, kvals): ipos int32 (N, ndim); kvals list of ndim
    arrays (N, S).  reference: _fill_k, _window_imp.c:50-83.
    """
    w = geom.window
    dtype = pos.dtype
    s_float, isupport, left, shift, vfactor = _window_params(geom)

    if hsml is not None:
        # per-particle support scaling (reference _window_generics.h:8:
        # support = painter->support * hsml).  The static stencil size is
        # sized for the max hsml; rows beyond the particle's own support
        # are masked to zero.
        hsml = jnp.asarray(hsml, dtype=dtype)
        sp = s_float * hsml                                # (N,)
        isup = jnp.ceil(sp).astype(jnp.int32)
        isup = jnp.maximum(isup, 1)
        left_p = (isup - 1) // 2
        shift_p = sp / 2.0 - isup // 2
        vfac_p = w.nativesupport / sp
        S = geom.hsml_support
    else:
        S = isupport

    scale = jnp.asarray(geom.scale, dtype=dtype)
    translate = jnp.asarray(geom.translate, dtype=dtype)
    gpos = pos * scale + translate                         # (N, ndim)

    if hsml is not None:
        ipos = (jnp.floor(gpos + shift_p[:, None])
                - left_p[:, None]).astype(jnp.int32)
        dx = gpos - ipos
        offs = jnp.arange(S, dtype=dtype)
        x = (dx[:, :, None] - offs) * vfac_p[:, None, None]   # (N, ndim, S)
        rowmask = (offs < isup[:, None, None])
        vfac_b = vfac_p[:, None]                              # (N, 1)
    else:
        ipos = jnp.floor(gpos + shift).astype(jnp.int32) - left
        dx = gpos - ipos
        offs = jnp.arange(S, dtype=dtype)
        x = (dx[:, :, None] - offs) * vfactor                 # (N, ndim, S)
        rowmask = None
        vfac_b = vfactor

    order = np.zeros(geom.ndim, dtype=int)
    if geom.diffdir is not None:
        order[geom.diffdir] = 1

    kvals = []
    for d in range(geom.ndim):
        xd = x[:, d, :]
        if order[d] == 0:
            kd = w.kernel(xd) * vfac_b if hsml is not None \
                else w.kernel(xd) * vfactor
        else:
            kd = w.diff(xd) * geom.scale[d] * (
                vfac_b * vfac_b if hsml is not None else vfactor * vfactor)
        if rowmask is not None:
            kd = jnp.where(rowmask[:, d, :], kd, 0.0)
        kvals.append(kd.astype(dtype))
    return ipos, kvals, S


def _axis_indices(geom, ipos, S):
    """Wrapped per-axis target indices (N, S) plus a validity mask for
    non-periodic axes (reference _window_generics.h:44-55)."""
    idx = []
    offs = jnp.arange(S, dtype=jnp.int32)
    for d in range(geom.ndim):
        t = ipos[:, d:d + 1] + offs                      # (N, S)
        if geom.period[d] > 0:
            t = jnp.remainder(t, geom.period[d])
        ok = (t >= 0) & (t < geom.shape[d])
        idx.append((t, ok))
    return idx


def _paint_impl(mesh, pos, mass, hsml, geom):
    if pos.shape[0] == 0:
        return mesh
    ipos, kvals, S = _fill_k(geom, pos, hsml)
    N = pos.shape[0]
    ndim = geom.ndim
    shape = geom.shape
    mass = jnp.broadcast_to(jnp.asarray(mass, dtype=mesh.dtype), (N,))

    axes = _axis_indices(geom, ipos, S)

    # Build flat indices/weights as an outer product over the stencil.
    # For small stencils (<= 64 points) one big scatter; otherwise loop
    # over the slowest axis to bound temporary memory at N * S^(ndim-1).
    def flat_for(first_off=None):
        flat = jnp.zeros((N, 1), dtype=jnp.int32)
        wgt = mass.reshape(N, 1)
        invalid = jnp.zeros((N, 1), dtype=bool)
        for d in range(ndim):
            t, ok = axes[d]
            kd = kvals[d]
            if d == 0 and first_off is not None:
                t = t[:, first_off:first_off + 1]
                ok = ok[:, first_off:first_off + 1]
                kd = kd[:, first_off:first_off + 1]
            flat = (flat[:, :, None] * shape[d]
                    + t[:, None, :]).reshape(N, -1)
            wgt = (wgt[:, :, None] * kd[:, None, :]).reshape(N, -1)
            invalid = (invalid[:, :, None] | (~ok)[:, None, :]).reshape(N, -1)
        flat = jnp.where(invalid, -1, flat)  # 'drop' mode discards these
        return flat, wgt

    flat_mesh = mesh.reshape(-1)
    if S ** ndim <= 64:
        flat, wgt = flat_for()
        flat_mesh = flat_mesh.at[flat.reshape(-1)].add(
            wgt.reshape(-1).astype(mesh.dtype), mode='drop')
    else:
        for i0 in range(S):
            flat, wgt = flat_for(i0)
            flat_mesh = flat_mesh.at[flat.reshape(-1)].add(
                wgt.reshape(-1).astype(mesh.dtype), mode='drop')
    return flat_mesh.reshape(shape)


def _readout_impl(mesh, pos, hsml, geom):
    if pos.shape[0] == 0:
        return jnp.zeros((0,), dtype=pos.dtype)
    ipos, kvals, S = _fill_k(geom, pos, hsml)
    N = pos.shape[0]
    ndim = geom.ndim
    shape = geom.shape
    axes = _axis_indices(geom, ipos, S)
    flat_mesh = mesh.reshape(-1)

    def gather_for(first_off=None):
        flat = jnp.zeros((N, 1), dtype=jnp.int32)
        wgt = jnp.ones((N, 1), dtype=pos.dtype)
        invalid = jnp.zeros((N, 1), dtype=bool)
        for d in range(ndim):
            t, ok = axes[d]
            kd = kvals[d]
            if d == 0 and first_off is not None:
                t = t[:, first_off:first_off + 1]
                ok = ok[:, first_off:first_off + 1]
                kd = kd[:, first_off:first_off + 1]
            flat = (flat[:, :, None] * shape[d]
                    + t[:, None, :]).reshape(N, -1)
            wgt = (wgt[:, :, None] * kd[:, None, :]).reshape(N, -1)
            invalid = (invalid[:, :, None] | (~ok)[:, None, :]).reshape(N, -1)
        vals = flat_mesh[jnp.where(invalid, 0, flat)]
        vals = jnp.where(invalid, 0, vals)
        return jnp.sum(vals * wgt, axis=1)

    if S ** ndim <= 64:
        return gather_for()
    out = 0
    for i0 in range(S):
        out = out + gather_for(i0)
    return out


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


# --- custom-VJP wrappers ----------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _paint_vjpable(mesh, pos, mass, hsml, geom):
    return _paint_impl(mesh, pos, mass, hsml, geom)


def _paint_fwd(mesh, pos, mass, hsml, geom):
    out = _paint_impl(mesh, pos, mass, hsml, geom)
    return out, (pos, mass, hsml)


def _paint_bwd(geom, res, v):
    pos, mass, hsml = res
    N = pos.shape[0]
    d_mesh = v
    # d_mass = readout(v, pos)   (pm.py:1928-1933)
    d_mass_full = _readout_impl(v, pos, hsml, geom)
    if jnp.ndim(mass) == 0:
        d_mass = jnp.sum(d_mass_full).astype(jnp.asarray(mass).dtype)
    else:
        d_mass = d_mass_full.astype(mass.dtype)
    # d_pos[:, d] = mass * readout(v, pos, gradient=d)   (pm.py:1913-1926)
    if geom.diffdir is None:
        cols = []
        for d in range(geom.ndim):
            g = _readout_impl(v, pos, hsml, geom.with_diffdir(d))
            cols.append(g * mass)
        d_pos = jnp.stack(cols, axis=-1).astype(pos.dtype)
    else:
        d_pos = jnp.zeros_like(pos)
    return d_mesh, d_pos, d_mass, None


_paint_vjpable.defvjp(_paint_fwd, _paint_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _readout_vjpable(mesh, pos, hsml, geom):
    return _readout_impl(mesh, pos, hsml, geom)


def _readout_fwd(mesh, pos, hsml, geom):
    return _readout_impl(mesh, pos, hsml, geom), (mesh, pos, hsml)


def _readout_bwd(geom, res, v):
    mesh, pos, hsml = res
    # d_mesh = paint of v (pm.py:835-843)
    zeros = jnp.zeros(geom.shape, dtype=mesh.dtype)
    d_mesh = _paint_impl(zeros, pos, v, hsml, geom)
    # d_pos[:, d] = v * readout(mesh, pos, gradient=d) (pm.py:821-833)
    if geom.diffdir is None:
        cols = []
        for d in range(geom.ndim):
            g = _readout_impl(mesh, pos, hsml, geom.with_diffdir(d))
            cols.append(g * v)
        d_pos = jnp.stack(cols, axis=-1).astype(pos.dtype)
    else:
        d_pos = jnp.zeros_like(pos)
    return d_mesh, d_pos, None


_readout_vjpable.defvjp(_readout_fwd, _readout_bwd)


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
    mesh = jnp.asarray(mesh)
    pos = jnp.asarray(pos)
    win = find_window(window)
    geom = PaintGeometry(win, mesh.shape, scale, translate, period,
                         diffdir, _hsml_support(win, hsml, hsml_max))
    return _readout_vjpable(mesh, pos, hsml, geom)
