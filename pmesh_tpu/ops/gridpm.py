"""Lattice-structured paint/readout: the TPU fast path for N-body.

In a particle-mesh N-body run the particles are born on the mesh
lattice (one per cell, ``generate_uniform_particle_grid``) and stay in
lattice order for the whole integration — only their *displacement*
from the home cell evolves (the reference keeps the same structure:
``Q`` fixed, ``S``/``ZA`` displacements, nbody/genic.py + examples/
nbody.py:245-288).  That structure makes scatter/gather unnecessary:

    position(q) = q + s(q),   s stored as ndim mesh-shaped arrays

and a window paint of all particles decomposes over integer target
offsets ``v``::

    mesh[p] = sum_q  m(q) * prod_d K(v_d - s_d(q)),   v = p - q
            = sum_v  roll( m * prod_d K(v_d - s_d), v )

a *dense* mask-multiply-roll-accumulate — pure VPU + sequential HBM
traffic, no scatter at all (the reference needs OpenMP atomics here,
_window_generics.h:58-61; XLA's scatter/gather on TPU are serial and
~100x off bandwidth).  ``readout`` is the mirror image with inverse
rolls.  Periodic wrap is exactly ``jnp.roll``; under a sharded mesh
the rolls lower to ICI collective-permutes of slab halos.

Scope note: this path assumes a uniform window width — per-particle
``hsml`` smoothing (reference _window_imp.c:24-47) is NOT supported
here (an hsml-dependent support would make the offset set dynamic).
SPH-style variable-smoothing catalogs must use the generic
``ops/paint.py`` / sharded-exchange paths, which support hsml fully;
PM gravity (this module's purpose) never uses hsml.

The cost is ``prod_d nv_d`` passes where ``nv_d`` covers the
displacement range [lo, hi] (in cells) plus the window support, so
this path applies when displacements are bounded — true by
construction for LPT initial conditions and for the early/mid steps
of a PM run.  Callers pick static bounds (gravpm estimates them from
the LPT amplitude and linear growth), nbody_lattice warns post-run if
displacements outgrew them, and construction fails fast past
``GRID_LIMIT`` offsets — beyond that, use the generic particle path
(ops/paint.py).

Gradient pairs mirror the reference's analytic paint/readout VJPs
(pm.py:793-859, 1872-1935): the mesh cotangent of readout is a paint
with the same displacements, and the displacement cotangent is a
derivative-window readout.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .kernels import find_window

__all__ = ["paint_grid", "readout_grid", "offset_range",
           "displacement_bounds", "GRID_LIMIT"]

# fall back to the generic path beyond this many shift passes
GRID_LIMIT = 1728  # 12^3

# implementation selector: 'pallas' fuses the shift loop into one HBM
# pass per mesh (ops/gridpm_pallas.py; interpret mode off-TPU), 'xla'
# is the roll-accumulate reference formulation, 'auto' picks pallas on
# TPU and xla elsewhere (interpret-mode pallas is slow; its
# correctness is pinned by test_impl_pallas_matches_xla)
IMPL = 'auto'

# sharded readout: fuse all meshes into one shard_map/kernel call
# (shared halos + weights) instead of one call per mesh
READOUT_FUSE_SHARDED = True
# ... but only fuse the pallas KERNEL while the combined mesh planes
# stay small: larger fused kernels crash the Mosaic compiler
# (measured on v5e: 3-mesh OK at 512^2 f32 planes, aborts at
# 1024x512; see tools/probe_parts.py)
_FUSE_PLANE_LIMIT_BYTES = 4 * 1024 * 1024
# diffdir='all' (3 derivative readouts of ONE mesh) rolls a third of
# the planes per offset; its fused kernel gets a larger budget
_MULTI_DIFF_FUSE_LIMIT_BYTES = 16 * 1024 * 1024


def _use_pallas(impl=None):
    impl = IMPL if impl is None else impl
    if impl == 'auto':
        import jax as _jax
        return _jax.default_backend() == 'tpu'
    return impl == 'pallas'


def offset_range(lo, hi, window):
    """Integer target offsets [vmin, vmax] that can receive weight from
    a displacement in [lo, hi] through ``window`` (support/2 reach)."""
    win = find_window(window)
    h = win.support_float / 2.0
    eps = 1e-6
    vmin = int(np.floor(lo - h + eps)) + 1
    vmax = int(np.ceil(hi + h - eps)) - 1
    # the kernel is 0 at |x| == h for the analytic windows; keep the
    # boundary offsets anyway when h is half-integral (nearest) since
    # ties go to one side there
    if vmax < vmin:
        vmax = vmin
    return vmin, vmax


def displacement_bounds(disp):
    """(min, max) over all displacement components — a cheap device
    reduction the driver can use to pick/validate static bounds."""
    lo = disp[0].min()
    hi = disp[0].max()
    for s in disp[1:]:
        lo = jnp.minimum(lo, s.min())
        hi = jnp.maximum(hi, s.max())
    return lo, hi


def _normalize_bounds(bounds, ndim):
    lo, hi = bounds
    return float(lo), float(hi)


def _axis_weight(win, diff, v, s):
    # weight of target offset v for displacement s along one axis.
    # diff kernels follow the generic path's convention (argument
    # pos - cell = s - v, ops/paint.py _kweight): the diffdir readout
    # equals +d/ds of the interpolation; symmetric kernels make that
    # -win.diff(v - s)
    x = v - s
    return -win.diff(x) if diff else win.kernel(x)


def _decode(i, nvs):
    # linear index -> offset vector (static python when i is python int)
    out = []
    rem = i
    for n in reversed(nvs):
        out.append(rem % n)
        rem = rem // n
    return tuple(reversed(out))


def _shift_loop(meshes, disp, mass, bounds, window, diffdir, mode,
                impl=None, procmesh=None):
    """The shared shift-sum driver.

    mode='paint':   returns sum_v roll(w_v * mass, +v) for one mesh
                    (meshes is None; output shape = disp[0].shape)
    mode='readout': returns tuple(sum_v w_v * roll(m, -v) for m in meshes)

    On a device mesh (``procmesh``) the pallas implementation runs
    per-slab inside shard_map with halo planes ppermuted from ring
    neighbors (parallel/halo.py); the XLA implementation stays global
    (GSPMD lowers the rolls to collective permutes).
    """
    win = find_window(window)
    ndim = len(disp)
    lo, hi = _normalize_bounds(bounds, ndim)
    vmin, vmax = offset_range(lo, hi, window)
    nv = vmax - vmin + 1
    nvs = (nv,) * ndim
    total = nv ** ndim
    if total > GRID_LIMIT:
        raise ValueError(
            "offset volume %d exceeds GRID_LIMIT=%d; displacements too "
            "large for the lattice path — use the generic paint/readout"
            % (total, GRID_LIMIT))

    disp = tuple(jnp.asarray(s) for s in disp)
    dtype = disp[0].dtype
    shape = disp[0].shape

    if _use_pallas(impl) and ndim == 3:
        from . import gridpm_pallas as _pk
        if procmesh is not None and procmesh.size > 1:
            return _shift_sharded(_pk, meshes, disp, mass, vmin, vmax,
                                  win.kind, diffdir, mode, procmesh)
        if mode == 'paint':
            m = jnp.asarray(1.0 if mass is None else mass, dtype=dtype)
            return _pk.paint_fused(disp, m, vmin, vmax, win.kind,
                                   diffdir=diffdir,
                                   scalar_mass=(m.ndim == 0))
        if diffdir == 'all':
            # one potential, 3 derivative readouts sharing the plane
            # rolls (the gradient-mode force family)
            return _pk.readout_fused_parts(
                (meshes[0],), disp, vmin, vmax, win.kind,
                diffdir='all')
        # one call per mesh: measured FASTER than batching all meshes
        # into one kernel (smaller VMEM working set pipelines better)
        return tuple(_pk.readout_fused(mm, disp, vmin, vmax, win.kind,
                                       diffdir=diffdir)
                     for mm in meshes)

    if diffdir == 'all' and mode == 'readout':
        # XLA fallback: three separate diff readouts of the one mesh
        return tuple(
            _shift_loop(meshes, disp, mass, bounds, window, d, mode,
                        impl, procmesh)[0]
            for d in range(ndim))

    def weights(vvec):
        w = None
        for d in range(ndim):
            wd = _axis_weight(win, diffdir == d, vvec[d], disp[d])
            w = wd if w is None else w * wd
        return w.astype(dtype)

    axes = tuple(range(ndim))

    if mode == 'paint':
        m = (jnp.asarray(mass, dtype=dtype) if mass is not None
             else jnp.asarray(1.0, dtype=dtype))

        def body(i, out):
            vvec = tuple(vmin + o for o in _decode(i, nvs))
            c = weights(vvec) * m
            return out + jnp.roll(c, vvec, axes)

        return lax.fori_loop(0, total, body,
                             jnp.zeros(shape, dtype=dtype))

    # readout over one or more meshes with shared weights
    def body(i, outs):
        vvec = tuple(vmin + o for o in _decode(i, nvs))
        w = weights(vvec)
        neg = tuple(-v for v in vvec)
        return tuple(o + w * jnp.roll(mm, neg, axes)
                     for o, mm in zip(outs, meshes))

    init = tuple(jnp.zeros(shape, dtype=dtype) for _ in meshes)
    return lax.fori_loop(0, total, body, init)


def _shift_sharded(_pk, meshes, disp, mass, vmin, vmax, kind, diffdir,
                   mode, procmesh):
    """shard_map execution of the pallas shift-sum over x slabs.

    Halo traffic and HBM copies are minimal: each shard reads its own
    slab IN PLACE through sliding BlockSpecs and only the O(nv)
    boundary planes ride ``ppermute`` (parallel/halo.halo_planes) —
    the old form concatenated a full extended copy of the state per
    call and shipped whole slabs per halo hop (kept as the fallback
    for windows deeper than one slab)."""
    import jax as _jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from ..parallel.halo import extend_x, halo_planes

    ax = procmesh.axis
    D = procmesh.size
    N0 = disp[0].shape[0]
    if N0 % D != 0:
        raise ValueError(
            "the sharded lattice path needs Nmesh[0] %% n_devices "
            "== 0 (got %d %% %d)" % (N0, D))
    rows = N0 // D
    spec = P(ax, None, None)
    nvm = vmax - vmin
    deep = max(max(0, vmax), max(0, -vmin)) > rows

    def ext_range(local, first, last):
        """local slab rows [start+first, start+last] inclusive."""
        lo = max(0, -first)
        hi = max(0, last - (rows - 1))
        e = extend_x(local, lo, hi, ax, D)
        a = lo + first
        return e[a:a + (last - first + 1)]

    if mode == 'paint':
        m = jnp.asarray(1.0 if mass is None else mass,
                        dtype=disp[0].dtype)
        scalar_mass = (m.ndim == 0)
        lo_n, hi_n = max(0, vmax), max(0, -vmin)

        def local(*args):
            dl = args[:3]
            if deep:
                exts = tuple(ext_range(d, -vmax, rows - 1 - vmin)
                             for d in dl)
                mext = 1.0 if scalar_mass else ext_range(
                    args[3], -vmax, rows - 1 - vmin)
                return _pk.paint_fused_ext(exts, mext, vmin, vmax,
                                           kind, diffdir=diffdir,
                                           scalar_mass=scalar_mass,
                                           nrows=rows)
            arrays = list(dl) + ([] if scalar_mass else [args[3]])
            halos = tuple(halo_planes(a, lo_n, hi_n, ax, D)
                          for a in arrays)
            return _pk.paint_fused_parts(
                dl, 1.0 if scalar_mass else args[3], vmin, vmax,
                kind, diffdir=diffdir, scalar_mass=scalar_mass,
                halos=halos)

        operands = tuple(disp) + (() if scalar_mass else (m,))
        fn = shard_map(local, mesh=procmesh.mesh,
                       in_specs=(spec,) * len(operands),
                       out_specs=spec, check_vma=False)
        out = fn(*operands)
        if scalar_mass:
            out = out * m
        return out

    # readout: ALL meshes in one sharded call, so the halo ppermutes
    # issue together and the displacement arrays bind once.  WITHIN
    # the call, the multi-mesh stencil fuses into one pallas kernel
    # (shared window weights) only for small planes: at slab shapes
    # >~ 2 MB/plane the 3-mesh kernel crashes the Mosaic compiler
    # (measured: OK at 512x512, compile-helper abort at 1024x512+)
    # and the per-mesh kernels are within a few ms anyway —
    # tools/tune_slab.py 'ro'.  READOUT_FUSE_SHARDED=False forces
    # per-mesh kernels everywhere for A/B timing.
    nmesh = len(meshes)
    multi = diffdir == 'all'
    nout = 3 if multi else nmesh
    lo_n, hi_n = max(0, -vmin), max(0, vmax)
    plane_bytes = (int(np.prod(meshes[0].shape[1:]))
                   * meshes[0].dtype.itemsize)
    # multi-diff rolls ONE plane per offset (3 accumulators but a
    # third of the mesh planes live), so it takes its own, larger
    # fuse budget
    limit = (_MULTI_DIFF_FUSE_LIMIT_BYTES if multi
             else _FUSE_PLANE_LIMIT_BYTES)
    fuse = (READOUT_FUSE_SHARDED
            and nout * plane_bytes <= limit)

    def local(*args):
        ms = args[:nmesh]
        dl = args[nmesh:]
        if deep:
            exts = tuple(ext_range(mm, vmin, rows - 1 + vmax)
                         for mm in ms)
            if multi:
                if fuse:
                    return _pk.readout_fused_ext(exts, dl, vmin,
                                                 vmax, kind,
                                                 diffdir='all')
                return tuple(
                    _pk.readout_fused_ext(exts, dl, vmin, vmax, kind,
                                          diffdir=d)[0]
                    for d in range(3))
            if fuse:
                return _pk.readout_fused_ext(exts, dl, vmin, vmax,
                                             kind, diffdir=diffdir)
            return tuple(
                _pk.readout_fused_ext((e,), dl, vmin, vmax, kind,
                                      diffdir=diffdir)[0]
                for e in exts)
        halos = tuple(halo_planes(mm, lo_n, hi_n, ax, D)
                      for mm in ms)
        if multi:
            if fuse:
                return _pk.readout_fused_parts(ms, dl, vmin, vmax,
                                               kind, diffdir='all',
                                               halos=halos)
            return tuple(
                _pk.readout_fused_parts(ms, dl, vmin, vmax, kind,
                                        diffdir=d, halos=halos)[0]
                for d in range(3))
        if fuse:
            return _pk.readout_fused_parts(ms, dl, vmin, vmax, kind,
                                           diffdir=diffdir,
                                           halos=halos)
        return tuple(
            _pk.readout_fused_parts((mm,), dl, vmin, vmax, kind,
                                    diffdir=diffdir, halos=(h,))[0]
            for mm, h in zip(ms, halos))

    fn = shard_map(local, mesh=procmesh.mesh,
                   in_specs=(spec,) * (nmesh + len(disp)),
                   out_specs=(spec,) * nout, check_vma=False)
    return tuple(fn(*(tuple(meshes) + tuple(disp))))


# --- differentiable wrappers -------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _paint_grid(disp, mass, bounds, window, ndim, impl=None,
                procmesh=None):
    return _shift_loop(None, disp, mass, bounds, window, None, 'paint',
                       impl, procmesh)


def _paint_fwd(disp, mass, bounds, window, ndim, impl=None,
               procmesh=None):
    return (_paint_grid(disp, mass, bounds, window, ndim, impl,
                        procmesh),
            (disp, mass))


def _paint_bwd(bounds, window, ndim, impl, procmesh, res, v):
    disp, mass = res
    # mass_bar[q] = sum_v w(q,v) v[q+v]  == readout of v
    mass_bar = _shift_loop((v,), disp, None, bounds, window, None,
                           'readout', impl, procmesh)[0]
    m = jnp.asarray(mass, dtype=disp[0].dtype)
    if m.ndim == 0:
        mass_bar = jnp.sum(mass_bar)
    # s_d_bar[q] = mass[q] * d/ds_d sum_v w = mass * diff-readout_d
    disp_bar = []
    for d in range(ndim):
        rd = _shift_loop((v,), disp, None, bounds, window, d, 'readout',
                         impl, procmesh)[0]
        disp_bar.append(m * rd)
    return tuple(disp_bar), mass_bar


_paint_grid.defvjp(_paint_fwd, _paint_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _readout_grid(meshes, disp, bounds, window, ndim, impl=None,
                  procmesh=None):
    return _shift_loop(meshes, disp, None, bounds, window, None,
                       'readout', impl, procmesh)


def _readout_fwd(meshes, disp, bounds, window, ndim, impl=None,
                 procmesh=None):
    return (_readout_grid(meshes, disp, bounds, window, ndim, impl,
                          procmesh),
            (meshes, disp))


def _readout_bwd(bounds, window, ndim, impl, procmesh, res, vbar):
    meshes, disp = res
    # mesh cotangent: paint of each vbar with the same displacements
    mesh_bar = tuple(
        _shift_loop(None, disp, vb, bounds, window, None, 'paint',
                    impl, procmesh)
        for vb in vbar)
    # displacement cotangent: sum over meshes of vbar * diff-readout
    disp_bar = [jnp.zeros_like(disp[d]) for d in range(ndim)]
    for d in range(ndim):
        rds = _shift_loop(meshes, disp, None, bounds, window, d,
                          'readout', impl, procmesh)
        acc = jnp.zeros_like(disp[d])
        for vb, rd in zip(vbar, rds):
            acc = acc + vb * rd
        disp_bar[d] = acc
    return mesh_bar, tuple(disp_bar)


_readout_grid.defvjp(_readout_fwd, _readout_bwd)


# --- public API --------------------------------------------------------

def paint_grid(disp, mass=None, bounds=(0.0, 1.0), window='cic',
               impl=None, procmesh=None):
    """Paint lattice particles displaced by ``disp`` onto their own mesh.

    Parameters
    ----------
    disp : tuple of ndim arrays, each of the mesh shape
        per-axis displacement from the home cell, in CELL units.
    mass : scalar or mesh-shaped array
    bounds : (lo, hi) floats — static displacement bounds in cells.
        Out-of-bounds displacements silently lose mass; validate with
        :func:`displacement_bounds`.
    procmesh : ProcessMesh or None — run the pallas fast path
        per-slab under shard_map with ring halo exchange.
    """
    disp = tuple(jnp.asarray(s) for s in disp)
    ndim = len(disp)
    if mass is None:
        mass = 1.0
    return _paint_grid(disp, mass, (float(bounds[0]), float(bounds[1])),
                       find_window(window).kind, ndim, impl, procmesh)


def readout_grid(mesh, disp, bounds=(0.0, 1.0), window='cic',
                 diffdir=None, impl=None, procmesh=None):
    """Read one mesh (or a tuple of meshes, sharing the weights) at the
    displaced lattice sites.  Inverse-adjoint of :func:`paint_grid`.

    ``diffdir`` selects the derivative-kernel readout along one axis
    (the reference's gradient windows, _window_imp.c diff kernels):
    the returned value equals the derivative of the interpolated
    field with respect to the particle position along that axis (in
    CELL units), matching ops/paint.py's diffdir convention.

    Differentiating THROUGH a diffdir readout (gradient-of-gradient,
    which the reference refuses outright, pm.py:823) works only on
    the XLA implementation — pass ``impl='xla'``; the pallas kernels
    have no autodiff rule, so on TPU the default would raise at
    trace time.
    """
    single = not isinstance(mesh, (tuple, list))
    meshes = (mesh,) if single else tuple(mesh)
    meshes = tuple(jnp.asarray(m) for m in meshes)
    disp = tuple(jnp.asarray(s) for s in disp)
    ndim = len(disp)
    b = (float(bounds[0]), float(bounds[1]))
    kind = find_window(window).kind
    if diffdir is None:
        out = _readout_grid(meshes, disp, b, kind, ndim, impl,
                            procmesh)
    elif diffdir == 'all':
        # all ndim derivative readouts of ONE mesh in a single fused
        # pass (shared plane rolls) — the gradient-mode force; always
        # returns the tuple of ndim arrays
        if len(meshes) != 1:
            raise ValueError("diffdir='all' takes exactly one mesh")
        return _shift_loop(meshes, disp, None, b, kind, 'all',
                           'readout', impl, procmesh)
    else:
        out = _shift_loop(meshes, disp, None, b, kind, int(diffdir),
                          'readout', impl, procmesh)
    return out[0] if single else out
