"""Pallas TPU kernels for the lattice shift-sum paint/readout.

The XLA formulation in ops/gridpm.py re-reads the displacement fields
and re-writes the accumulator once per integer shift (~10 HBM passes
x nv^3 shifts).  These kernels fuse the shift loop so each plane of
data crosses HBM a handful of times: the grid walks x-planes, each
program holds (N1, N2) planes in VMEM, evaluates the window weights
there, and applies the y/z components of every shift as VMEM lane/
sublane rotations (pltpu.roll — periodic wrap for free).

The x-axis window is expressed through sliding BlockSpecs — one per
block offset dx in [0, vmax - vmin].  Two forms:

- ``*_fused_ext``: the inputs are pre-**extended** arrays with
  ``ext[i + dx]`` holding the global plane ``i0 + i + off + dx``
  (simple, but materializes a full copy of the state per call);
- ``*_fused_parts`` (the production form): the slab INTERIOR reads
  the ORIGINAL arrays in place (index-offset sliding windows) and
  only the O(nv) boundary rows run on a small concatenated window —
  from the periodic wrap on one device, or from ring halo planes
  (parallel/halo.halo_planes ships just those planes over ICI)
  per-shard inside shard_map.

Budget (v5e: ~16 MB VMEM, pipelined refs are double-buffered; a 512^2
f32 plane is 1 MB):

- readout: one call per mesh; refs = 3 aligned displacement planes +
  nv sliding mesh planes (the x-window, one BlockSpec per x-offset)
  + 1 output = 7 planes -> ~14 MB with double buffering.
- paint: gather-form — output plane p pulls source planes p - vx, so
  refs = (3 disp [+ mass]) x nv sliding planes + 1 output.

Wide offset ranges are chunked so the pipelined refs fit VMEM; chunk
partials sum in XLA.

Used by ops/gridpm.py as the TPU implementation; the public API and
the custom VJPs live there.
"""
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernels import find_window

__all__ = ["readout_fused", "paint_fused",
           "readout_fused_ext", "paint_fused_ext",
           "readout_fused_parts", "paint_fused_parts"]


def _shift2(x, vy, vz):
    """plane shifted so result[j, k] = x[(j + vy) % N1, (k + vz) % N2]."""
    n1, n2 = x.shape
    if vy % n1:
        x = pltpu.roll(x, (-vy) % n1, 0)
    if vz % n2:
        x = pltpu.roll(x, (-vz) % n2, 1)
    return x


def _shift2_dyn(x, vy, vz):
    """_shift2 with TRACED shifts (dynamic VMEM rotate) — used by the
    fori_loop form of wide offset ranges, where full unrolling would
    spill registers (measured: nv=6 paint spills 130 MB)."""
    n1, n2 = x.shape
    x = pltpu.roll(x, (-vy) % n1, 0)
    x = pltpu.roll(x, (-vz) % n2, 1)
    return x


# offset volumes above this use the fori_loop kernel form
_UNROLL_LIMIT = 80
# the multi-diff (diffdir='all') kernel keeps 3 accumulators + one
# mesh plane live — its unroll budget is tuned separately (the
# production 27-offset chunk sits right at the shared limit)
_UNROLL_LIMIT_MULTI = 80
# diffdir='all' in ONE kernel (3 accumulators sharing each plane
# roll) measures SLOWER than 3 single-diff passes at the production
# (128, 1024, 1024) shape — 22.6 ms vs 13.3 ms, any unroll, 122 MB
# VMEM (tools/tune_slab.py multi_unroll, v5e) — the triple-height
# VMEM working set costs more than the shared rolls save.  Default
# to the separate passes; the fused kernel stays for A/B and for
# interpret-mode tests.
_MULTI_FUSED = False


def _cdtype(dtype):
    """in-kernel COMPUTE dtype: sub-32-bit storage (bf16 state/meshes
    — half the HBM traffic) is cast to f32 at the VMEM refs because
    Mosaic cannot rotate non-32-bit vectors ("Rotate with non-32-bit
    data") and f32 accumulation is wanted anyway."""
    return jnp.float32 if np.dtype(dtype).itemsize < 4 else dtype


def _axis_k(win, diff, v, s):
    # diff sign convention: see gridpm._axis_weight
    return -win.diff(v - s) if diff else win.kernel(v - s)


def _extend_rows(base, extra):
    """append `extra` wrap rows to base (N0 rows) — tiling as many
    copies as needed when extra > N0."""
    if extra <= 0:
        return base
    n0 = base.shape[0]
    reps = -(-extra // n0)  # ceil
    tail = jnp.concatenate([base] * reps, 0)[:extra]
    return jnp.concatenate([base, tail], 0)


def _interpret():
    return jax.default_backend() != 'tpu'


def _params(vmem_mb=112):
    # v5e has 128 MiB of VMEM; the default scoped limit is 16 MiB.
    # 112 MB: the bf16 1024-slab paint's true scoped footprint is
    # ~101 MB (f32 upcast temps the 100 MB limit rejected).  The
    # 3-output multi-diff readout at 1024-planes needs 115.4 MB
    # (measured scoped-vmem OOM at 112) — it passes 122.
    return pltpu.CompilerParams(
        vmem_limit_bytes=vmem_mb * 1024 * 1024)


def _plane_spec(n1, n2, offset=0):
    return pl.BlockSpec((1, n1, n2), lambda i, o=offset: (i + o, 0, 0),
                        memory_space=pltpu.VMEM)


# pipelined refs are double-buffered; keep their total under this
# budget (v5e VMEM is 128 MiB; leave room for compute temps — wide
# UNROLLED offset ranges were measured to exceed VMEM at 60 MiB via
# register spills, which the fori_loop form now avoids; 72 MiB keeps
# the nv=3 1024-slab paint in ONE chunk instead of three re-reads).
# module-level so the wide-bounds test can shrink it to force chunking
_REF_BUDGET_BYTES = 72 * 1024 * 1024


def _offset_chunks(vmin, vmax, refs_per_offset, fixed_refs,
                   plane_bytes, cplane_bytes=None):
    """split [vmin, vmax] into chunks whose pipelined plane refs fit
    the VMEM budget (each ref is double-buffered).  The in-kernel
    temporaries (per-offset weight planes + accumulators) scale with
    the plane size too, so the ref budget shrinks for large planes
    (measured: a 1024^2-plane readout at the static budget exceeded
    scoped vmem by 17 MB).  ``cplane_bytes`` sizes the temporaries in
    the COMPUTE dtype — bf16 storage still accumulates in f32 planes
    (measured: the bf16 1024-slab paint overflowed scoped vmem by
    880 KB when temps were budgeted at storage width)."""
    nv = vmax - vmin + 1
    temps = (2 * nv + 6) * (cplane_bytes or plane_bytes)
    budget = min(_REF_BUDGET_BYTES,
                 max(2 * plane_bytes, 96 * 1024 * 1024 - temps))
    per_chunk = max(1, (budget // (2 * plane_bytes)
                        - fixed_refs) // refs_per_offset)
    chunks = []
    v0 = vmin
    while v0 <= vmax:
        v1 = min(v0 + per_chunk - 1, vmax)
        chunks.append((v0, v1))
        v0 = v1 + 1
    return chunks


# --- readout ------------------------------------------------------------

def readout_fused_ext(meshes_ext, disp, vmin, vmax, window,
                      diffdir=None, ngrid=None, disp_base=0,
                      out_base=0, out_rows=None, mesh_base=0):
    """sum_v prod_d K(v_d - s_d(q)) * mesh[q + v] over local rows.

    meshes_ext : tuple of (>= ngrid + vmax - vmin, N1, N2) mesh
        arrays — ext[g + dx] = mesh plane at output row
        (g + out_base) + vmin + dx for grid step g.
    disp : 3 aligned displacement arrays; output row g + out_base
        reads disp row g + disp_base.
    ngrid / out_base / out_rows : grid length, first output row, and
        total output rows — lets a caller run the INTERIOR of a local
        slab directly on the unextended arrays (no-copy sliding
        windows) and fill the few boundary rows with a second call.
    Returns one (out_rows, N1, N2) array per mesh.
    """
    win = find_window(window)
    meshes_ext = tuple(meshes_ext)
    nmesh = len(meshes_ext)
    # diffdir='all': ONE mesh, ndim derivative readouts sharing the
    # plane rolls (the expensive part of the stencil) — the
    # gradient-mode force reads one potential with 3 diff kernels
    multi = diffdir == 'all'
    if multi and nmesh != 1:
        raise ValueError("diffdir='all' takes exactly one mesh")
    nout = 3 if multi else nmesh
    _, N1, N2 = disp[0].shape
    nrows = disp[0].shape[0] if ngrid is None else ngrid
    if out_rows is None:
        out_rows = nrows
    dtype = disp[0].dtype
    plane_bytes = N1 * N2 * np.dtype(dtype).itemsize

    def chunk_call(v0, v1):
        cnv = v1 - v0 + 1
        base = v0 - vmin

        nv = vmax - vmin + 1
        # the unrolled body scales with the OUTPUT count too (each
        # offset rolls nmesh planes and feeds nout accumulators):
        # 3-mesh 1024-plane chunks above the limit crash the Mosaic
        # register allocator.  Planes narrower than one 128-lane tile
        # always unroll: tpu.dynamic_rotate rejects sub-tile vectors
        # (measured Mosaic crash on 8x8 planes) and the register
        # pressure argument vanishes at those sizes anyway.
        unroll = (cnv * nv * nv * max(nmesh, nout)
                  <= (_UNROLL_LIMIT_MULTI if multi
                      else _UNROLL_LIMIT)) or N2 < 128

        cdt = _cdtype(dtype)

        def kernel(sxr, syr, szr, *rest):
            mrefs = rest[:nmesh * cnv]
            orefs = rest[nmesh * cnv:]
            sx = sxr[0].astype(cdt)
            sy = syr[0].astype(cdt)
            sz = szr[0].astype(cdt)
            accs = [jnp.zeros((N1, N2), cdt) for _ in range(nout)]
            if unroll and multi:
                ky = [_axis_k(win, False, vy, sy).astype(cdt)
                      for vy in range(vmin, vmax + 1)]
                kyd = [_axis_k(win, True, vy, sy).astype(cdt)
                       for vy in range(vmin, vmax + 1)]
                kz = [_axis_k(win, False, vz, sz).astype(cdt)
                      for vz in range(vmin, vmax + 1)]
                kzd = [_axis_k(win, True, vz, sz).astype(cdt)
                       for vz in range(vmin, vmax + 1)]
                for ivx, vx in enumerate(range(v0, v1 + 1)):
                    kx = _axis_k(win, False, vx, sx).astype(cdt)
                    kxd = _axis_k(win, True, vx, sx).astype(cdt)
                    plane = mrefs[ivx][0].astype(cdt)
                    for ivy, vy in enumerate(range(vmin, vmax + 1)):
                        py = _shift2(plane, vy, 0)
                        a = kx * ky[ivy]     # plain xy
                        b = kxd * ky[ivy]    # d/dx
                        c = kx * kyd[ivy]    # d/dy
                        for ivz, vz in enumerate(range(vmin,
                                                       vmax + 1)):
                            sp = _shift2(py, 0, vz)
                            accs[0] = accs[0] + (b * kz[ivz]) * sp
                            accs[1] = accs[1] + (c * kz[ivz]) * sp
                            accs[2] = accs[2] + (a * kzd[ivz]) * sp
                for m in range(nout):
                    orefs[m][0] = accs[m].astype(dtype)
                return
            if unroll:
                ky = [_axis_k(win, diffdir == 1, vy, sy).astype(cdt)
                      for vy in range(vmin, vmax + 1)]
                kz = [_axis_k(win, diffdir == 2, vz, sz).astype(cdt)
                      for vz in range(vmin, vmax + 1)]
                for ivx, vx in enumerate(range(v0, v1 + 1)):
                    kx = _axis_k(win, diffdir == 0, vx,
                                 sx).astype(cdt)
                    planes = [mrefs[m * cnv + ivx][0].astype(cdt)
                              for m in range(nmesh)]
                    for ivy, vy in enumerate(range(vmin, vmax + 1)):
                        wxy = kx * ky[ivy]
                        pys = [_shift2(p, vy, 0) for p in planes]
                        for ivz, vz in enumerate(range(vmin, vmax + 1)):
                            w = wxy * kz[ivz]
                            for m in range(nmesh):
                                accs[m] = accs[m] + w * _shift2(
                                    pys[m], 0, vz)
                for m in range(nmesh):
                    orefs[m][0] = accs[m].astype(dtype)
                return
            # wide ranges: fori over (vy, vz) with dynamic rotates to
            # bound the register live set (full unrolling spills)
            for ivx, vx in enumerate(range(v0, v1 + 1)):
                planes = [mrefs[m * cnv + ivx][0].astype(cdt)
                          for m in range(nmesh)]
                if multi:
                    kx = _axis_k(win, False, vx, sx).astype(cdt)
                    kxd = _axis_k(win, True, vx, sx).astype(cdt)

                    def body(t, accs, kx=kx, kxd=kxd,
                             plane=planes[0]):
                        vy = vmin + t // nv
                        vz = vmin + t % nv
                        ky = _axis_k(win, False, vy, sy).astype(cdt)
                        kyd = _axis_k(win, True, vy, sy).astype(cdt)
                        kz = _axis_k(win, False, vz, sz).astype(cdt)
                        kzd = _axis_k(win, True, vz, sz).astype(cdt)
                        sp = _shift2_dyn(plane, vy, vz)
                        return (accs[0] + (kxd * ky * kz) * sp,
                                accs[1] + (kx * kyd * kz) * sp,
                                accs[2] + (kx * ky * kzd) * sp)
                else:
                    kx = _axis_k(win, diffdir == 0, vx,
                                 sx).astype(cdt)

                    def body(t, accs, kx=kx, planes=planes):
                        vy = vmin + t // nv
                        vz = vmin + t % nv
                        wxy = kx * _axis_k(win, diffdir == 1, vy,
                                           sy).astype(cdt)
                        w = wxy * _axis_k(win, diffdir == 2, vz,
                                          sz).astype(cdt)
                        return tuple(
                            a + w * _shift2_dyn(p, vy, vz)
                            for a, p in zip(accs, planes))

                accs = list(jax.lax.fori_loop(0, nv * nv, body,
                                              tuple(accs)))
            for m in range(nout):
                orefs[m][0] = accs[m].astype(dtype)

        in_specs = ([_plane_spec(N1, N2, disp_base)] * 3
                    + [_plane_spec(N1, N2, base + dx + mesh_base)
                       for _ in range(nmesh) for dx in range(cnv)])
        margs = []
        for e in meshes_ext:
            margs.extend([e] * cnv)
        return pl.pallas_call(
            kernel,
            grid=(nrows,),
            in_specs=in_specs,
            out_specs=tuple(_plane_spec(N1, N2, out_base)
                            for _ in range(nout)),
            out_shape=tuple(jax.ShapeDtypeStruct((out_rows, N1, N2),
                                                 dtype)
                            for _ in range(nout)),
            compiler_params=_params(122 if multi else 112),
            interpret=_interpret(),
        )(disp[0], disp[1], disp[2], *margs)

    cplane_bytes = N1 * N2 * np.dtype(_cdtype(dtype)).itemsize
    outs = None
    for v0, v1 in _offset_chunks(vmin, vmax, nmesh, 3 + nout,
                                 plane_bytes, cplane_bytes):
        part = chunk_call(v0, v1)
        outs = part if outs is None else tuple(
            o + p for o, p in zip(outs, part))
    return outs


def readout_fused_parts(meshes, disp, vmin, vmax, window,
                        diffdir=None, halos=None):
    """No-copy readout of local slabs: the INTERIOR output rows read
    the ORIGINAL mesh arrays through sliding BlockSpecs (no extended
    copy of the state), and the few boundary rows run on a small
    O(nv)-plane window built from the wrap (halos=None) or from ring
    halo planes (halos = per-mesh (lo, hi) arrays, lo covering mesh
    planes [vmin, -1] and hi covering [nrows, nrows-1+vmax]).
    """
    if diffdir == 'all' and not _MULTI_FUSED and not _interpret():
        # measured: 3 single-diff passes beat the fused 3-accumulator
        # kernel at production shapes (see _MULTI_FUSED note)
        return tuple(readout_fused_parts(
            meshes, disp, vmin, vmax, window, diffdir=d,
            halos=halos)[0] for d in range(len(disp)))
    meshes = tuple(jnp.asarray(m) for m in meshes)
    disp = tuple(jnp.asarray(s) for s in disp)
    nrows = disp[0].shape[0]
    head = max(0, -vmin)
    tail = max(0, vmax)
    nin = nrows - head - tail
    if nin <= 0 or head > nrows or tail > nrows:
        # slabs thinner than the window: build the full ext (tiny)
        if halos is None:
            exts = tuple(_extend_rows(jnp.roll(m, -vmin, 0),
                                      vmax - vmin) for m in meshes)
        else:
            exts = tuple(jnp.concatenate([lo, m, hi], 0)
                         for m, (lo, hi) in zip(meshes, halos))
        return readout_fused_ext(exts, disp, vmin, vmax, window,
                                 diffdir=diffdir)
    if halos is None:
        halos = tuple((m[nrows + vmin:] if vmin < 0 else m[:0],
                       m[:vmax] if vmax > 0 else m[:0])
                      for m in meshes)
    outs = readout_fused_ext(meshes, disp, vmin, vmax, window,
                             diffdir=diffdir, ngrid=nin,
                             disp_base=head, out_base=head,
                             out_rows=nrows, mesh_base=head + vmin)
    parts = []
    if head > 0:
        # output rows [0, head): mesh planes [vmin, head-1+vmax]
        hexts = tuple(jnp.concatenate(
            [lo, m[:head + vmax]], 0) for m, (lo, hi)
            in zip(meshes, halos))
        parts.append((0, head, readout_fused_ext(
            hexts, disp, vmin, vmax, window, diffdir=diffdir,
            ngrid=head, out_rows=head)))
    if tail > 0:
        # output rows [nrows-tail, nrows): planes from
        # nrows - tail + vmin upward, ending in the hi halo
        start = nrows - tail + vmin
        texts = tuple(jnp.concatenate([m[start:], hi], 0)
                      for m, (lo, hi) in zip(meshes, halos))
        parts.append((nrows - tail, tail, readout_fused_ext(
            texts, disp, vmin, vmax, window, diffdir=diffdir,
            ngrid=tail, disp_base=nrows - tail, out_rows=tail)))
    out = list(outs)
    for s, n, po in parts:
        out = [o.at[s:s + n].set(p) for o, p in zip(out, po)]
    return tuple(out)


def paint_fused_parts(disp, mass, vmin, vmax, window, diffdir=None,
                      scalar_mass=True, halos=None):
    """No-copy paint of a local slab (gather form): interior output
    rows read the ORIGINAL source arrays; boundary rows use a small
    window from the wrap or ring halos.

    halos : None (periodic wrap) or per-array (lo, hi) with lo
        covering source planes [-vmax, -1] and hi covering
        [nrows, nrows-1-vmin] — arrays ordered (disp0, disp1, disp2
        [, mass]).
    """
    disp = tuple(jnp.asarray(s) for s in disp)
    arrays = list(disp)
    if not scalar_mass:
        arrays.append(jnp.asarray(mass))
    nrows = arrays[0].shape[0]
    head = max(0, vmax)
    tail = max(0, -vmin)
    nin = nrows - head - tail
    if nin <= 0 or head > nrows or tail > nrows:
        if halos is None:
            exts = tuple(_extend_rows(jnp.roll(a, vmax, 0),
                                      vmax - vmin) for a in arrays)
        else:
            exts = tuple(jnp.concatenate([lo, a, hi], 0)
                         for a, (lo, hi) in zip(arrays, halos))
        return paint_fused_ext(exts[:3],
                               mass if scalar_mass else exts[3],
                               vmin, vmax, window, diffdir=diffdir,
                               scalar_mass=scalar_mass, nrows=nrows)
    if halos is None:
        halos = tuple((a[nrows - vmax:] if vmax > 0 else a[:0],
                       a[:-vmin] if vmin < 0 else a[:0])
                      for a in arrays)
    out = paint_fused_ext(disp, mass if scalar_mass else arrays[3],
                          vmin, vmax, window, diffdir=diffdir,
                          scalar_mass=scalar_mass, nrows=nin,
                          in_base=head - vmax, out_base=head,
                          out_rows=nrows)
    if head > 0:
        # output rows [0, head): source planes [-vmax, head-1-vmin]
        hexts = tuple(jnp.concatenate(
            [lo, a[:max(0, head - vmin)]], 0)
            for a, (lo, hi) in zip(arrays, halos))
        ph = paint_fused_ext(hexts[:3],
                             mass if scalar_mass else hexts[3],
                             vmin, vmax, window, diffdir=diffdir,
                             scalar_mass=scalar_mass, nrows=head,
                             out_rows=head)
        out = out.at[:head].set(ph)
    if tail > 0:
        start = nrows - tail - vmax
        texts = tuple(jnp.concatenate([a[start:], hi], 0)
                      for a, (lo, hi) in zip(arrays, halos))
        pt = paint_fused_ext(texts[:3],
                             mass if scalar_mass else texts[3],
                             vmin, vmax, window, diffdir=diffdir,
                             scalar_mass=scalar_mass, nrows=tail,
                             out_rows=tail)
        out = out.at[nrows - tail:].set(pt)
    return out


@functools.partial(jax.jit, static_argnames=(
    'vmin', 'vmax', 'window', 'diffdir'))
def readout_fused(mesh, disp, vmin, vmax, window, diffdir=None):
    """single-device full-array readout: no-copy interior + wrap
    boundary windows (readout_fused_parts)."""
    return readout_fused_parts((mesh,), tuple(disp), vmin, vmax,
                               window, diffdir=diffdir)[0]


# NOTE: batching several meshes into one kernel (nmesh > 1) measured
# SLOWER than per-mesh calls on v5e (larger VMEM working set pipelines
# worse), so gridpm.py issues one readout call per mesh; the
# multi-mesh body is kept because it is the natural generalization
# and documents the trade-off.


# --- paint --------------------------------------------------------------

def paint_fused_ext(disp_ext, mass_ext, vmin, vmax, window,
                    diffdir=None, scalar_mass=True, nrows=None,
                    in_base=0, out_base=0, out_rows=None):
    """sum_v roll(prod_d K(v_d - s_d) * mass, v) over local rows.

    Gather form: output plane p pulls from source planes p - vx for
    vx in [vmin, vmax].  ``disp_ext`` (and ``mass_ext`` when not
    scalar) are extended arrays with ext[i + in_base + j] = source
    plane for output row (i + out_base), offset j - vmax + vmin...
    i.e. with the defaults, ext[i + j] = global source plane (row i)
    - vmax + j, j in [0, vmax - vmin].  ``in_base``/``out_base``/
    ``out_rows`` let a caller run the slab INTERIOR directly on the
    unextended arrays (no-copy) and patch the boundary rows with a
    second small call.
    """
    win = find_window(window)
    disp_ext = tuple(disp_ext)
    nvm = vmax - vmin
    if nrows is None:
        nrows = disp_ext[0].shape[0] - nvm
    if out_rows is None:
        out_rows = nrows
    _, N1, N2 = disp_ext[0].shape
    dtype = disp_ext[0].dtype
    narr = 3 + (0 if scalar_mass else 1)
    plane_bytes = N1 * N2 * np.dtype(dtype).itemsize
    arrays = list(disp_ext)
    if not scalar_mass:
        arrays.append(mass_ext)

    def chunk_call(v0, v1):
        cnv = v1 - v0 + 1
        # slot dx (0..cnv-1) at output p reads ext[p + base + dx]
        # with base chosen so dx = v1 - vx: source = p - vx
        base = vmax - v1

        nv = vmax - vmin + 1
        # narrow planes always unroll (see readout: dynamic_rotate
        # rejects sub-128-lane vectors)
        unroll = cnv * nv * nv <= _UNROLL_LIMIT or N2 < 128

        cdt = _cdtype(dtype)

        def kernel(*refs):
            orefs = refs[-1]
            acc = jnp.zeros((N1, N2), cdt)
            for vx in range(v0, v1 + 1):
                slot = v1 - vx
                sx = refs[slot][0].astype(cdt)
                sy = refs[cnv + slot][0].astype(cdt)
                sz = refs[2 * cnv + slot][0].astype(cdt)
                kx = _axis_k(win, diffdir == 0, vx, sx).astype(cdt)
                if not scalar_mass:
                    kx = kx * refs[3 * cnv + slot][0].astype(cdt)
                if unroll:
                    for vy in range(vmin, vmax + 1):
                        wxy = kx * _axis_k(win, diffdir == 1, vy,
                                           sy).astype(cdt)
                        for vz in range(vmin, vmax + 1):
                            c = wxy * _axis_k(win, diffdir == 2, vz,
                                              sz).astype(cdt)
                            # placed at p = q + v: result[p] = c[p-v]
                            acc = acc + _shift2(c, -vy, -vz)
                    continue

                # wide ranges: fori over (vy, vz), dynamic rotates
                # (full unrolling spills registers — see _UNROLL_LIMIT)
                def body(t, acc, kx=kx, sy=sy, sz=sz):
                    vy = vmin + t // nv
                    vz = vmin + t % nv
                    wxy = kx * _axis_k(win, diffdir == 1, vy,
                                       sy).astype(cdt)
                    c = wxy * _axis_k(win, diffdir == 2, vz,
                                      sz).astype(cdt)
                    return acc + _shift2_dyn(c, -vy, -vz)

                acc = jax.lax.fori_loop(0, nv * nv, body, acc)
            orefs[0] = acc.astype(dtype)

        in_specs = [_plane_spec(N1, N2, base + dx + in_base)
                    for _ in range(narr) for dx in range(cnv)]
        args = []
        for a in arrays:
            args.extend([a] * cnv)
        return pl.pallas_call(
            kernel,
            grid=(nrows,),
            in_specs=in_specs,
            out_specs=_plane_spec(N1, N2, out_base),
            out_shape=jax.ShapeDtypeStruct((out_rows, N1, N2), dtype),
            compiler_params=_params(),
            interpret=_interpret(),
        )(*args)

    cplane_bytes = N1 * N2 * np.dtype(_cdtype(dtype)).itemsize
    out = None
    for v0, v1 in _offset_chunks(vmin, vmax, narr, 1, plane_bytes,
                                 cplane_bytes):
        part = chunk_call(v0, v1)
        out = part if out is None else out + part
    if scalar_mass:
        out = out * jnp.asarray(mass_ext, dtype)
    return out


@functools.partial(jax.jit, static_argnames=(
    'vmin', 'vmax', 'window', 'diffdir', 'scalar_mass'))
def paint_fused(disp, mass, vmin, vmax, window, diffdir=None,
                scalar_mass=True):
    """single-device full-array lattice paint: no-copy interior +
    wrap boundary windows (paint_fused_parts)."""
    return paint_fused_parts(tuple(disp), mass, vmin, vmax, window,
                             diffdir=diffdir,
                             scalar_mass=scalar_mass)
