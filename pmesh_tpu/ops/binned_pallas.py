"""Pallas TPU kernel for the binned slot-lattice rebase.

The XLA formulation (ops/binned.py rebase) re-reads every field and
rewrites every accumulator once per (slot, offset) image — measured
~5x off the bandwidth roofline (323 ms for a 0.9 GB state at 256^3).
This kernel walks x-planes: each program pulls the three source
planes p-1, p, p+1 of every field (sliding BlockSpecs — the same
pattern as the shift-sum paint), replays the image enumeration
entirely in VMEM (arrival-rank counting with pltpu.roll shifts for
the y/z offsets), and writes each output field exactly once.  HBM
traffic drops to ~4x the state size.

Scope: 3-d, integer drift offsets within [-1, 1] per axis (the
per-step rebase regime; wider drifts use the XLA fallback), periodic
wrap via the wrap-extended x window and VMEM rotations.

The image order is k-major, offset-lexicographic — identical to the
XLA version, so the two implementations are BIT-identical (pinned by
tests/test_binned.py).
"""
import functools
import itertools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rebase_fused_t", "rebase_fused_sharded"]


def _interpret():
    return jax.default_backend() != 'tpu'


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)


def _shift2(x, vy, vz):
    """result[j, k] = x[(j + vy) % N1, (k + vz) % N2]."""
    n1, n2 = x.shape
    if vy % n1:
        x = pltpu.roll(x, (-vy) % n1, 0)
    if vz % n2:
        x = pltpu.roll(x, (-vz) % n2, 1)
    return x


def _shift2_dyn(x, vy, vz):
    """_shift2 with TRACED shifts (dynamic VMEM rotate), for the
    fori_loop kernel forms (see _use_fori)."""
    n1, n2 = x.shape
    x = pltpu.roll(x, (-vy) % n1, 0)
    x = pltpu.roll(x, (-vz) % n2, 1)
    return x


def _use_fori(N1, N2):
    """The (oy, oz) offset loop runs as a lax.fori_loop with dynamic
    rotates instead of a 9x unroll: full unrolling keeps every
    iteration's plane temporaries live and blows scoped VMEM at
    production plane sizes (measured: the 54-image assign kernel
    needs 211 MB at 512^2 planes vs the 128 MB cap).  Mosaic's
    dynamic_rotate rejects sub-128-lane vectors (memory: gridpm
    readout), so narrow planes keep the unrolled form — they are far
    below any VMEM limit anyway."""
    return N2 >= 128


def _extend_rows(base, lo, hi):
    """rows [-lo, n0+hi) with periodic wrap."""
    n0 = base.shape[0]
    parts = []
    if lo > 0:
        parts.append(base[n0 - lo:])
    parts.append(base)
    if hi > 0:
        parts.append(base[:hi])
    return jnp.concatenate(parts, 0)


def _rebase_call(dext, vext, eext, K, Kout, nextra, nrows):
    """The plane-walk kernel on already-x-extended inputs.

    dext : (nrows + 2, K, 3, N1, N2) — ext[i + 1 + ox] = source plane
        (local row i) + ox, for ox in [-1, 1] (wrap rows on a single
        device, ring-halo planes under shard_map).
    Returns x-first outputs (od (nrows, Kout, 3, N1, N2), ov, oo[, oe]).
    """
    _, _, _, N1, N2 = dext.shape
    N0 = nrows
    dtype = dext.dtype
    offsets = list(itertools.product((-1, 0, 1), repeat=3))

    def spec_d(off):
        return pl.BlockSpec((1, K, 3, N1, N2),
                            lambda i, o=off: (i + o, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def spec_v(off):
        return pl.BlockSpec((1, K, N1, N2),
                            lambda i, o=off: (i + o, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def spec_e(off):
        return pl.BlockSpec((1, nextra * K, 3, N1, N2),
                            lambda i, o=off: (i + o, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def out_d():
        return pl.BlockSpec((1, Kout, 3, N1, N2),
                            lambda i: (i, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def out_v():
        return pl.BlockSpec((1, Kout, N1, N2),
                            lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def out_e():
        return pl.BlockSpec((1, nextra * Kout, 3, N1, N2),
                            lambda i: (i, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def kernel(*refs):
        drefs = refs[0:3]          # x-window slots ox = -1, 0, +1
        vrefs = refs[3:6]
        erefs = refs[6:9] if nextra else ()
        orefs = refs[6 + (3 if nextra else 0):]
        od_ref = orefs[0]
        ov_ref = orefs[1]
        oo_ref = orefs[2]
        oe_ref = orefs[3] if nextra else None

        running = jnp.zeros((N1, N2), jnp.int32)
        over = jnp.zeros((), jnp.float32)
        nd = [[jnp.zeros((N1, N2), dtype) for _ in range(3)]
              for _ in range(Kout)]
        nv = [jnp.zeros((N1, N2), dtype) for _ in range(Kout)]
        ne = [[[jnp.zeros((N1, N2), dtype) for _ in range(3)]
               for _ in range(Kout)] for _ in range(nextra)]
        fori = _use_fori(N1, N2)

        def image(carry, d, val, eplanes, ox, oy, oz, shift):
            running, over, nv, nd, ne = carry
            fdt = d[0].dtype
            sel = (val > 0) & (jnp.floor(d[0]) == ox)
            sel = sel & (jnp.floor(d[1]) == jnp.asarray(oy, fdt))
            sel = sel & (jnp.floor(d[2]) == jnp.asarray(oz, fdt))
            # rotate as f32: Mosaic's dynamic rotate rejects
            # sub-32-bit (bool) data
            arr = shift(jnp.where(sel, 1.0, 0.0).astype(
                jnp.float32), -oy, -oz) > 0
            rank = running
            running = running + arr.astype(jnp.int32)
            over = over + jnp.sum(jnp.where(
                arr & (rank >= Kout), 1.0, 0.0)).astype(jnp.float32)
            offa = (ox, oy, oz)
            moved_d = [shift(d[a] - jnp.asarray(offa[a], fdt),
                             -oy, -oz) for a in range(3)]
            moved_e = [[shift(eplanes[e][a], -oy, -oz)
                        for a in range(3)] for e in range(nextra)]
            nv = list(nv)
            nd = [list(row) for row in nd]
            ne = [[list(row) for row in blk] for blk in ne]
            for j in range(Kout):
                put = arr & (rank == j)
                nv[j] = jnp.where(put, jnp.asarray(1, dtype), nv[j])
                for a in range(3):
                    nd[j][a] = jnp.where(put, moved_d[a], nd[j][a])
                    for e in range(nextra):
                        ne[e][j][a] = jnp.where(
                            put, moved_e[e][a], ne[e][j][a])
            return (running, over, nv, nd, ne)

        carry = (running, over, nv, nd, ne)
        for k in range(K):
            for ox in (-1, 0, 1):
                # arrivals at plane p with x-offset ox come from
                # source plane p - ox; ext slot j holds plane p+j-1
                slot = 1 - ox
                d = [drefs[slot][0, k, a] for a in range(3)]
                val = vrefs[slot][0, k]
                eplanes = [[erefs[slot][0, e * K + k, a]
                            for a in range(3)]
                           for e in range(nextra)]
                if fori:
                    def body(i, carry, d=d, val=val,
                             eplanes=eplanes, ox=ox):
                        oy = i // 3 - 1
                        oz = i % 3 - 1
                        return image(carry, d, val, eplanes, ox,
                                     oy, oz, _shift2_dyn)
                    flat, tree = jax.tree_util.tree_flatten(carry)
                    def fbody(i, flat, body=body, tree=tree):
                        c = jax.tree_util.tree_unflatten(tree, flat)
                        return jax.tree_util.tree_leaves(body(i, c))
                    flat = jax.lax.fori_loop(0, 9, fbody, flat)
                    carry = jax.tree_util.tree_unflatten(tree, flat)
                else:
                    for oy, oz in itertools.product((-1, 0, 1),
                                                    repeat=2):
                        carry = image(carry, d, val, eplanes, ox,
                                      oy, oz, _shift2)
        running, over, nv, nd, ne = carry

        for j in range(Kout):
            ov_ref[0, j] = nv[j]
            for a in range(3):
                od_ref[0, j, a] = nd[j][a]
                for e in range(nextra):
                    oe_ref[0, e * Kout + j, a] = ne[e][j][a]
        # per-plane overflow count in an (8, 128)-tiled scalar slot
        iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) \
            + 128 * jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        oo_ref[0] = jnp.where(iota == 0, over, 0.0)

    in_specs = ([spec_d(o) for o in range(3)]
                + [spec_v(o) for o in range(3)])
    args = [dext, dext, dext, vext, vext, vext]
    if nextra:
        in_specs += [spec_e(o) for o in range(3)]
        args += [eext, eext, eext]
    out_specs = [out_d(), out_v(),
                 pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [
        jax.ShapeDtypeStruct((N0, Kout, 3, N1, N2), dtype),
        jax.ShapeDtypeStruct((N0, Kout, N1, N2), dtype),
        jax.ShapeDtypeStruct((N0, 8, 128), jnp.float32)]
    if nextra:
        out_specs.append(out_e())
        out_shape.append(jax.ShapeDtypeStruct(
            (N0, nextra * Kout, 3, N1, N2), dtype))

    return pl.pallas_call(
        kernel,
        grid=(N0,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=_params(),
        interpret=_interpret(),
    )(*args)


def _boundary_ext(a, axis):
    """planes [N0-2, N0-1, 0, 1] of ``a`` along ``axis`` — the only
    copied planes of the no-copy window scheme."""
    n0 = a.shape[axis]
    idx = [n0 - 2, n0 - 1, 0, 1] if n0 >= 2 else [0] * 4
    return jnp.take(a, jnp.asarray(idx), axis=axis)


# --- tuple-form split rebase (no stack/unstack copies) ------------------
#
# The stacked forms above cost three full copies on the way in
# (jnp.stack into (K,3,N^3) / (nextra,K,3,N^3) / (K,N^3)) and as many
# on the way out — at 512^3 K=2 + velocities that is ~7 GB of pure
# copy temps on top of the live state, which OOMed the 16 GB chip the
# moment the superstep donated its buffers (XLA: 19.0 G of 15.75 G).
# The tuple forms below feed the state arrays THEMSELVES to the
# pallas calls (one ref per (slot, axis) array per x-window offset)
# and emit one output array per (slot, axis) — the same plane-walk
# kernels, the same k-major offset-lex image order, zero repacking.


def _route_dtype(K):
    """route codes are integers < 27 K + 27: bf16 stores them exactly
    up to 256 (K <= 8) at half the HBM footprint and traffic of f32 —
    the route field is Kout full meshes, 1 GB at 512^3 Kout=2."""
    return jnp.bfloat16 if 27 * K + 27 <= 256 else jnp.float32


def _assign_kernel_t(K, Kout, N1, N2, dtype):
    """_assign_kernel with per-array refs.

    refs: [d(slot, k, a) : 9K] [v(slot, k) : 3K]
    outs: [nd(j, a) : 3 Kout] [nv(j) : Kout] [rt(j) : Kout] [oo]
    (slot = x-window offset index 0..2; every ref is a (1, N1, N2)
    plane block)."""
    offsets = list(itertools.product((-1, 0, 1), repeat=3))
    fori = _use_fori(N1, N2)
    rdt = _route_dtype(K)

    def kernel(*refs):
        dref = lambda slot, k, a: refs[slot * 3 * K + k * 3 + a]
        vref = lambda slot, k: refs[9 * K + slot * K + k]
        orefs = refs[12 * K:]
        od = lambda j, a: orefs[j * 3 + a]
        ov = lambda j: orefs[3 * Kout + j]
        ort = lambda j: orefs[4 * Kout + j]
        oo_ref = orefs[5 * Kout]

        running = jnp.zeros((N1, N2), jnp.int32)
        over = jnp.zeros((), jnp.float32)
        nd = [[jnp.zeros((N1, N2), dtype) for _ in range(3)]
              for _ in range(Kout)]
        # rt accumulates in f32 (bf16 wheres would force an i1 mask
        # relayout (8,128)->(16,128) Mosaic rejects); the STORE below
        # casts to the route dtype
        nv = [jnp.zeros((N1, N2), dtype) for _ in range(Kout)]
        rt = [jnp.full((N1, N2), -1.0, jnp.float32)
              for _ in range(Kout)]

        def image(carry, d, val, ox, oy, oz, code, shift):
            running, over, nv, rt, nd = carry
            sel = (val > 0) & (jnp.floor(d[0]) == ox)
            fdt = d[0].dtype
            sel = sel & (jnp.floor(d[1]) == jnp.asarray(oy, fdt))
            sel = sel & (jnp.floor(d[2]) == jnp.asarray(oz, fdt))
            arr = shift(jnp.where(sel, 1.0, 0.0).astype(
                jnp.float32), -oy, -oz) > 0
            rank = running
            running = running + arr.astype(jnp.int32)
            over = over + jnp.sum(jnp.where(
                arr & (rank >= Kout), 1.0, 0.0)).astype(jnp.float32)
            offa = (ox, oy, oz)
            moved_d = [shift(d[a] - jnp.asarray(offa[a], fdt),
                             -oy, -oz) for a in range(3)]
            nv = list(nv)
            rt = list(rt)
            nd = [list(row) for row in nd]
            for j in range(Kout):
                put = arr & (rank == j)
                nv[j] = jnp.where(put, jnp.asarray(1, dtype), nv[j])
                rt[j] = jnp.where(put, code, rt[j])
                for a in range(3):
                    nd[j][a] = jnp.where(put, moved_d[a], nd[j][a])
            return (running, over, nv, rt, nd)

        carry = (running, over, nv, rt, nd)
        for k in range(K):
            for ox in (-1, 0, 1):
                slot = 1 - ox      # source plane = target - ox
                d = [dref(slot, k, a)[0] for a in range(3)]
                val = vref(slot, k)[0]
                base = k * len(offsets) + (ox + 1) * 9
                if fori:
                    def body(i, carry, d=d, val=val, ox=ox,
                             base=base):
                        oy = i // 3 - 1
                        oz = i % 3 - 1
                        code = (jnp.asarray(base, jnp.float32)
                                + i.astype(jnp.float32))
                        return image(carry, d, val, ox, oy, oz,
                                     code, _shift2_dyn)
                    flat, tree = jax.tree_util.tree_flatten(carry)
                    def fbody(i, flat, body=body, tree=tree):
                        c = jax.tree_util.tree_unflatten(tree, flat)
                        return jax.tree_util.tree_leaves(body(i, c))
                    flat = jax.lax.fori_loop(0, 9, fbody, flat)
                    carry = jax.tree_util.tree_unflatten(tree, flat)
                else:
                    for oi9, (oy, oz) in enumerate(
                            itertools.product((-1, 0, 1), repeat=2)):
                        code = np.float32(base + oi9)
                        carry = image(carry, d, val, ox, oy, oz,
                                      code, _shift2)

        running, over, nv, rt, nd = carry
        for j in range(Kout):
            ov(j)[0] = nv[j]
            ort(j)[0] = rt[j].astype(rdt)
            for a in range(3):
                od(j, a)[0] = nd[j][a]
        iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) \
            + 128 * jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        oo_ref[0] = jnp.where(iota == 0, over, 0.0)
    return kernel


def _run_assign_t(dflat, vtup, K, Kout, in_maps, out_map, grid_len,
                  N0_out):
    """one tuple-form assign pallas_call: ``in_maps`` gives the three
    x-window source-plane index maps, ``out_map`` the target plane."""
    N1, N2 = dflat[0].shape[1:]
    dtype = dflat[0].dtype
    kern = _assign_kernel_t(K, Kout, N1, N2, dtype)

    def ispec(m):
        return pl.BlockSpec((1, N1, N2), lambda i, m=m: (m(i), 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = ([ispec(m) for m in in_maps for _ in range(3 * K)]
                + [ispec(m) for m in in_maps for _ in range(K)])
    args = (list(dflat) * 3) + (list(vtup) * 3)
    ospec = pl.BlockSpec((1, N1, N2), lambda i: (out_map(i), 0, 0),
                         memory_space=pltpu.VMEM)
    out_specs = ([ospec] * (5 * Kout)
                 + [pl.BlockSpec((1, 8, 128),
                                 lambda i: (out_map(i), 0, 0),
                                 memory_space=pltpu.VMEM)])
    # outputs are ordered [nd 3Kout][nv Kout][rt Kout][oo]
    out_shape = ([jax.ShapeDtypeStruct((N0_out, N1, N2), dtype)
                  for _ in range(3 * Kout + Kout)]
                 + [jax.ShapeDtypeStruct((N0_out, N1, N2),
                                         _route_dtype(K))
                    for _ in range(Kout)]
                 + [jax.ShapeDtypeStruct((N0_out, 8, 128),
                                         jnp.float32)])
    outs = pl.pallas_call(
        kern, grid=(grid_len,),
        in_specs=in_specs, out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=_params(), interpret=_interpret(),
    )(*args)
    nd = outs[:3 * Kout]
    nv = outs[3 * Kout:4 * Kout]
    rt = outs[4 * Kout:5 * Kout]
    oo = outs[5 * Kout]
    return nd, nv, rt, oo


def _assign_split_t(dflat, vtup, K, Kout):
    """tuple-form phase A: interior planes on the original arrays +
    the two wrap boundary planes from 4-plane windows."""
    N0 = dflat[0].shape[0]
    interior_maps = [(lambda o: (lambda i, o=o: i + o))(o)
                     for o in range(3)]
    if N0 < 4:
        dext = tuple(_extend_rows(x, 1, 1) for x in dflat)
        vext = tuple(_extend_rows(x, 1, 1) for x in vtup)
        return _run_assign_t(dext, vext, K, Kout, interior_maps,
                             lambda i: i, N0, N0)

    nd, nv, rt, oo = _run_assign_t(dflat, vtup, K, Kout,
                                   interior_maps, lambda i: i + 1,
                                   N0 - 2, N0)
    # boundary planes 0 and N0-1: ext = [N0-2, N0-1, 0, 1]; target
    # t=0 -> plane 0 (sources ext 1,2,3), t=1 -> plane N0-1 (0,1,2)
    dbe = tuple(_boundary_ext(x, 0) for x in dflat)
    vbe = tuple(_boundary_ext(x, 0) for x in vtup)
    bmaps = [(lambda o: (lambda t, o=o: o + 1 - t))(o)
             for o in range(3)]
    bnd, bnv, brt, boo = _run_assign_t(dbe, vbe, K, Kout, bmaps,
                                       lambda t: t, 2, 2)

    def patch(x, b):
        return x.at[0].set(b[0]).at[N0 - 1].set(b[1])

    nd = tuple(patch(x, b) for x, b in zip(nd, bnd))
    nv = tuple(patch(x, b) for x, b in zip(nv, bnv))
    rt = tuple(patch(x, b) for x, b in zip(rt, brt))
    oo = patch(oo, boo)
    return nd, nv, rt, oo


def _apply_kernel_t(K, Kout, nextra, N1, N2, dtype):
    """_apply_kernel with per-array refs.

    refs: [e(slot, e, k, a) : 9 nextra K] [rt(j) : Kout]
    outs: [ne(e, j, a) : 3 nextra Kout]."""
    offsets = list(itertools.product((-1, 0, 1), repeat=3))
    fori = _use_fori(N1, N2)
    NE = 3 * nextra * K

    def kernel(*refs):
        eref = lambda slot, e, k, a: refs[slot * NE + (e * K + k) * 3
                                          + a]
        rref = lambda j: refs[3 * NE + j]
        orefs = refs[3 * NE + Kout:]
        oe = lambda e, j, a: orefs[(e * Kout + j) * 3 + a]

        ne = [[[jnp.zeros((N1, N2), dtype) for _ in range(3)]
               for _ in range(Kout)] for _ in range(nextra)]
        # upcast the route planes ONCE; comparing at bf16 layout
        # would relayout the i1 masks (see _assign_kernel_t)
        routes = [rref(j)[0].astype(jnp.float32)
                  for j in range(Kout)]

        def image(ne, eplanes, oy, oz, code, shift):
            ne = [[list(row) for row in blk] for blk in ne]
            moved = [[shift(eplanes[e][a], -oy, -oz)
                      for a in range(3)] for e in range(nextra)]
            for j in range(Kout):
                put = routes[j] == code
                for e in range(nextra):
                    for a in range(3):
                        ne[e][j][a] = jnp.where(
                            put, moved[e][a], ne[e][j][a])
            return ne

        for k in range(K):
            for ox in (-1, 0, 1):
                slot = 1 - ox
                eplanes = [[eref(slot, e, k, a)[0]
                            for a in range(3)]
                           for e in range(nextra)]
                base = k * len(offsets) + (ox + 1) * 9
                if fori:
                    def body(i, ne, eplanes=eplanes, base=base):
                        oy = i // 3 - 1
                        oz = i % 3 - 1
                        code = (jnp.asarray(base, jnp.float32)
                                + i.astype(jnp.float32))
                        return image(ne, eplanes, oy, oz, code,
                                     _shift2_dyn)
                    flat, tree = jax.tree_util.tree_flatten(ne)
                    def fbody(i, flat, body=body, tree=tree):
                        c = jax.tree_util.tree_unflatten(tree, flat)
                        return jax.tree_util.tree_leaves(body(i, c))
                    flat = jax.lax.fori_loop(0, 9, fbody, flat)
                    ne = jax.tree_util.tree_unflatten(tree, flat)
                else:
                    for oi9, (oy, oz) in enumerate(
                            itertools.product((-1, 0, 1), repeat=2)):
                        ne = image(ne, eplanes, oy, oz,
                                   np.float32(base + oi9), _shift2)
        for e in range(nextra):
            for j in range(Kout):
                for a in range(3):
                    oe(e, j, a)[0] = ne[e][j][a]
    return kernel


def _run_apply_t(eflat, rtup, K, Kout, nextra, in_maps, rt_map,
                 out_map, grid_len, N0_out):
    N1, N2 = eflat[0].shape[1:]
    dtype = eflat[0].dtype
    kern = _apply_kernel_t(K, Kout, nextra, N1, N2, dtype)

    def ispec(m):
        return pl.BlockSpec((1, N1, N2), lambda i, m=m: (m(i), 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = ([ispec(m) for m in in_maps
                 for _ in range(3 * nextra * K)]
                + [ispec(rt_map) for _ in range(Kout)])
    args = (list(eflat) * 3) + list(rtup)
    ospec = pl.BlockSpec((1, N1, N2), lambda i: (out_map(i), 0, 0),
                         memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern, grid=(grid_len,),
        in_specs=in_specs,
        out_specs=tuple([ospec] * (3 * nextra * Kout)),
        out_shape=tuple(jax.ShapeDtypeStruct((N0_out, N1, N2), dtype)
                        for _ in range(3 * nextra * Kout)),
        compiler_params=_params(), interpret=_interpret(),
    )(*args)
    return outs


def _apply_split_t(rtup, eflat, K, Kout, nextra):
    N0 = eflat[0].shape[0]
    interior_maps = [(lambda o: (lambda i, o=o: i + o))(o)
                     for o in range(3)]
    if N0 < 4:
        eext = tuple(_extend_rows(x, 1, 1) for x in eflat)
        return _run_apply_t(eext, rtup, K, Kout, nextra,
                            interior_maps, lambda i: i, lambda i: i,
                            N0, N0)
    oe = _run_apply_t(eflat, rtup, K, Kout, nextra, interior_maps,
                      lambda i: i + 1, lambda i: i + 1, N0 - 2, N0)
    ebe = tuple(_boundary_ext(x, 0) for x in eflat)
    rbe = tuple(_boundary_ext(x, 0) for x in rtup)
    bmaps = [(lambda o: (lambda t, o=o: o + 1 - t))(o)
             for o in range(3)]
    boe = _run_apply_t(ebe, rbe, K, Kout, nextra, bmaps,
                       lambda t: 2 - t, lambda t: t, 2, 2)
    return tuple(x.at[0].set(b[0]).at[N0 - 1].set(b[1])
                 for x, b in zip(oe, boe))


@functools.partial(jax.jit, static_argnames=('K', 'Kout', 'nextra'))
def rebase_fused_t(dflat, vtup, eflat, K, Kout, nextra):
    """tuple-form split rebase: two-phase assign/apply execution on
    flat tuples of arrays (dflat: K*3 k-major, vtup: K, eflat:
    nextra*K*3 (e,k,a)-major), returning flat tuples (nd: Kout*3,
    nv: Kout, ne: nextra*Kout*3, overflow).  Phase A reads only
    displacements+validity and emits a per-slot ROUTE code; phase B
    replays the route on the extra payloads, so the old displacements
    are dead before the new velocities are born.

    No stacked temporaries: at 512^3 K=2 + velocities the stacked
    form's jnp.stack/unstack copies alone are ~7 GB — more than the
    donated state itself — and pushed the superstep to 19 GB on a
    15.75 GB chip."""
    nd, nv, rt, oo = _assign_split_t(tuple(dflat), tuple(vtup),
                                     K, Kout)
    overflow = jnp.sum(oo).astype(jnp.int32)
    if nextra:
        ne = _apply_split_t(rt, tuple(eflat), K, Kout, nextra)
    else:
        ne = ()
    return tuple(nd), tuple(nv), tuple(ne), overflow


@functools.partial(jax.jit, static_argnames=('procmesh', 'K', 'Kout',
                                             'nextra'))
def rebase_fused_sharded(procmesh, dstack, vstack, estacks, K, Kout,
                         nextra):
    """slab-sharded rebase: the same plane-walk kernel per shard with
    the two x-halo planes ppermuted from ring neighbors
    (parallel/halo.extend_x) — the rebase's rolls really do lower to
    collective permutes on a device mesh (the binned.py contract)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from ..parallel.halo import extend_x
    _, _, N0, N1, N2 = dstack.shape
    dtype = dstack.dtype
    D = procmesh.size
    ax = procmesh.axis
    if N0 % D != 0:
        raise ValueError(
            "the sharded rebase needs Nmesh[0] %% n_devices == 0 "
            "(got %d %% %d)" % (N0, D))
    rows = N0 // D

    def local(dl, vl, el):
        dext = extend_x(jnp.moveaxis(dl, 2, 0), 1, 1, ax, D)
        vext = extend_x(jnp.moveaxis(vl, 1, 0), 1, 1, ax, D)
        eext = (extend_x(jnp.moveaxis(el.reshape(
            (nextra * K, 3, rows, N1, N2)), 2, 0), 1, 1, ax, D)
            if nextra else None)
        outs = _rebase_call(dext, vext, eext, K, Kout, nextra, rows)
        over = jax.lax.psum(jnp.sum(outs[2]), ax)
        return tuple(outs[:2]) + ((outs[3],) if nextra else ()) \
            + (over,)

    espec = P(None, None, None, ax, None, None)
    fn = shard_map(local, mesh=procmesh.mesh,
                   in_specs=(P(None, None, ax, None, None),
                             P(None, ax, None, None), espec),
                   out_specs=(P(ax, None, None, None, None),
                              P(ax, None, None, None),)
                   + ((P(ax, None, None, None, None),) if nextra
                      else ()) + (P(),),
                   check_vma=False)
    if not nextra:
        estacks = jnp.zeros((0, K, 3, N0, N1, N2), dtype)
    outs = fn(dstack, vstack, estacks)
    if nextra:
        od, ov, oe, over = outs
        nd = jnp.moveaxis(od, 0, 2)
        nv = jnp.moveaxis(ov, 0, 1)
        ne = jnp.moveaxis(oe, 0, 2).reshape(
            (nextra, Kout, 3, N0, N1, N2))
    else:
        od, ov, over = outs
        nd = jnp.moveaxis(od, 0, 2)
        nv = jnp.moveaxis(ov, 0, 1)
        ne = jnp.zeros((0,), dtype)
    return nd, nv, ne, over.astype(jnp.int32)
