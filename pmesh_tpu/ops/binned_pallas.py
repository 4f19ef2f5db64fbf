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

__all__ = ["rebase_fused"]


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


def _unpack(outs, K, Kout, nextra, N0, N1, N2, dtype):
    nd = jnp.moveaxis(outs[0], 0, 2)           # (Kout, 3, N0, N1, N2)
    nv = jnp.moveaxis(outs[1], 0, 1)           # (Kout, N0, N1, N2)
    overflow = jnp.sum(outs[2]).astype(jnp.int32)
    if nextra:
        ne = jnp.moveaxis(outs[3], 0, 2).reshape(
            (nextra, Kout, 3, N0, N1, N2))
    else:
        ne = jnp.zeros((0,), dtype)
    return nd, nv, ne, overflow


@functools.partial(jax.jit, static_argnames=('K', 'Kout', 'nextra'))
def rebase_fused(dstack, vstack, estacks, K, Kout, nextra):
    """fused rebase of a binned state with drift offsets in [-1, 1].

    Two-phase SPLIT execution (the 512^3-on-one-chip memory shape):

    - phase A (assign) reads only displacements+validity through
      no-copy sliding x-windows (the wrap touches 4 boundary planes,
      not a whole extended copy of the state) and emits the new
      displacements, validity, and a per-slot ROUTE code recording
      which (slot, offset) image won each cell;
    - phase B (apply) moves the extra payloads (velocities) by
      replaying the route — the old displacements are DEAD before the
      new velocities are born, so old+new state never coexist whole.

    Peak HBM at 512^3 K=2 + velocities: ~13 GB vs ~23 GB for the
    monolithic ext-copy form.  Bit-identical to the XLA formulation
    (same k-major offset-lex image order; pinned by tests).

    Parameters
    ----------
    dstack : (K, 3, N0, N1, N2) displacement fields
    vstack : (K, N0, N1, N2) validity fields
    estacks : (nextra, K, 3, N0, N1, N2) extra payloads (velocities)

    Returns (new_dstack (Kout,3,...), new_vstack (Kout,...),
    new_estacks (nextra,Kout,3,...), overflow ()).
    """
    _, _, N0, N1, N2 = dstack.shape
    dtype = dstack.dtype
    nd, nv, route, oo = _assign_split(dstack, vstack, K, Kout)
    overflow = jnp.sum(oo).astype(jnp.int32)
    if nextra:
        ne = _apply_split(route, estacks, K, Kout, nextra)
    else:
        ne = jnp.zeros((0,), dtype)
    return nd, nv, ne, overflow


def _boundary_ext(a, axis):
    """planes [N0-2, N0-1, 0, 1] of ``a`` along ``axis`` — the only
    copied planes of the no-copy window scheme."""
    n0 = a.shape[axis]
    idx = [n0 - 2, n0 - 1, 0, 1] if n0 >= 2 else [0] * 4
    return jnp.take(a, jnp.asarray(idx), axis=axis)


def _assign_kernel(K, Kout, N1, N2, dtype, with_route=True):
    offsets = list(itertools.product((-1, 0, 1), repeat=3))
    fori = _use_fori(N1, N2)

    def kernel(*refs):
        drefs = refs[0:3]          # x-window slots ox = -1, 0, +1
        vrefs = refs[3:6]
        od_ref, ov_ref, ort_ref, oo_ref = refs[6:10]

        running = jnp.zeros((N1, N2), jnp.int32)
        over = jnp.zeros((), jnp.float32)
        nd = [[jnp.zeros((N1, N2), dtype) for _ in range(3)]
              for _ in range(Kout)]
        nv = [jnp.zeros((N1, N2), dtype) for _ in range(Kout)]
        rt = [jnp.full((N1, N2), -1.0, jnp.float32)
              for _ in range(Kout)]

        def image(carry, d, val, ox, oy, oz, code, shift):
            """one (slot, offset) image in arrival-rank order; oy/oz
            may be traced (fori form) or python ints (unrolled)."""
            running, over, nv, rt, nd = carry
            sel = (val > 0) & (jnp.floor(d[0]) == ox)
            fdt = d[0].dtype
            sel = sel & (jnp.floor(d[1])
                         == jnp.asarray(oy, fdt))
            sel = sel & (jnp.floor(d[2])
                         == jnp.asarray(oz, fdt))
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
                d = [drefs[slot][k, a, 0] for a in range(3)]
                val = vrefs[slot][k, 0]
                base = k * len(offsets) + (ox + 1) * 9
                if fori:
                    # (oy, oz) as a lax.fori_loop with dynamic
                    # rotates: 9x less live plane state than the
                    # unroll (see _use_fori)
                    def body(i, carry, d=d, val=val, ox=ox,
                             base=base):
                        oy = i // 3 - 1
                        oz = i % 3 - 1
                        code = (jnp.asarray(base, jnp.float32)
                                + i.astype(jnp.float32))
                        return image(carry, d, val, ox, oy, oz,
                                     code, _shift2_dyn)
                    # pytree carries: flatten the nested lists
                    flat, tree = jax.tree_util.tree_flatten(carry)
                    def fbody(i, flat, body=body, tree=tree):
                        c = jax.tree_util.tree_unflatten(tree, flat)
                        c = body(i, c)
                        return jax.tree_util.tree_leaves(c)
                    flat = jax.lax.fori_loop(0, 9, fbody, flat)
                    carry = jax.tree_util.tree_unflatten(tree, flat)
                else:
                    for oi9, (oy, oz) in enumerate(
                            itertools.product((-1, 0, 1),
                                              repeat=2)):
                        code = np.float32(base + oi9)
                        carry = image(carry, d, val, ox, oy, oz,
                                      code, _shift2)

        running, over, nv, rt, nd = carry
        for j in range(Kout):
            ov_ref[j, 0] = nv[j]
            ort_ref[j, 0] = rt[j]
            for a in range(3):
                od_ref[j, a, 0] = nd[j][a]
        iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) \
            + 128 * jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        oo_ref[0] = jnp.where(iota == 0, over, 0.0)
    return kernel


def _assign_split(dstack, vstack, K, Kout):
    """phase A over the interior planes (no-copy sliding windows on
    the original arrays) + the two wrap boundary planes."""
    _, _, N0, N1, N2 = dstack.shape
    dtype = dstack.dtype
    kern = _assign_kernel(K, Kout, N1, N2, dtype)

    def run(d_in, v_in, d_maps, out_map, grid_len):
        in_specs = (
            [pl.BlockSpec((K, 3, 1, N1, N2), m,
                          memory_space=pltpu.VMEM) for m in d_maps]
            + [pl.BlockSpec((K, 1, N1, N2),
                            (lambda mm: (lambda i: mm(i)[1:]))(m),
                            memory_space=pltpu.VMEM) for m in d_maps])
        out_specs = (
            pl.BlockSpec((Kout, 3, 1, N1, N2),
                         lambda i: (0, 0, out_map(i), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kout, 1, N1, N2),
                         lambda i: (0, out_map(i), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kout, 1, N1, N2),
                         lambda i: (0, out_map(i), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (out_map(i), 0, 0),
                         memory_space=pltpu.VMEM))
        out_shape = (
            jax.ShapeDtypeStruct((Kout, 3, N0, N1, N2), dtype),
            jax.ShapeDtypeStruct((Kout, N0, N1, N2), dtype),
            jax.ShapeDtypeStruct((Kout, N0, N1, N2), jnp.float32),
            jax.ShapeDtypeStruct((N0, 8, 128), jnp.float32))
        return pl.pallas_call(
            kern, grid=(grid_len,),
            in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=_params(), interpret=_interpret(),
        )(d_in, d_in, d_in, v_in, v_in, v_in)

    if N0 < 4:
        # tiny meshes: plain wrap-extended copy (memory is moot)
        dext = jnp.concatenate([dstack[:, :, -1:], dstack,
                                dstack[:, :, :1]], axis=2)
        vext = jnp.concatenate([vstack[:, -1:], vstack,
                                vstack[:, :1]], axis=1)
        maps = [(lambda o: (lambda i, o=o: (0, 0, i + o, 0, 0)))(o)
                for o in range(3)]
        od, ov, rt, oo = run(dext, vext, maps, lambda i: i, N0)
        return od, ov, rt, oo

    # interior: output plane i+1 reads input planes i, i+1, i+2
    maps = [(lambda o: (lambda i, o=o: (0, 0, i + o, 0, 0)))(o)
            for o in range(3)]
    od, ov, rt, oo = run(dstack, vstack, maps, lambda i: i + 1,
                         N0 - 2)
    # boundary planes 0 and N0-1 from a 4-plane wrap window:
    # ext = [N0-2, N0-1, 0, 1]; output t=0 -> plane 0 (sources ext
    # 1,2,3), t=1 -> plane N0-1 (sources ext 0,1,2)
    dbe = _boundary_ext(dstack, 2)
    vbe = _boundary_ext(vstack, 1)
    bmaps = [(lambda o: (lambda t, o=o: (0, 0, o + 1 - t, 0, 0)))(o)
             for o in range(3)]
    kern_b = _assign_kernel(K, Kout, N1, N2, dtype)
    bspecs = (
        [pl.BlockSpec((K, 3, 1, N1, N2), m,
                      memory_space=pltpu.VMEM) for m in bmaps]
        + [pl.BlockSpec((K, 1, N1, N2),
                        (lambda mm: (lambda t: mm(t)[1:]))(m),
                        memory_space=pltpu.VMEM) for m in bmaps])
    bout_specs = (
        pl.BlockSpec((Kout, 3, 1, N1, N2), lambda t: (0, 0, t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Kout, 1, N1, N2), lambda t: (0, t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Kout, 1, N1, N2), lambda t: (0, t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM))
    bshape = (
        jax.ShapeDtypeStruct((Kout, 3, 2, N1, N2), dtype),
        jax.ShapeDtypeStruct((Kout, 2, N1, N2), dtype),
        jax.ShapeDtypeStruct((Kout, 2, N1, N2), jnp.float32),
        jax.ShapeDtypeStruct((2, 8, 128), jnp.float32))
    bd, bv, brt, boo = pl.pallas_call(
        kern_b, grid=(2,),
        in_specs=bspecs, out_specs=bout_specs, out_shape=bshape,
        compiler_params=_params(), interpret=_interpret(),
    )(dbe, dbe, dbe, vbe, vbe, vbe)
    od = od.at[:, :, 0].set(bd[:, :, 0]).at[:, :, N0 - 1].set(
        bd[:, :, 1])
    ov = ov.at[:, 0].set(bv[:, 0]).at[:, N0 - 1].set(bv[:, 1])
    rt = rt.at[:, 0].set(brt[:, 0]).at[:, N0 - 1].set(brt[:, 1])
    oo = oo.at[0].set(boo[0]).at[N0 - 1].set(boo[1])
    return od, ov, rt, oo


def _apply_kernel(K, Kout, nextra, N1, N2, dtype):
    offsets = list(itertools.product((-1, 0, 1), repeat=3))
    fori = _use_fori(N1, N2)

    def kernel(*refs):
        erefs = refs[0:3]          # (nextra*K, 3, 1, N1, N2) windows
        rref = refs[3]             # (Kout, 1, N1, N2) at the target
        oe_ref = refs[4]

        ne = [[[jnp.zeros((N1, N2), dtype) for _ in range(3)]
               for _ in range(Kout)] for _ in range(nextra)]

        def image(ne, eplanes, oy, oz, code, shift):
            ne = [[list(row) for row in blk] for blk in ne]
            moved = [[shift(eplanes[e][a], -oy, -oz)
                      for a in range(3)] for e in range(nextra)]
            for j in range(Kout):
                put = rref[j, 0] == code
                for e in range(nextra):
                    for a in range(3):
                        ne[e][j][a] = jnp.where(
                            put, moved[e][a], ne[e][j][a])
            return ne

        for k in range(K):
            for ox in (-1, 0, 1):
                slot = 1 - ox
                eplanes = [[erefs[slot][e * K + k, a, 0]
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
                            itertools.product((-1, 0, 1),
                                              repeat=2)):
                        ne = image(ne, eplanes,
                                   oy, oz,
                                   np.float32(base + oi9), _shift2)
        for e in range(nextra):
            for j in range(Kout):
                for a in range(3):
                    oe_ref[e * Kout + j, a, 0] = ne[e][j][a]
    return kernel


def _apply_split(route, estacks, K, Kout, nextra):
    """phase B: move extras by replaying the route codes."""
    _, _, N0, N1, N2 = estacks.shape[-5:]
    dtype = estacks.dtype
    eflat = estacks.reshape((nextra * K, 3, N0, N1, N2))
    kern = _apply_kernel(K, Kout, nextra, N1, N2, dtype)

    def especs(maps):
        return [pl.BlockSpec((nextra * K, 3, 1, N1, N2), m,
                             memory_space=pltpu.VMEM) for m in maps]

    def rspec(rmap):
        return pl.BlockSpec((Kout, 1, N1, N2),
                            lambda i: (0, rmap(i), 0, 0),
                            memory_space=pltpu.VMEM)

    def ospec(omap):
        return pl.BlockSpec((nextra * Kout, 3, 1, N1, N2),
                            lambda i: (0, 0, omap(i), 0, 0),
                            memory_space=pltpu.VMEM)

    oshape = jax.ShapeDtypeStruct((nextra * Kout, 3, N0, N1, N2),
                                  dtype)
    if N0 < 4:
        eext = jnp.concatenate([eflat[:, :, -1:], eflat,
                                eflat[:, :, :1]], axis=2)
        maps = [(lambda o: (lambda i, o=o: (0, 0, i + o, 0, 0)))(o)
                for o in range(3)]
        oe = pl.pallas_call(
            kern, grid=(N0,),
            in_specs=especs(maps) + [rspec(lambda i: i)],
            out_specs=ospec(lambda i: i), out_shape=oshape,
            compiler_params=_params(), interpret=_interpret(),
        )(eext, eext, eext, route)
        return oe.reshape((nextra, Kout, 3, N0, N1, N2))

    maps = [(lambda o: (lambda i, o=o: (0, 0, i + o, 0, 0)))(o)
            for o in range(3)]
    oe = pl.pallas_call(
        kern, grid=(N0 - 2,),
        in_specs=especs(maps) + [rspec(lambda i: i + 1)],
        out_specs=ospec(lambda i: i + 1), out_shape=oshape,
        compiler_params=_params(), interpret=_interpret(),
    )(eflat, eflat, eflat, route)
    ebe = _boundary_ext(eflat, 2)
    bmaps = [(lambda o: (lambda t, o=o: (0, 0, o + 1 - t, 0, 0)))(o)
             for o in range(3)]
    rbe = _boundary_ext(route, 1)
    kern_b = _apply_kernel(K, Kout, nextra, N1, N2, dtype)
    boe = pl.pallas_call(
        kern_b, grid=(2,),
        in_specs=especs(bmaps)
        + [pl.BlockSpec((Kout, 1, N1, N2),
                        lambda t: (0, 2 - t, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nextra * Kout, 3, 1, N1, N2),
                               lambda t: (0, 0, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (nextra * Kout, 3, 2, N1, N2), dtype),
        compiler_params=_params(), interpret=_interpret(),
    )(ebe, ebe, ebe, rbe)
    oe = oe.at[:, :, 0].set(boe[:, :, 0]).at[:, :, N0 - 1].set(
        boe[:, :, 1])
    return oe.reshape((nextra, Kout, 3, N0, N1, N2))


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
