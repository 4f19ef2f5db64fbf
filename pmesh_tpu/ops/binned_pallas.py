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


@functools.partial(jax.jit, static_argnames=('K', 'Kout', 'nextra'))
def rebase_fused(dstack, vstack, estacks, K, Kout, nextra):
    """fused rebase of a binned state with drift offsets in [-1, 1].

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
    offsets = list(itertools.product((-1, 0, 1), repeat=3))

    # wrap-extended x windows: ext[i + (1 + ox)] = plane i + ox
    dext = _extend_rows(jnp.moveaxis(dstack, 2, 0), 1, 1)
    vext = _extend_rows(jnp.moveaxis(vstack, 1, 0), 1, 1)
    eext = (_extend_rows(jnp.moveaxis(
        estacks.reshape((nextra * K, 3) + (N0, N1, N2)), 2, 0), 1, 1)
        if nextra else None)

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

        for k in range(K):
            for off in offsets:
                ox, oy, oz = off
                # arrivals at plane p with x-offset ox come from
                # source plane p - ox; ext slot j holds plane p+j-1
                slot = 1 - ox
                d = [drefs[slot][0, k, a] for a in range(3)]
                val = vrefs[slot][0, k]
                sel = val > 0
                for a in range(3):
                    sel = sel & (jnp.floor(d[a]) == off[a])
                # rotate as f32: Mosaic's dynamic rotate rejects
                # sub-32-bit (bool) data
                arr = _shift2(jnp.where(sel, 1.0, 0.0).astype(
                    jnp.float32), -oy, -oz) > 0
                rank = running
                running = running + arr.astype(jnp.int32)
                over = over + jnp.sum(jnp.where(
                    arr & (rank >= Kout), 1.0, 0.0)).astype(
                        jnp.float32)
                moved_d = [_shift2(d[a] - off[a], -oy, -oz)
                           for a in range(3)]
                moved_e = [[_shift2(erefs[slot][0, e * K + k, a],
                                    -oy, -oz) for a in range(3)]
                           for e in range(nextra)]
                for j in range(Kout):
                    put = arr & (rank == j)
                    nv[j] = jnp.where(put, jnp.asarray(1, dtype),
                                      nv[j])
                    for a in range(3):
                        nd[j][a] = jnp.where(put, moved_d[a],
                                             nd[j][a])
                        for e in range(nextra):
                            ne[e][j][a] = jnp.where(
                                put, moved_e[e][a], ne[e][j][a])

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

    outs = pl.pallas_call(
        kernel,
        grid=(N0,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=_params(),
        interpret=_interpret(),
    )(*args)

    nd = jnp.moveaxis(outs[0], 0, 2)           # (Kout, 3, N0, N1, N2)
    nv = jnp.moveaxis(outs[1], 0, 1)           # (Kout, N0, N1, N2)
    overflow = jnp.sum(outs[2]).astype(jnp.int32)
    if nextra:
        ne = jnp.moveaxis(outs[3], 0, 2).reshape(
            (nextra, Kout, 3, N0, N1, N2))
    else:
        ne = jnp.zeros((0,), dtype)
    return nd, nv, ne, overflow
