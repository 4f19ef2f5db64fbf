"""Mesh-halo exchange for slab-sharded fields.

The lattice fast path (ops/gridpm.py) expresses its x-axis window
through *extended* arrays: ext[i + dx] = global plane (local row i)
+ off + dx.  On one device the extension is a wrap-roll; on a device
mesh the extra planes live on ring neighbors.  :func:`extend_x`
fetches them with ``lax.ppermute`` — fixed-size plane blocks over
ICI, the static-shape analog of the reference's ghost traffic for
mesh data (the reference never needs this because pfft re-decomposes
instead; a slab halo is the TPU-native replacement for re-decomposing
around a stencil).

Must be called inside ``shard_map`` over the mesh axis.
"""
import jax.numpy as jnp
from jax import lax

__all__ = ["extend_x", "halo_planes"]


def halo_planes(local, lo, hi, axis, D):
    """The halo planes alone, WITHOUT concatenating them onto the
    local slab: returns (lo_arr, hi_arr) of (lo, ...) / (hi, ...)
    rows fetched from ring neighbors, where lo_arr[j] holds global
    plane (my_start - lo + j) and hi_arr[j] holds (my_start + rows
    + j).  Sends only the sliced planes over ICI (extend_x ships the
    whole slab per hop) and leaves the local slab untouched so the
    no-copy sliding-window kernels can read it in place.

    Halos deeper than one slab are unsupported here (use extend_x).
    Must be called inside shard_map over the mesh axis.
    """
    rows = local.shape[0]
    if lo > rows or hi > rows:
        raise ValueError("halo_planes supports halos up to one slab "
                         "(lo=%d hi=%d rows=%d)" % (lo, hi, rows))
    empty = jnp.zeros((0,) + local.shape[1:], local.dtype)
    if D == 1:
        lo_arr = local[rows - lo:] if lo > 0 else empty
        hi_arr = local[:hi] if hi > 0 else empty
        return lo_arr, hi_arr
    lo_arr = empty
    hi_arr = empty
    if lo > 0:
        # my tail planes go to my +1 neighbor's lo halo
        lo_arr = lax.ppermute(local[rows - lo:], axis,
                              [(j, (j + 1) % D) for j in range(D)])
    if hi > 0:
        hi_arr = lax.ppermute(local[:hi], axis,
                              [(j, (j - 1) % D) for j in range(D)])
    return lo_arr, hi_arr


def extend_x(local, lo, hi, axis, D):
    """Extend a local (rows, ...) slab with ``lo`` halo planes below
    and ``hi`` above, fetched from ring neighbors.

    Returns a (lo + rows + hi, ...) array where row j holds global
    plane (my_start - lo + j); periodic wrap is implied by the ring.
    Any halo depth is supported (multi-hop ppermutes when the halo
    exceeds one slab).
    """
    rows = local.shape[0]
    if lo == 0 and hi == 0:
        return local
    if D == 1:
        # single-shard mesh: the ring is the wrap itself
        parts = []
        if lo > 0:
            reps = -(-lo // rows)
            head = jnp.concatenate([local] * reps, 0)
            parts.append(head[head.shape[0] - lo:])
        parts.append(local)
        if hi > 0:
            reps = -(-hi // rows)
            tail = jnp.concatenate([local] * reps, 0)
            parts.append(tail[:hi])
        return jnp.concatenate(parts, 0)

    left = []
    need = lo
    m = 1
    while need > 0:
        take = min(rows, need)
        # slab b-m arrives at b
        recv = lax.ppermute(local, axis,
                            [(j, (j + m) % D) for j in range(D)])
        left.append(recv[rows - take:])
        need -= take
        m += 1
    left.reverse()

    right = []
    need = hi
    m = 1
    while need > 0:
        take = min(rows, need)
        # slab b+m arrives at b
        recv = lax.ppermute(local, axis,
                            [(j, (j - m) % D) for j in range(D)])
        right.append(recv[:take])
        need -= take
        m += 1

    return jnp.concatenate(left + [local] + right, 0)
