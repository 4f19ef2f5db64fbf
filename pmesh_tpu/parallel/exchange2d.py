"""Particle ghost exchange on 2-d (npx, npy) pencil process grids.

The reference decomposes particles over ANY N-d domain grid mapped to
the pfft pencil layout (reference pmesh/domain.py:561-652
``GridND.decompose``; pmesh/pm.py:1444-1461 ``DomainAssign`` built
from the pencil ranks).  :mod:`pmesh_tpu.parallel.exchange` covers the
1-d slab axis; this module is the 2-d pencil generalization — the
device mesh is an (npx, npy) torus, each block (bx, by) owns the
(rows0, rows1, ...) pencil ``[bx*rows0:(bx+1)*rows0,
by*rows1:(by+1)*rows1]`` of the mesh, and ghost channels are the
Moore-neighborhood offsets ``(ox, oy) != (0, 0)`` the window ball can
reach, shipped with ``lax.ppermute`` over BOTH mesh axes at once.

Differences from the 1-d module (all deliberate):

- **Exact membership masks.**  Per axis the smoothing ball maps to a
  ring interval [dlo, dhi] of slab offsets; a channel (ox, oy) ships a
  particle iff ox and oy are both inside their axis intervals.  (The
  1-d module's one-sided masks over-ship when a particle drifts past
  a neighbor slab; with up to (2k+1)^2-1 channels the corner traffic
  must be exact.)
- **Per-channel capacities.**  Face channels carry O(s/rows) of the
  block, corners O(s^2/(rows0*rows1)) — two orders less.  Each
  channel gets its own static capacity (``capacity='auto'`` measures
  them), so the exchanged arrays don't pay the face capacity 8-24x.
- **Small rings ship ring-unique offsets.**  On an npy=2 ring the
  offsets +1 and -1 are the same device; channels enumerate the
  centered residues ``[-min(k, np//2), min(k, (np-1)//2)]``, so every
  reachable block appears exactly once and tiny grids need no minimum
  ring radius (the reference likewise supports any np,
  domain.py:561-652).

Shared contracts with the 1-d module: capacity-padded static shapes,
NaN-poison on overflow / residency breach (never silent), the local
image is channel 0 and never moves, gather reduces ghost images back
with the reference's sum/mean/any/all/local/ufunc modes
(domain.py:208-318).
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from .exchange import _diff_scale, _check_hsml, _SHARDED_FN_CACHE

__all__ = ["ShardedLayout2D", "decompose2d", "reshard2d",
           "measure_ghosts2d", "measure_load2d", "paint_sharded2d",
           "readout_sharded2d", "home_block2d"]


def _axis_offsets(k, np_ax):
    """Ring-unique centered offsets within reach k on an np_ax ring."""
    lo = -min(int(k), np_ax // 2)
    hi = min(int(k), (np_ax - 1) // 2)
    return tuple(range(lo, hi + 1))


def _channels2d(kx, ky, npx, npy):
    """Moore-neighborhood ghost channels (ox, oy) != (0, 0)."""
    return tuple((ox, oy)
                 for ox in _axis_offsets(kx, npx)
                 for oy in _axis_offsets(ky, npy)
                 if not (ox == 0 and oy == 0))


def _ball_interval(g, s, b, N, rows, np_ax):
    """Ring-signed slab-offset interval [dlo, dhi] the smoothing ball
    [g-s, g+s] covers around home slab ``b`` (same construction as
    exchange._ball_channels; divisible meshes only, rows*np_ax==N)."""
    gm = jnp.mod(g, N)
    slo = jnp.floor(jnp.mod(gm - s, N) / rows).astype(jnp.int32)
    shi = jnp.floor(jnp.mod(gm + s, N) / rows).astype(jnp.int32)
    half = np_ax // 2
    dlo = jnp.mod(slo - b + half, np_ax) - half
    dhi = jnp.mod(shi - b + half, np_ax) - half
    return dlo, dhi


def _member(m, dlo, dhi):
    """Is offset m inside the ring interval [dlo, dhi]?  dlo > dhi
    means the interval wraps (covers everything outside (dhi, dlo))."""
    return jnp.where(dlo <= dhi,
                     (m >= dlo) & (m <= dhi),
                     (m >= dlo) | (m <= dhi))


def _axis_bad(dlo, dhi, offs, np_ax):
    """Ball touches a slab no channel covers -> residency breach."""
    if len(offs) == np_ax:      # offsets cover the whole ring
        return jnp.zeros(dlo.shape, bool)
    lo_k, hi_k = offs[0], offs[-1]
    return jnp.where(dlo <= dhi,
                     (dlo < lo_k) | (dhi > hi_k),
                     jnp.ones(dlo.shape, bool))


def _sentinel_ax(np_ax, rows):
    """Pad-particle coordinate: the center of the LAST slab (the last
    flat block's home ground on both axes)."""
    return (np_ax - 1 + 0.5) * rows


def home_block2d(g0, g1, N0, N1, npx, npy):
    """Flat home block (bx*npy + by) of grid coordinates (g0, g1)."""
    rows0, rows1 = N0 // npx, N1 // npy
    hx = (jnp.floor(jnp.mod(g0, N0)) // rows0).astype(jnp.int32) % npx
    hy = (jnp.floor(jnp.mod(g1, N1)) // rows1).astype(jnp.int32) % npy
    return hx * npy + hy


def _default_ksides(smoothing, rows0, rows1):
    """Window reach in slabs per axis plus ONE slab of headroom: the
    equal-count quantile reshard can leave an edge particle one FLAT
    block from home, which on the (bx, by) torus is at most one step
    on each axis (flat -1 from (bx, 0) is (bx-1, npy-1) == torus
    offset (-1, -1))."""
    kx = int(np.ceil(float(smoothing) / rows0)) + 1
    ky = int(np.ceil(float(smoothing) / rows1)) + 1
    return max(1, kx), max(1, ky)


@jax.tree_util.register_pytree_node_class
class ShardedLayout2D(object):
    """Capacity-padded ghost routing plan over an (npx, npy) torus.

    Pytree: the per-channel plan arrays are children, the geometry is
    aux data — a ShardedLayout2D flows through jit/scan/grad exactly
    like the 1-d :class:`~pmesh_tpu.parallel.exchange.ShardedLayout`.

    Attributes
    ----------
    send_idx : tuple of (D, cap_c) int32
        per channel, per device block, local indices of the particles
        to ship (-1 = empty slot).  D = npx*npy flat blocks in
        (bx major, by minor) order — the order jax linearizes the
        ('x', 'y') mesh axes.
    recv_valid : tuple of (D, cap_c) bool
    badness : () float32 — 0.0, or NaN on overflow/residency breach.
    """

    def __init__(self, procmesh, send_idx, recv_valid, badness,
                 npart, N0, N1, offsets, caps, smoothing,
                 npart_pad=None):
        self.procmesh = procmesh
        self.send_idx = tuple(send_idx)
        self.recv_valid = tuple(recv_valid)
        self.badness = badness
        self.npart = int(npart)
        self.npart_pad = int(npart_pad if npart_pad is not None
                             else npart)
        self.N0 = int(N0)
        self.N1 = int(N1)
        self.npx, self.npy = procmesh.grid
        self.rows0 = self.N0 // self.npx
        self.rows1 = self.N1 // self.npy
        self.offsets = tuple(tuple(o) for o in offsets)
        self.caps = tuple(int(c) for c in caps)
        self.smoothing = smoothing
        self.D = procmesh.size
        self.nl = self.npart_pad // self.D
        self.sendlength = self.npart
        self.recvlength = self.D * self.slots_per_block

    @property
    def slots_per_block(self):
        return self.nl + sum(self.caps)

    # --- pytree ---
    def tree_flatten(self):
        children = (self.send_idx, self.recv_valid, self.badness)
        aux = (self.procmesh, self.npart, self.N0, self.N1,
               self.offsets, self.caps, self.smoothing,
               self.npart_pad)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        (procmesh, npart, N0, N1, offsets, caps, smoothing,
         npart_pad) = aux
        return cls(procmesh, children[0], children[1], children[2],
                   npart, N0, N1, offsets, caps, smoothing,
                   npart_pad=npart_pad)

    # --- helpers ---
    @property
    def _axes(self):
        return self.procmesh.axes          # ('x', 'y')

    def _pspec(self, extra_dims):
        return P(self._axes, *((None,) * extra_dims))

    def _plan_specs(self):
        return (P(self._axes, None),) * len(self.offsets)

    def _poison(self, x):
        if jnp.issubdtype(x.dtype, jnp.floating) or \
           jnp.issubdtype(x.dtype, jnp.complexfloating):
            return x + self.badness.astype(x.real.dtype)
        return x

    def _geom_key(self):
        """Static geometry of the compiled programs (the plan arrays
        are operands, so same-geometry layouts share executables)."""
        return (self.procmesh, self.npart_pad, self.N0, self.N1,
                self.offsets, self.caps)

    def _perm(self, ox, oy):
        """Flat ppermute pairs shipping (ox, oy) on the torus."""
        npx, npy = self.npx, self.npy
        out = []
        for j in range(self.D):
            jx, jy = divmod(j, npy)
            out.append((j, ((jx + ox) % npx) * npy + (jy + oy) % npy))
        return out

    # --- exchange -----------------------------------------------------
    def exchange(self, *args, pack=True, fill=0):
        """Ship ghost copies to every intersecting pencil block.  Each
        (npart, ...) argument returns as (D*slots_per_block, ...)."""
        if len(args) == 0:
            return None
        r = tuple(self._poison(self._exchange_one(
            jnp.asarray(a), fill, grid_axis=None)) for a in args)
        return r[0] if len(args) == 1 else r

    def exchange_scalar(self, value):
        """reference pm.py:1146-1157: scalars skip the exchange."""
        return value

    def exchange_grid(self, axis, g, fill=0.0):
        """Exchange the grid coordinate of decomposed ``axis`` (0 or
        1), re-centered per sender block and shifted into each
        receiver's unwrapped frame (what the local paint consumes)."""
        return self._poison(self._exchange_one(
            jnp.asarray(g), fill, grid_axis=int(axis)))

    def _exchange_one(self, a, fill, grid_axis):
        if a.shape[0] != self.npart:
            raise ValueError("exchange expects leading axis %d, got %s"
                             % (self.npart, a.shape))
        if self.npart_pad > self.npart:
            pad = jnp.zeros((self.npart_pad - self.npart,)
                            + a.shape[1:], a.dtype)
            a = jnp.concatenate([a, pad], axis=0)
        axes = self._axes
        npx, npy = self.npx, self.npy
        offsets = self.offsets
        C = len(offsets)
        N = (self.N0, self.N1)[grid_axis] if grid_axis is not None \
            else None
        rows = (self.rows0, self.rows1)[grid_axis] \
            if grid_axis is not None else None
        np_ax = (npx, npy)[grid_axis] if grid_axis is not None else None

        def local(a, *plan):
            idxs, valids = plan[:C], plan[C:]
            bx = lax.axis_index(axes[0])
            by = lax.axis_index(axes[1])

            def recenter(g):
                # unwrap a physical coordinate into THIS receiver's
                # frame, around its own pencil center.  Exact for any
                # legitimately-reachable ghost: the plan's reach is
                # <= (np_ax//2)*rows <= N/2 cells from the center, so
                # the nearest periodic image is the right one.  (A
                # per-channel +-N adjustment — the 1-d module's rule —
                # breaks when a ring offset is CONFLATED, e.g. +1 and
                # -1 on an npy=2 ring: the physical wrap direction
                # then depends on the coordinate, not the channel.)
                b = (bx, by)[grid_axis]
                center = (b.astype(g.dtype) + 0.5) * rows
                gm = jnp.mod(g, N)
                return gm - N * jnp.round((gm - center) / N)

            if grid_axis is not None:
                a = recenter(a)
            parts = [a]
            fillv = jnp.asarray(fill, dtype=a.dtype)
            for c, (ox, oy) in enumerate(offsets):
                i = idxs[c][0]
                ok = i >= 0
                buf = jnp.take(a, jnp.clip(i, 0), axis=0)
                okb = ok.reshape(ok.shape + (1,) * (a.ndim - 1))
                buf = jnp.where(okb, buf, fillv)
                recv = lax.ppermute(buf, axes, self._perm(ox, oy))
                rv = valids[c][0].reshape(ok.shape
                                          + (1,) * (a.ndim - 1))
                recv = jnp.where(rv, recv, fillv)
                if grid_axis is not None:
                    recv = jnp.where(rv, recenter(recv), recv)
                parts.append(recv)
            return jnp.concatenate(parts, axis=0)

        extra = a.ndim - 1
        key = ('exch2d', self._geom_key(), grid_axis, float(fill),
               extra)
        if key not in _SHARDED_FN_CACHE:
            _SHARDED_FN_CACHE[key] = jax.jit(shard_map(
                local, mesh=self.procmesh.mesh,
                in_specs=(self._pspec(extra),)
                + self._plan_specs() * 2,
                out_specs=self._pspec(extra)))
        return _SHARDED_FN_CACHE[key](a, *self.send_idx,
                                      *self.recv_valid)

    def ghost_mask(self):
        """(D*slots_per_block,) bool — True where a slot holds data."""
        nl = self.nl
        C = len(self.offsets)

        def local(*valids):
            ones = jnp.ones((nl,), dtype=bool)
            return jnp.concatenate(
                [ones] + [valids[c][0] for c in range(C)], axis=0)

        key = ('mask2d', self._geom_key())
        if key not in _SHARDED_FN_CACHE:
            _SHARDED_FN_CACHE[key] = jax.jit(shard_map(
                local, mesh=self.procmesh.mesh,
                in_specs=self._plan_specs(),
                out_specs=P(self._axes)))
        return _SHARDED_FN_CACHE[key](*self.recv_valid)

    # --- gather --------------------------------------------------------
    def gather(self, data, mode='sum', out=None):
        """Reduce ghost images back to their source particles
        (reference domain.py:208-318) — same modes as the 1-d layout:
        'sum' | 'mean' | 'any' | 'all' | 'local' | 'max' | 'min' |
        'prod' | a jnp-applicable binary ufunc."""
        data = jnp.asarray(data)
        ufuncs = {np.add: 'sum', np.maximum: 'max', np.fmax: 'max',
                  np.minimum: 'min', np.fmin: 'min',
                  np.multiply: 'prod'}
        combine = None
        if not isinstance(mode, str):
            try:
                mode = ufuncs[mode]
            except (KeyError, TypeError):
                if callable(mode):
                    combine = getattr(jnp, getattr(mode, '__name__',
                                                   ''), None) \
                        if isinstance(mode, np.ufunc) else mode
                if combine is None:
                    raise NotImplementedError(
                        "unsupported gather reduction %r on the "
                        "sharded path; pass a jnp-applicable binary "
                        "ufunc/callable, or use gather(..., 'all') "
                        "and reduce host-side" % (mode,))
                mode = 'ufunc'
        if mode == 'all':
            return data
        if data.shape[0] != self.recvlength:
            raise ValueError(
                "gather expects the exchange result length %d, got %s"
                % (self.recvlength, data.shape))
        nl = self.nl
        offsets = self.offsets
        caps = self.caps
        starts = np.concatenate([[0], np.cumsum(caps)])[:-1] + nl
        C = len(offsets)
        want_count = (mode == 'mean')

        def local(d, *plan):
            idxs = plan[:C]
            localpart = d[:nl]
            if mode == 'local':
                return localpart
            out = localpart
            cnt = jnp.ones((nl,), dtype=d.dtype) if want_count else None
            for c, (ox, oy) in enumerate(offsets):
                part = d[int(starts[c]): int(starts[c]) + caps[c]]
                # route the ghost results back to the source block
                back = lax.ppermute(part, self._axes,
                                    self._perm(-ox, -oy))
                i = idxs[c][0]
                ok = i >= 0
                okb = ok.reshape(ok.shape + (1,) * (d.ndim - 1))
                safe = jnp.clip(i, 0)
                if mode in ('sum', 'mean'):
                    contrib = jnp.where(okb, back, 0)
                    out = out.at[safe].add(contrib, mode='drop')
                    if want_count:
                        cnt = cnt.at[safe].add(
                            jnp.where(ok, 1, 0).astype(d.dtype),
                            mode='drop')
                elif mode == 'any':
                    upd = jnp.where(okb, back,
                                    jnp.take(out, safe, axis=0))
                    out = out.at[safe].set(upd, mode='drop')
                elif mode in ('max', 'min', 'prod'):
                    if mode == 'prod':
                        ident = jnp.asarray(1, d.dtype)
                    elif jnp.issubdtype(d.dtype, jnp.floating):
                        ident = jnp.asarray(
                            -jnp.inf if mode == 'max' else jnp.inf,
                            d.dtype)
                    else:
                        info = jnp.iinfo(d.dtype)
                        ident = jnp.asarray(
                            info.min if mode == 'max' else info.max,
                            d.dtype)
                    contrib = jnp.where(okb, back, ident)
                    at = out.at[safe]
                    op = {'max': at.max, 'min': at.min,
                          'prod': at.multiply}[mode]
                    out = op(contrib, mode='drop')
                elif mode == 'ufunc':
                    # unique indices within a channel: align with a
                    # scatter-SET, combine element-wise (see the 1-d
                    # gather for the contract)
                    tgt = jnp.where(ok, i, nl)
                    pad = (nl + 1,) + out.shape[1:]
                    aligned = jnp.zeros(pad, out.dtype).at[tgt].set(
                        back, mode='drop')[:nl]
                    filled = jnp.zeros((nl + 1,), bool).at[tgt].set(
                        True, mode='drop')[:nl]
                    fb = filled.reshape(
                        filled.shape + (1,) * (d.ndim - 1))
                    out = jnp.where(fb, combine(out, aligned), out)
                else:
                    raise NotImplementedError(mode)
            if want_count:
                cshape = (nl,) + (1,) * (d.ndim - 1)
                out = out / cnt.reshape(cshape)
            return out

        extra = data.ndim - 1
        key = ('gather2d', self._geom_key(), mode, combine, extra)
        if key not in _SHARDED_FN_CACHE:
            _SHARDED_FN_CACHE[key] = jax.jit(shard_map(
                local, mesh=self.procmesh.mesh,
                in_specs=(self._pspec(extra),)
                + self._plan_specs(),
                out_specs=self._pspec(extra)))
        out = _SHARDED_FN_CACHE[key](data, *self.send_idx)
        if self.npart_pad > self.npart:
            out = out[:self.npart]
        return self._poison(out)

    def get_exchange_cost(self):
        """Per-device count of ghosts shipped away (reference
        domain.py:125-136)."""
        return np.asarray(sum(jnp.sum(s >= 0, axis=1)
                              for s in self.send_idx))


def _pad_particles(gs, npart, D, sentinels):
    """Pad per-axis coordinate arrays to equal blocks with inert
    sentinels parked at the last block's pencil center."""
    npart_pad = -(-npart // D) * D
    if npart_pad == npart:
        return tuple(jnp.asarray(g) for g in gs), npart_pad
    out = []
    for g, sent in zip(gs, sentinels):
        g = jnp.asarray(g)
        pad = jnp.full((npart_pad - npart,), sent, g.dtype)
        out.append(jnp.concatenate([g, pad]))
    return tuple(out), npart_pad


def measure_ghosts2d(procmesh, g0, g1, N0, N1, npart, smoothing,
                     ksides=None):
    """One counting pass over concrete positions: per-channel max send
    count over devices + per-axis max slab reach.  Host-syncs; call
    outside jit (the measurement half of ``capacity='auto'``)."""
    import jax.core as _core
    if isinstance(g0, _core.Tracer) or isinstance(g1, _core.Tracer):
        raise ValueError(
            "measure_ghosts2d needs concrete positions (it host-syncs"
            " the counts); call it outside jit on the initial state "
            "and pass the resulting capacities into decompose")
    npx, npy = procmesh.grid
    rows0, rows1 = N0 // npx, N1 // npy
    if ksides is None:
        ksides = _default_ksides(smoothing, rows0, rows1)
    kx, ky = ksides
    offs_x = _axis_offsets(kx, npx)
    offs_y = _axis_offsets(ky, npy)
    chans = _channels2d(kx, ky, npx, npy)
    s = float(smoothing)
    axes = procmesh.axes
    (g0, g1), npart_pad = _pad_particles(
        (g0, g1), int(np.shape(g0)[0]), procmesh.size,
        (_sentinel_ax(npx, rows0), _sentinel_ax(npy, rows1)))

    def count(g0, g1):
        bx = lax.axis_index(axes[0])
        by = lax.axis_index(axes[1])
        dlo0, dhi0 = _ball_interval(g0, s, bx, N0, rows0, npx)
        dlo1, dhi1 = _ball_interval(g1, s, by, N1, rows1, npy)
        cnts = []
        for ox, oy in chans:
            mask = _member(ox, dlo0, dhi0) & _member(oy, dlo1, dhi1)
            cnts.append(jnp.sum(mask.astype(jnp.int32)))
        c = lax.pmax(jnp.stack(cnts), axes)
        rx = lax.pmax(jnp.maximum(jnp.max(-dlo0), jnp.max(dhi0)), axes)
        ry = lax.pmax(jnp.maximum(jnp.max(-dlo1), jnp.max(dhi1)), axes)
        return c[None], rx[None, None], ry[None, None]

    key = ('measg2d', procmesh, N0, N1, (kx, ky), s)
    if key not in _SHARDED_FN_CACHE:
        _SHARDED_FN_CACHE[key] = jax.jit(shard_map(
            count, mesh=procmesh.mesh,
            in_specs=(P(axes), P(axes)),
            out_specs=(P(axes, None), P(axes, None),
                       P(axes, None))))
    c, rx, ry = _SHARDED_FN_CACHE[key](g0, g1)
    return (np.asarray(c[0]), (int(np.asarray(rx)[0, 0]),
                               int(np.asarray(ry)[0, 0])))


def measure_load2d(procmesh, g0, g1, N0, N1, smoothing, ksides=None):
    """Per-device work accounting on a concrete state — the 2-d form
    of :func:`~pmesh_tpu.parallel.exchange.measure_load` (reference
    get_exchange_cost / load roles, domain.py:125-136, 409-499).
    Returns the same dict: residents / ghosts_sent / ghosts_recv /
    paint_work / imbalance.  Host-syncs; call outside jit."""
    npx, npy = procmesh.grid
    rows0, rows1 = N0 // npx, N1 // npy
    if ksides is None:
        ksides = _default_ksides(smoothing, rows0, rows1)
    kx, ky = ksides
    chans = _channels2d(kx, ky, npx, npy)
    s = float(smoothing)
    axes = procmesh.axes
    D = procmesh.size
    npart = int(np.shape(g0)[0])
    (g0, g1), npart_pad = _pad_particles(
        (g0, g1), npart, D,
        (_sentinel_ax(npx, rows0), _sentinel_ax(npy, rows1)))

    def count(g0, g1):
        bx = lax.axis_index(axes[0])
        by = lax.axis_index(axes[1])
        g0m = jnp.mod(g0, N0)
        g1m = jnp.mod(g1, N1)
        res = jnp.sum(((g0m >= bx * rows0) & (g0m < (bx + 1) * rows0)
                       & (g1m >= by * rows1)
                       & (g1m < (by + 1) * rows1)).astype(jnp.int32))
        dlo0, dhi0 = _ball_interval(g0, s, bx, N0, rows0, npx)
        dlo1, dhi1 = _ball_interval(g1, s, by, N1, rows1, npy)
        cnts = [jnp.sum((_member(ox, dlo0, dhi0)
                         & _member(oy, dlo1, dhi1)).astype(jnp.int32))
                for ox, oy in chans]
        return res[None], jnp.stack(cnts)[None]

    key = ('measl2d', procmesh, N0, N1, (kx, ky), s)
    if key not in _SHARDED_FN_CACHE:
        _SHARDED_FN_CACHE[key] = jax.jit(shard_map(
            count, mesh=procmesh.mesh,
            in_specs=(P(axes), P(axes)),
            out_specs=(P(axes), P(axes, None))))
    res, sent = _SHARDED_FN_CACHE[key](g0, g1)
    res = np.asarray(res)
    sent = np.asarray(sent)                    # (D, C)
    recv = np.zeros(D, np.int64)
    for c, (ox, oy) in enumerate(chans):
        for j in range(D):
            jx, jy = divmod(j, npy)
            recv[((jx + ox) % npx) * npy + (jy + oy) % npy] \
                += sent[j, c]
    # sentinels pad the LAST block's list and are homed in the last
    # pencil; deduct them where counted
    if npart_pad > npart:
        res[-1] -= (npart_pad - npart)
    nl = npart_pad // D
    work = np.full(D, nl, np.int64) + recv
    if npart_pad > npart:
        work[-1] -= (npart_pad - npart)
    return {
        "residents": res,
        "ghosts_sent": sent.sum(axis=1),
        "ghosts_recv": recv,
        "paint_work": work,
        "imbalance": float(work.max() / max(work.mean(), 1e-300)),
    }


def decompose2d(procmesh, g0, g1, N0, N1, npart, smoothing,
                ksides=None, capacity=None, slack=1.3):
    """Build a :class:`ShardedLayout2D` from the grid coordinates of
    the two decomposed axes (the gridnd_fill role on a 2-d domain
    grid, reference _domain.pyx:9-122 + domain.py:561-652).

    Parameters
    ----------
    smoothing : float — window reach in grid cells (support * 0.5).
    ksides : (kx, ky) — ghost reach in slabs per axis; defaults to
        the window reach plus one slab of headroom each.
    capacity : None | 'auto' | int | sequence
        ghost slots per channel.  None = the block size (never
        overflows); 'auto' measures the concrete positions and pads
        by ``slack`` per channel; an int applies to every channel; a
        sequence gives each channel its own capacity.
    """
    npx, npy = procmesh.grid
    if N0 % npx or N1 % npy:
        raise ValueError(
            "decompose2d needs Nmesh[0] %% npx == 0 and Nmesh[1] %% "
            "npy == 0; got Nmesh=(%d, %d) on a (%d, %d) grid"
            % (N0, N1, npx, npy))
    rows0, rows1 = N0 // npx, N1 // npy
    s = float(smoothing)
    if 2 * s >= min(N0, N1):
        raise ValueError("smoothing %g covers the whole box" % s)
    if ksides is None:
        ksides = _default_ksides(s, rows0, rows1)
    kx, ky = int(ksides[0]), int(ksides[1])
    if s > kx * rows0 or s > ky * rows1:
        raise ValueError(
            "smoothing %g exceeds the (kx=%d, ky=%d) ghost reach of "
            "(%d, %d) cells; increase ksides" % (s, kx, ky,
                                                 kx * rows0,
                                                 ky * rows1))
    offs_x = _axis_offsets(kx, npx)
    offs_y = _axis_offsets(ky, npy)
    chans = _channels2d(kx, ky, npx, npy)
    C = len(chans)
    D = procmesh.size
    npart = int(npart)
    (g0, g1), npart_pad = _pad_particles(
        (g0, g1), npart, D,
        (_sentinel_ax(npx, rows0), _sentinel_ax(npy, rows1)))
    nl = npart_pad // D

    if isinstance(capacity, str) and capacity == 'auto':
        counts, _ = measure_ghosts2d(procmesh, g0, g1, N0, N1,
                                     npart, s, ksides=(kx, ky))
        caps = tuple(max(8, int(np.ceil(float(c) * float(slack))))
                     for c in counts)
    elif capacity is None:
        caps = (nl,) * C
    elif np.ndim(capacity) == 0:
        caps = (int(capacity),) * C
    else:
        caps = tuple(int(c) for c in capacity)
        if len(caps) != C:
            raise ValueError("capacity sequence must have %d entries "
                             "(one per ghost channel), got %d"
                             % (C, len(caps)))
    caps = tuple(min(c, nl) for c in caps)
    axes = procmesh.axes

    def plan(g0, g1):
        bx = lax.axis_index(axes[0])
        by = lax.axis_index(axes[1])
        dlo0, dhi0 = _ball_interval(g0, s, bx, N0, rows0, npx)
        dlo1, dhi1 = _ball_interval(g1, s, by, N1, rows1, npy)
        bad = (_axis_bad(dlo0, dhi0, offs_x, npx)
               | _axis_bad(dlo1, dhi1, offs_y, npy))
        bad = jnp.sum(bad.astype(jnp.int32))
        arange = jnp.arange(nl, dtype=jnp.int32)
        bufs = []
        over = jnp.zeros((), jnp.int32)
        for c, (ox, oy) in enumerate(chans):
            mask = _member(ox, dlo0, dhi0) & _member(oy, dlo1, dhi1)
            cap = caps[c]
            rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
            slot = jnp.where(mask & (rank < cap), rank, cap)
            buf = jnp.full((cap + 1,), -1, jnp.int32)
            buf = buf.at[slot].set(arange, mode='drop')[:cap]
            over = over + jnp.maximum(
                jnp.sum(mask.astype(jnp.int32)) - cap, 0)
            bufs.append(buf[None])           # (1, cap_c)
        badness = lax.psum((bad + over).astype(jnp.float32), axes)
        return tuple(bufs) + (badness,)

    key = ('plan2d', procmesh, N0, N1, (kx, ky), caps, s, nl)
    if key not in _SHARDED_FN_CACHE:
        _SHARDED_FN_CACHE[key] = jax.jit(shard_map(
            plan, mesh=procmesh.mesh,
            in_specs=(P(axes), P(axes)),
            out_specs=tuple(P(axes, None) for _ in chans)
            + (P(),)))
    out = _SHARDED_FN_CACHE[key](g0, g1)
    send_idx, badcount = out[:C], out[C]
    badness = jnp.where(badcount > 0, jnp.nan, 0.0).astype(jnp.float32)

    # validity of received slots = the permuted validity of sent slots
    def valid_fn(*idxs):
        outs = []
        for c, (ox, oy) in enumerate(chans):
            ok = idxs[c][0] >= 0
            npx_, npy_ = npx, npy
            perm = []
            for j in range(D):
                jx, jy = divmod(j, npy_)
                perm.append((j, ((jx + ox) % npx_) * npy_
                             + (jy + oy) % npy_))
            outs.append(lax.ppermute(ok, axes, perm)[None])
        return tuple(outs)

    vkey = ('valid2d', procmesh, (kx, ky), caps)
    if vkey not in _SHARDED_FN_CACHE:
        _SHARDED_FN_CACHE[vkey] = jax.jit(shard_map(
            valid_fn, mesh=procmesh.mesh,
            in_specs=tuple(P(axes, None) for _ in chans),
            out_specs=tuple(P(axes, None) for _ in chans)))
    recv_valid = _SHARDED_FN_CACHE[vkey](*send_idx)

    return ShardedLayout2D(procmesh, send_idx, recv_valid, badness,
                           npart, N0, N1, chans, caps, s,
                           npart_pad=npart_pad)


def reshard2d(procmesh, g0, g1, N0, N1, *arrays):
    """Globally re-sort particle arrays into home-pencil order (the
    mpsort role, reference pm.py:389-448) so block (bx, by) holds the
    equal-count quantile around its pencil's population."""
    npx, npy = procmesh.grid
    home = home_block2d(g0, g1, N0, N1, npx, npy)
    order = jnp.argsort(home, stable=True)
    arrays = tuple(jnp.asarray(a) for a in arrays)
    out = tuple(jnp.take(a, order, axis=0) for a in arrays)
    from .exchange import _constrain_blocks
    axes = procmesh.axes
    out = tuple(_constrain_blocks(
        a, jax.sharding.NamedSharding(
            procmesh.mesh, P(axes, *([None] * (a.ndim - 1)))))
        for a in out)
    return out[0] if len(arrays) == 1 else out


# --- sharded paint / readout (2-d pencil) -------------------------------

def _grid_coords2d(layout, pos, scale, translate=None):
    """Exchange simulation-unit positions as per-axis grid-coordinate
    ghost arrays; axes 0 and 1 arrive in each receiver's unwrapped
    pencil frame."""
    pos = jnp.asarray(pos)
    ndim = pos.shape[-1]
    if translate is None:
        translate = (0.0,) * ndim
    egs = []
    for d in range(ndim):
        gd = pos[:, d] * jnp.asarray(scale[d], pos.dtype) \
            + jnp.asarray(translate[d], pos.dtype)
        if d < 2:
            egs.append(layout.exchange_grid(d, gd))
        else:
            egs.append(layout.exchange(gd))
    return egs


def paint_sharded2d(layout, pos, mass, shape, scale, window,
                    diffdir=None, dtype=None, base=None, hsml=None,
                    hsml_max=None, translate=None):
    """Paint a device-sharded particle set onto the pencil-sharded
    mesh (same contract as exchange.paint_sharded, 2-d grid)."""
    from ..ops import paint as _paint_ops
    pos = jnp.asarray(pos)
    ndim = pos.shape[-1]
    shape = tuple(int(n) for n in shape)
    if shape[0] != layout.N0 or shape[1] != layout.N1:
        raise ValueError("mesh shape %s does not match the layout's "
                         "(N0, N1)=(%d, %d)"
                         % (shape, layout.N0, layout.N1))
    if dtype is None:
        dtype = pos.dtype
    egs = _grid_coords2d(layout, pos, scale, translate)
    m = jnp.broadcast_to(jnp.asarray(mass, dtype=dtype),
                         (pos.shape[0],))
    em = layout.exchange(m, fill=0)
    eh, hbad = _check_hsml(layout, window, hsml, hsml_max)

    axes = layout.procmesh.axes
    rows0, rows1 = layout.rows0, layout.rows1
    lshape = (rows0, rows1) + shape[2:]
    # both decomposed axes unwrapped/no-period (ghosts cover the
    # straddle), axes 2.. periodic as usual
    period = (0, 0) + shape[2:]
    nh = 0 if eh is None else 1

    key = ('paint2d', layout.procmesh, rows0, rows1, tuple(shape),
           str(window), diffdir, jnp.dtype(dtype).name, nh,
           None if hsml_max is None else float(hsml_max))
    if key not in _SHARDED_FN_CACHE:
        def local(em, *rest):
            egs = rest[:len(rest) - nh] if nh else rest
            bx = lax.axis_index(axes[0])
            by = lax.axis_index(axes[1])
            cols = [egs[0] - bx.astype(egs[0].dtype) * rows0,
                    egs[1] - by.astype(egs[1].dtype) * rows1]
            p = jnp.stack(cols + list(egs[2:]), axis=-1)
            zeros = jnp.zeros(lshape, dtype=dtype)
            return _paint_ops.paint(zeros, p, mass=em, window=window,
                                    scale=1.0, translate=0.0,
                                    period=period, diffdir=diffdir,
                                    hsml=rest[-1] if nh else None,
                                    hsml_max=hsml_max)

        pspec = P(axes)
        out_spec = P(axes[0], axes[1], *([None] * (ndim - 2)))
        fn = shard_map(local, mesh=layout.procmesh.mesh,
                       in_specs=(pspec,) * (1 + ndim + nh),
                       out_specs=out_spec)
        from jax.sharding import NamedSharding
        _SHARDED_FN_CACHE[key] = jax.jit(
            fn, out_shardings=NamedSharding(layout.procmesh.mesh,
                                            out_spec))
    operands = (em,) + tuple(egs) + ((eh,) if nh else ())
    out = _SHARDED_FN_CACHE[key](*operands)
    out = _diff_scale((out,), scale, diffdir)[0]
    out = out + layout.badness.astype(out.dtype)
    if hbad is not None:
        out = out + hbad.astype(out.dtype)
    if base is not None:
        out = out + base
    return out


def readout_sharded2d(layout, meshes, pos, scale, window,
                      diffdir=None, hsml=None, hsml_max=None,
                      translate=None):
    """Read pencil-sharded meshes at a device-sharded particle set
    (same contract as exchange.readout_sharded, 2-d grid)."""
    from ..ops import paint as _paint_ops
    multi = diffdir == 'all'
    single = not isinstance(meshes, (tuple, list)) and not multi
    meshes = (meshes,) if not isinstance(meshes, (tuple, list)) \
        else tuple(meshes)
    meshes = tuple(jnp.asarray(m) for m in meshes)
    pos = jnp.asarray(pos)
    ndim = pos.shape[-1]
    if multi and len(meshes) != 1:
        raise ValueError("diffdir='all' takes exactly one mesh")
    shape = meshes[0].shape
    if shape[0] != layout.N0 or shape[1] != layout.N1:
        raise ValueError("mesh shape %s does not match the layout's "
                         "(N0, N1)=(%d, %d)"
                         % (shape, layout.N0, layout.N1))
    egs = _grid_coords2d(layout, pos, scale, translate)
    eh, hbad = _check_hsml(layout, window, hsml, hsml_max)

    axes = layout.procmesh.axes
    rows0, rows1 = layout.rows0, layout.rows1
    period = (0, 0) + tuple(shape[2:])
    nmesh = len(meshes)
    nout = ndim if multi else nmesh
    nh = 0 if eh is None else 1

    key = ('readout2d', layout.procmesh, rows0, rows1, tuple(shape),
           str(window), diffdir, nmesh, nh,
           None if hsml_max is None else float(hsml_max))
    if key not in _SHARDED_FN_CACHE:
        def local(*args):
            lmeshes = args[:nmesh]
            egs = args[nmesh:len(args) - nh] if nh else args[nmesh:]
            bx = lax.axis_index(axes[0])
            by = lax.axis_index(axes[1])
            cols = [egs[0] - bx.astype(egs[0].dtype) * rows0,
                    egs[1] - by.astype(egs[1].dtype) * rows1]
            p = jnp.stack(cols + list(egs[2:]), axis=-1)
            if multi:
                vals = tuple(_paint_ops.readout(
                    lmeshes[0], p, window=window, scale=1.0,
                    translate=0.0, period=period, diffdir=d,
                    hsml=args[-1] if nh else None,
                    hsml_max=hsml_max) for d in range(ndim))
            else:
                vals = _paint_ops.readout(
                    lmeshes[0] if nmesh == 1 else tuple(lmeshes), p,
                    window=window, scale=1.0, translate=0.0,
                    period=period, diffdir=diffdir,
                    hsml=args[-1] if nh else None,
                    hsml_max=hsml_max)
            if not isinstance(vals, tuple):
                return (vals,)
            return tuple(vals)

        mesh_spec = P(axes[0], axes[1], *([None] * (ndim - 2)))
        pspec = P(axes)
        _SHARDED_FN_CACHE[key] = jax.jit(shard_map(
            local, mesh=layout.procmesh.mesh,
            in_specs=(mesh_spec,) * nmesh + (pspec,) * (ndim + nh),
            out_specs=(pspec,) * nout))
    operands = meshes + tuple(egs) + ((eh,) if nh else ())
    partials = _SHARDED_FN_CACHE[key](*operands)
    # ONE fused gather for multi-output (stack on a trailing axis so
    # the ppermute routing runs once over all outputs)
    if nout > 1:
        stacked = jnp.stack(partials, axis=-1)
        g = layout.gather(stacked, mode='sum')
        outs = tuple(g[..., i] for i in range(nout))
    else:
        outs = tuple(layout.gather(v, mode='sum') for v in partials)
    outs = _diff_scale(outs, scale, diffdir)
    if hbad is not None:
        outs = tuple(o + hbad.astype(o.dtype) for o in outs)
    return outs[0] if single else outs
