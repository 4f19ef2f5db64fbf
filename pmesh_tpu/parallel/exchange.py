"""Device-sharded particle ghost exchange (the jittable Layout).

TPU-native replacement for the ragged packed-Alltoallv particle
exchange of the reference (pmesh/domain.py:138-318 Layout.exchange/
gather, pmesh/_domain.pyx:9-122 gridnd_fill).  MPI can ship ragged
buffers because counts are exchanged first; an XLA program cannot —
every shape is static.  So the plan here is **capacity-padded**:

- particle arrays are global jax Arrays sharded in equal blocks over
  the device-mesh axis (block b on device b);
- the mesh axis 0 is slab-decomposed over the same devices (rows =
  N0 // D per device, matching parallel/pmesh.ProcessMesh);
- *residency contract*: every particle in block b must be within
  ``kside`` slabs of slab b (its window reach included).  Fresh
  decompositions satisfy this by construction (see :func:`reshard`);
  particles may then drift up to ``kside*rows - smoothing`` cells
  between reshards.
- :func:`decompose` builds, per device, 2*kside fixed-capacity ghost
  channels (send to slab b±m); ghosts move with ``lax.ppermute`` over
  ICI inside ``shard_map``.  The local block itself is channel 0 —
  the particle's home image never moves.

Violations are never silent: capacity overflow or a residency breach
sets a NaN poison that is folded into every exchanged/gathered float
(the analog of the reference's hard MPI errors; a warning after wrong
numbers is not acceptable).

``exchange`` returns, per input array, a global ``(D*L, ...)`` array
(L = block + 2*kside*capacity slots; invalid slots hold ``fill``);
``gather`` reduces it back to the original ``(N, ...)`` ordering with
sum/mean/any/all/local modes (reference domain.py:208-318).

Everything in this module is pure jnp/lax, traces under jit, and
differentiates (exchange is a gather + ppermute; its transpose is the
scatter-add that gather('sum') performs — jax derives both).
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P

__all__ = ["ShardedLayout", "decompose", "reshard", "home_block",
           "measure_ghosts"]


def _channels(kside):
    """(m, side) per ghost channel; side -1 = send to b-m, +1 = b+m."""
    out = []
    for m in range(1, kside + 1):
        out.append((m, -1))
        out.append((m, +1))
    return out


def _slab_rows(N0, D):
    """Rows per slab: ceil(N0/D).  Even meshes give N0//D (the
    historical contract); uneven meshes get PADDED slabs — the last
    slab(s) carry dead rows [N0, rows*D) that paint discards and
    readout feeds zeros (the reference instead makes the pfft edges
    themselves uneven, pm.py:1319-1327; equal blocks are what TPU
    collectives shard, so the padding moves into the slabs)."""
    return -(-int(N0) // int(D))


def _ball_channels(g, s, b, N0, rows, D):
    """Ring-signed slab distances (dlo, dhi) of the smoothing ball
    [g-s, g+s] around home block ``b``, periodic with the PHYSICAL
    period N0 (not the padded rows*D).

    The even-mesh form floor((gc +- s)/rows) - b breaks on padded
    slabs: crossing the seam at N0 lands in slab 0 after fewer than
    D*rows cells.  Computing each endpoint's slab in wrapped physical
    coordinates and taking the symmetric ring distance handles both
    (and reduces to the old form when N0 == D*rows, since residency
    keeps |d| <= kside < D/2)."""
    gm = jnp.mod(g, N0)
    slo = jnp.floor(jnp.mod(gm - s, N0) / rows).astype(jnp.int32)
    shi = jnp.floor(jnp.mod(gm + s, N0) / rows).astype(jnp.int32)
    half = D // 2
    dlo = jnp.mod(slo - b + half, D) - half
    dhi = jnp.mod(shi - b + half, D) - half
    return dlo, dhi


def _sentinel_pos(N0, rows, D):
    """Inert-ish position for particle-count padding: the physical
    center of the slab holding cell N0-1 (the last block's home
    ground).  On even meshes this is the historical (D-0.5)*rows; on
    uneven meshes the last slab's physical extent can be thin, so the
    sentinel may ghost — it ships with zero mass and is counted by
    measure_ghosts under the same padding, so capacities stay
    consistent."""
    sb = (int(N0) - 1) // int(rows)
    lo = sb * rows
    hi = min((sb + 1) * rows, int(N0))
    return (lo + hi) / 2.0


@jax.tree_util.register_pytree_node_class
class ShardedLayout(object):
    """Capacity-padded ghost routing plan over a device mesh.

    Pytree: children are the traced plan arrays; the static geometry
    is aux data, so a ShardedLayout flows through jit/scan/grad.

    Attributes
    ----------
    send_idx : (D, C, cap) int32
        per device block, per ghost channel, local indices of the
        particles to ship (-1 = empty slot).
    recv_valid : (D, C, cap) bool
        validity of the received slots of each channel.
    badness : () float32
        0.0, or NaN if the plan overflowed capacity / broke the
        residency contract.  Folded into all exchanged floats.
    """

    def __init__(self, procmesh, send_idx, recv_valid, badness,
                 npart, N0, rows, kside, capacity, smoothing,
                 npart_pad=None):
        self.procmesh = procmesh
        self.send_idx = send_idx
        self.recv_valid = recv_valid
        self.badness = badness
        self.npart = int(npart)
        # non-divisible particle counts are padded internally with
        # inert sentinels (tail of the last block); gather slices the
        # padding back off
        self.npart_pad = int(npart_pad if npart_pad is not None
                             else npart)
        self.N0 = int(N0)
        self.rows = int(rows)
        self.kside = int(kside)
        self.capacity = int(capacity)
        self.smoothing = smoothing
        self.D = procmesh.size
        self.nl = self.npart_pad // self.D
        # reference-compatible introspection
        self.sendlength = self.npart
        self.recvlength = self.D * self.slots_per_block

    @property
    def slots_per_block(self):
        return self.nl + 2 * self.kside * self.capacity

    # --- pytree ---
    def tree_flatten(self):
        children = (self.send_idx, self.recv_valid, self.badness)
        aux = (self.procmesh, self.npart, self.N0, self.rows,
               self.kside, self.capacity, self.smoothing,
               self.npart_pad)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        (procmesh, npart, N0, rows, kside, capacity, smoothing,
         npart_pad) = aux
        return cls(procmesh, children[0], children[1], children[2],
                   npart, N0, rows, kside, capacity, smoothing,
                   npart_pad=npart_pad)

    # --- helpers ---
    def _specs(self, extra_dims):
        tail = (None,) * extra_dims
        ax = self.procmesh.axis
        return P(ax, *tail)

    def _poison(self, x):
        if jnp.issubdtype(x.dtype, jnp.floating) or \
           jnp.issubdtype(x.dtype, jnp.complexfloating):
            return x + self.badness.astype(x.real.dtype)
        return x

    def _shard_map(self, fn, in_specs, out_specs):
        return shard_map(fn, mesh=self.procmesh.mesh,
                         in_specs=in_specs, out_specs=out_specs)

    def _geom_key(self):
        """Static geometry of the compiled exchange/gather programs —
        plans with the same geometry share executables (the plan
        arrays are OPERANDS of the programs, never closed over)."""
        return (self.procmesh, self.D, self.nl, self.capacity,
                self.kside, self.N0, self.rows)

    # --- exchange -----------------------------------------------------
    def exchange(self, *args, pack=True, fill=0):
        """Ship ghost copies to every intersecting slab.

        Each argument of shape (npart, ...) returns as a
        (D*slots_per_block, ...) global array: per device, the local
        block followed by the received ghost channels (empty slots
        hold ``fill``).  Use :meth:`ghost_mask` for slot validity and
        :meth:`gather` to reduce back.
        """
        if len(args) == 0:
            return None
        r = tuple(self._poison(self._exchange_one(jnp.asarray(a), fill,
                                                  axis0_mode=None))
                  for a in args)
        if len(args) == 1:
            return r[0]
        return r

    def exchange_scalar(self, value):
        """reference pm.py:1146-1157: scalars skip the exchange."""
        return value

    def _exchange_one(self, a, fill, axis0_mode):
        """axis0_mode: None = raw payload; 'grid0' = the array is the
        axis-0 grid coordinate — re-center to the sender block and
        shift received ghosts into the receiver's unwrapped frame."""
        if a.shape[0] != self.npart:
            raise ValueError("exchange expects leading axis %d, got %s"
                             % (self.npart, a.shape))
        if self.npart_pad > self.npart:
            pad = jnp.zeros((self.npart_pad - self.npart,)
                            + a.shape[1:], a.dtype)
            a = jnp.concatenate([a, pad], axis=0)
        ax = self.procmesh.axis
        D = self.D
        nl = self.nl
        cap = self.capacity
        N0 = self.N0
        rows = self.rows
        chans = _channels(self.kside)

        def local(a, idx, valid):
            # a: (nl, ...); idx: (1, C, cap); valid: (1, C, cap)
            idx = idx[0]
            valid = valid[0]
            b = lax.axis_index(ax)
            if axis0_mode == 'grid0':
                g = jnp.mod(a, N0)
                center = (b.astype(a.dtype) + 0.5) * rows
                a = g - N0 * jnp.round((g - center) / N0)
            parts = [a]
            fillv = jnp.asarray(fill, dtype=a.dtype)
            for c, (m, side) in enumerate(chans):
                i = idx[c]
                ok = i >= 0
                buf = jnp.take(a, jnp.clip(i, 0), axis=0)
                okb = ok.reshape(ok.shape + (1,) * (a.ndim - 1))
                buf = jnp.where(okb, buf, fillv)
                # side -1: block j ships to j-m (receive from j+m)
                perm = [(j, (j + side * m) % D) for j in range(D)]
                recv = lax.ppermute(buf, ax, perm)
                rv = valid[c].reshape(ok.shape + (1,) * (a.ndim - 1))
                recv = jnp.where(rv, recv, fillv)
                if axis0_mode == 'grid0':
                    # ghost sent by block (b - side*m): when that
                    # index wraps past D the sender sits at the low
                    # end of the box and its coordinate must appear
                    # +N0 in this receiver's unwrapped frame (and
                    # -N0 for a wrap below 0)
                    src = b - side * m
                    wrap = jnp.where(src < 0, -1,
                                     jnp.where(src >= D, 1, 0))
                    recv = jnp.where(rv, recv + wrap * N0, recv)
                parts.append(recv)
            return jnp.concatenate(parts, axis=0)

        extra = a.ndim - 1
        # cache the compiled program by geometry: a fresh shard_map
        # closure per call would recompile on EVERY eager exchange
        # (measured: the dominant cost of the CPU-mesh test tier)
        key = ('exch1d', self._geom_key(), axis0_mode, float(fill),
               extra)
        if key not in _SHARDED_FN_CACHE:
            _SHARDED_FN_CACHE[key] = jax.jit(self._shard_map(
                local,
                in_specs=(self._specs(extra), P(ax, None, None),
                          P(ax, None, None)),
                out_specs=self._specs(extra)))
        return _SHARDED_FN_CACHE[key](a, self.send_idx,
                                      self.recv_valid)

    def exchange_grid0(self, g0, fill=0.0):
        """Exchange the axis-0 grid coordinate, re-centered per block
        and shifted into each receiver's unwrapped frame — what the
        sharded paint/readout consume (internal fast path)."""
        return self._poison(self._exchange_one(
            jnp.asarray(g0), fill, axis0_mode='grid0'))

    def ghost_mask(self):
        """(D*slots_per_block,) bool — True where a slot holds data."""
        ax = self.procmesh.axis
        nl = self.nl

        def local(valid):
            ones = jnp.ones((nl,), dtype=bool)
            return jnp.concatenate(
                [ones] + [valid[0, c] for c in
                          range(valid.shape[1])], axis=0)

        key = ('mask1d', self._geom_key())
        if key not in _SHARDED_FN_CACHE:
            _SHARDED_FN_CACHE[key] = jax.jit(self._shard_map(
                local, in_specs=(P(ax, None, None),),
                out_specs=P(ax)))
        return _SHARDED_FN_CACHE[key](self.recv_valid)

    # --- gather --------------------------------------------------------
    def gather(self, data, mode='sum', out=None):
        """Reduce ghost images back to their source particles
        (reference domain.py:208-318).

        data : (D*slots_per_block, ...) — the shape exchange returns.
        mode : 'sum' | 'mean' | 'any' | 'all' | 'local' | 'max' |
            'min' | 'prod', or the numpy ufuncs np.add / np.maximum /
            np.minimum / np.multiply / np.fmax / np.fmin (the
            reference accepts any ufunc, domain.py:296-303; the
            device path supports the reductions XLA scatters have —
            others reduce host-side after an 'all' gather).
        """
        data = jnp.asarray(data)
        ufuncs = {np.add: 'sum', np.maximum: 'max', np.fmax: 'max',
                  np.minimum: 'min', np.fmin: 'min',
                  np.multiply: 'prod'}
        combine = None
        if not isinstance(mode, str):
            try:
                mode = ufuncs[mode]
            except (KeyError, TypeError):
                # ANY binary ufunc/callable (reference
                # domain.py:296-303 accepts arbitrary ufuncs via
                # reduceat): within one ghost channel each particle
                # has at most ONE image, so the channel's returned
                # values align back to particles with a plain
                # scatter-SET (no reduction) and the channels combine
                # element-wise — jnp.<ufunc> applies per channel in a
                # fixed order
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
        ax = self.procmesh.axis
        D = self.D
        nl = self.nl
        cap = self.capacity
        chans = _channels(self.kside)
        want_count = (mode == 'mean')

        def local(d, idx, valid):
            idx = idx[0]
            valid = valid[0]
            localpart = d[:nl]
            if mode == 'local':
                return localpart
            out = localpart
            cnt = jnp.ones((nl,), dtype=d.dtype) if want_count else None
            for c, (m, side) in enumerate(chans):
                part = d[nl + c * cap: nl + (c + 1) * cap]
                # route the ghost results back to the source block
                perm = [(j, (j - side * m) % D) for j in range(D)]
                back = lax.ppermute(part, ax, perm)
                i = idx[c]
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
                    # indices are unique within a channel: align the
                    # channel's values to particles with a scatter-
                    # SET, then combine element-wise with the
                    # caller's binary fn (any ufunc, no scatter-
                    # reduction support needed).  Invalid slots are
                    # routed to an overflow row (sentinel >= nl:
                    # negative indices WRAP even under 'drop')
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
        key = ('gather1d', self._geom_key(), mode, combine, extra)
        if key not in _SHARDED_FN_CACHE:
            _SHARDED_FN_CACHE[key] = jax.jit(self._shard_map(
                local,
                in_specs=(self._specs(extra), P(ax, None, None),
                          P(ax, None, None)),
                out_specs=self._specs(extra)))
        out = _SHARDED_FN_CACHE[key](data, self.send_idx,
                                     self.recv_valid)
        if self.npart_pad > self.npart:
            out = out[:self.npart]
        return self._poison(out)

    def get_exchange_cost(self):
        """Per-device count of ghosts shipped away (reference
        domain.py:125-136)."""
        return np.asarray(jnp.sum(self.send_idx >= 0, axis=(1, 2)))


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _constrain_blocks_fn(sharding):
    return jax.jit(lambda v: jax.lax.with_sharding_constraint(
        v, sharding))


def _constrain_blocks(value, sharding):
    """with_sharding_constraint that tolerates non-divisible leading
    extents: inside jit the constraint is a GSPMD hint (XLA resolves
    an uneven request to its best divisor split); the eager primitive
    would reject it."""
    import jax.core as _core
    if isinstance(value, _core.Tracer):
        return jax.lax.with_sharding_constraint(value, sharding)
    return _constrain_blocks_fn(sharding)(value)


def home_block(pos0_grid, N0, D):
    """Home slab/device of an axis-0 grid coordinate."""
    rows = _slab_rows(N0, D)
    return (jnp.floor(jnp.mod(pos0_grid, N0)) // rows).astype(
        jnp.int32) % D


def _default_kside(smoothing, rows, D, N0=None):
    """window reach in slabs plus ONE slab of headroom: covers both
    a cell of drift since the last reshard and the equal-count
    quantile splits of :func:`reshard` that can leave edge particles
    one block from home (a legal reshard must never poison).

    Uneven meshes add the fully-dead slabs at the seam: a ball
    wrapping the physical period N0 < rows*D hops over them in ring
    distance, so the reach must cover them too."""
    kside = int(np.ceil(float(smoothing) / rows)) + 1
    if N0 is not None and rows * D != int(N0):
        dead_slabs = (D - 1) - (int(N0) - 1) // rows
        kside += dead_slabs
    return min(max(1, kside), max(1, (D - 1) // 2))


def measure_ghosts(procmesh, pos0_grid, N0, npart, smoothing,
                   kside=None):
    """One jitted counting pass over concrete positions: returns
    (per-channel max send count over devices, max slab reach).

    The reference sizes its Alltoallv buffers from the exact counts it
    just exchanged (domain.py:113-136); XLA needs static capacities,
    so this is the measurement half — :func:`decompose` with
    ``capacity='auto'`` consumes it with a slack factor.  Host-syncs:
    call OUTSIDE jit.
    """
    import jax.core as _core
    if isinstance(pos0_grid, _core.Tracer):
        raise ValueError(
            "measure_ghosts needs concrete positions (it host-syncs "
            "the counts); call it outside jit, e.g. once on the "
            "initial state, and pass the resulting capacity into "
            "decompose")
    D = procmesh.size
    rows = _slab_rows(N0, D)
    if kside is None:
        kside = _default_kside(smoothing, rows, D, N0=N0)
    s = float(smoothing)
    ax = procmesh.axis
    chans = _channels(kside)
    # uneven particle counts: pad with slab-center sentinels exactly
    # as decompose() does, so auto-tuning (Solver.tune_exchange) works
    # on any npart — a sentinel at a slab center ghosts nowhere as
    # long as smoothing < rows/2 (decompose enforces the same bound
    # through capacity anyway; a counted-but-unused ghost only
    # inflates the measured capacity, never corrupts)
    pos0_grid = jnp.asarray(pos0_grid)
    npad = -(-pos0_grid.shape[0] // D) * D
    if npad > pos0_grid.shape[0]:
        sentinel = jnp.full((npad - pos0_grid.shape[0],),
                            _sentinel_pos(N0, rows, D),
                            pos0_grid.dtype)
        pos0_grid = jnp.concatenate([pos0_grid, sentinel])

    def count(g):
        b = lax.axis_index(ax)
        dlo, dhi = _ball_channels(g, s, b, N0, rows, D)
        cnts = []
        for m, side in chans:
            mask = (dlo <= -m) if side < 0 else (dhi >= m)
            cnts.append(jnp.sum(mask.astype(jnp.int32)))
        c = lax.pmax(jnp.stack(cnts), ax)
        reach = lax.pmax(jnp.maximum(jnp.max(-dlo), jnp.max(dhi)),
                         ax)
        return c[None], reach[None, None]

    key = ('measg1d', procmesh, D, rows, kside, N0, s)
    if key not in _SHARDED_FN_CACHE:
        _SHARDED_FN_CACHE[key] = jax.jit(shard_map(
            count, mesh=procmesh.mesh, in_specs=P(ax),
            out_specs=(P(ax, None), P(ax, None))))
    c, reach = _SHARDED_FN_CACHE[key](jnp.asarray(pos0_grid))
    return np.asarray(c[0]), int(np.asarray(reach)[0, 0])


def measure_load(procmesh, pos0_grid, N0, smoothing, kside=None):
    """Per-device work accounting on a concrete state — the
    ``get_exchange_cost`` analog (reference domain.py:125-136) plus
    the load measurement the reference feeds into loadbalance
    (domain.py:409-499).

    TPU slabs are equal-sized by construction (uneven blocks don't
    shard), so the fix for imbalance is the equal-count quantile
    :func:`reshard`, not uneven domains — but the residual skew from
    clustering (ghost traffic + paint work follow the density) is
    real and must be REPORTED, not hidden.  Returns a dict:

    - ``residents``: (D,) particles homed per device block
    - ``ghosts_sent``: (D,) ghost images shipped away per device
    - ``ghosts_recv``: (D,) ghost images received per device
    - ``paint_work``: (D,) residents + received (stencil updates)
    - ``imbalance``: max(paint_work) / mean(paint_work) — 1.0 is
      perfect; the reshard quantile split drives this to ~1 in
      resident count, leaving only the clustering skew.

    Host-syncs; call outside jit (like :func:`measure_ghosts`).
    """
    D = procmesh.size
    rows = _slab_rows(N0, D)
    if kside is None:
        kside = _default_kside(smoothing, rows, D, N0=N0)
    s = float(smoothing)
    ax = procmesh.axis
    chans = _channels(kside)
    pos0_grid = jnp.asarray(pos0_grid)
    npad = -(-pos0_grid.shape[0] // D) * D
    npart = pos0_grid.shape[0]
    if npad > npart:
        sentinel = jnp.full((npad - npart,),
                            _sentinel_pos(N0, rows, D),
                            pos0_grid.dtype)
        pos0_grid = jnp.concatenate([pos0_grid, sentinel])

    def count(g):
        b = lax.axis_index(ax)
        gm = jnp.mod(g, N0)
        # residents of THIS slab among the block (post-reshard the
        # block ~= the slab population; pre-reshard they can differ)
        res = jnp.sum(((gm >= b * rows) & (gm < (b + 1) * rows))
                      .astype(jnp.int32))
        dlo, dhi = _ball_channels(g, s, b, N0, rows, D)
        cnts = [jnp.sum(((dlo <= -m) if side < 0 else (dhi >= m))
                        .astype(jnp.int32)) for m, side in chans]
        return res[None], jnp.stack(cnts)[None]

    key = ('measl1d', procmesh, D, rows, kside, N0, s)
    if key not in _SHARDED_FN_CACHE:
        _SHARDED_FN_CACHE[key] = jax.jit(shard_map(
            count, mesh=procmesh.mesh, in_specs=P(ax),
            out_specs=(P(ax), P(ax, None))))
    res, sent = _SHARDED_FN_CACHE[key](pos0_grid)
    res = np.asarray(res)
    sent = np.asarray(sent)                   # (D, C)
    recv = np.zeros(D, np.int64)
    for c, (m, side) in enumerate(chans):
        # block j ships channel (m, side) to block j + side*m
        for j in range(D):
            recv[(j + side * m) % D] += sent[j, c]
    # sentinels sit in the LAST BLOCK's particle list but are homed
    # at the sentinel slab (= the last slab on even meshes); deduct
    # them from wherever they were counted
    if npad > npart:
        sb = int(_sentinel_pos(N0, rows, D) // rows)
        if sb == D - 1:
            res[-1] -= (npad - npart)
    nl = npad // D
    work = np.full(D, nl, np.int64) + recv
    if npad > npart:
        work[-1] -= (npad - npart)
    return {
        "residents": res,
        "ghosts_sent": sent.sum(axis=1),
        "ghosts_recv": recv,
        "paint_work": work,
        "imbalance": float(work.max() / max(work.mean(), 1e-300)),
    }


def decompose(procmesh, pos0_grid, N0, npart, smoothing,
              kside=None, capacity=None, slack=1.3):
    """Build a :class:`ShardedLayout` for particles whose axis-0 grid
    coordinate is ``pos0_grid`` (npart, traced ok).

    The gridnd_fill role (reference _domain.pyx:9-122) on static
    shapes: per device block, enumerate which of the b±m slabs each
    particle's smoothing ball touches and pack fixed-capacity send
    channels.

    Parameters
    ----------
    smoothing : float — window reach in grid cells (support * 0.5).
    kside : int — ghost channels per side.  Particles may roam up to
        ``kside*rows - smoothing`` cells from their home slab before
        a reshard is required (checked; violations poison results).
        The default covers the window reach plus one slab (so a
        post-reshard edge particle never poisons).
    capacity : int | 'auto' — ghost slots per channel; defaults to
        the block size (never overflows, but every exchanged array
        then carries (1+2*kside)x the particle memory).  'auto' runs
        :func:`measure_ghosts` on the given (concrete) positions and
        pads the measured per-channel max by ``slack`` — overflow
        from later drift poisons, never silently drops.  'auto' also
        GROWS a defaulted ``kside`` to the measured residency reach:
        an equal-count quantile reshard of a clustered catalog parks
        whole blocks slabs away from home (a dense pancake holding
        >1/D of the mass shifts every later particle's rank), and a
        smoothing-derived radius would poison the plan instead of
        delivering the ghosts (the reference's decompose enumerates
        whatever domain range each particle touches,
        domain.py:561-652 — no fixed radius to outgrow).
    """
    D = procmesh.size
    rows = _slab_rows(N0, D)
    kside_given = kside is not None
    if kside is None:
        kside = _default_kside(smoothing, rows, D, N0=N0)
        if rows * D != N0:
            # an uneven mesh must still be able to REACH across the
            # dead seam slabs within the non-ambiguous ring radius;
            # when it cannot (N0 barely above D), the mesh is too
            # small to slab-shard — the caller falls back to the
            # replicated path
            need = (int(np.ceil(float(smoothing) / rows)) + 1
                    + (D - 1) - (N0 - 1) // rows)
            if need > max(1, (D - 1) // 2):
                raise ValueError(
                    "Nmesh[0]=%d is too small to slab-shard over %d "
                    "devices (ghost reach %d slabs exceeds the ring "
                    "radius %d); use fewer devices"
                    % (N0, D, need, (D - 1) // 2))
    if 2 * kside + 1 > D:
        raise ValueError(
            "kside=%d ghost reach wraps the %d-device ring; use a "
            "smaller kside or more devices" % (kside, D))
    # non-divisible particle counts: pad to equal blocks with inert
    # sentinels parked at the last slab's center (they ghost nowhere;
    # exchanged payloads pad with the fill value; gather slices them
    # off) — the static-shape stand-in for the reference's ragged
    # per-rank counts
    npart_pad = -(-npart // D) * D
    if npart_pad > npart:
        sentinel = jnp.full((npart_pad - npart,),
                            _sentinel_pos(N0, rows, D),
                            jnp.asarray(pos0_grid).dtype)
        pos0_grid = jnp.concatenate([jnp.asarray(pos0_grid),
                                     sentinel])
    nl = npart_pad // D
    if capacity == 'auto':
        counts, reach = measure_ghosts(procmesh, pos0_grid, N0,
                                       npart, smoothing, kside=kside)
        r = int(reach)
        if r > kside and not kside_given:
            rmax = (D - 1) // 2      # ring-unique channel radius
            if r > rmax:
                raise ValueError(
                    "measured ghost reach %d slab-blocks exceeds the "
                    "ring radius %d on %d devices: the catalog is too "
                    "clustered for an equal-count slab residency — "
                    "rebalance (pm.reshard_particles) or use a 2-d "
                    "process grid" % (r, rmax, D))
            kside = r
            counts, _ = measure_ghosts(procmesh, pos0_grid, N0,
                                       npart, smoothing, kside=kside)
        capacity = int(np.ceil(float(counts.max()) * float(slack)))
        capacity = max(capacity, 16)
    if capacity is None:
        capacity = nl
    capacity = int(min(capacity, nl))
    s = float(smoothing)
    if s > kside * rows:
        raise ValueError(
            "smoothing %g exceeds the kside=%d ghost reach (%d rows); "
            "increase kside" % (s, kside, kside * rows))
    ax = procmesh.axis
    chans = _channels(kside)

    def plan(g):
        # g: (nl,) local block of axis-0 grid coordinates
        b = lax.axis_index(ax)
        dlo, dhi = _ball_channels(g, s, b, N0, rows, D)
        bad = jnp.sum(jnp.where((dlo < -kside) | (dhi > kside), 1, 0))
        arange = jnp.arange(nl, dtype=jnp.int32)
        bufs = []
        over = jnp.zeros((), jnp.int32)
        for m, side in chans:
            mask = (dlo <= -m) if side < 0 else (dhi >= m)
            rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
            slot = jnp.where(mask & (rank < capacity), rank, capacity)
            buf = jnp.full((capacity + 1,), -1, jnp.int32)
            buf = buf.at[slot].set(arange, mode='drop')[:capacity]
            over = over + jnp.maximum(
                jnp.sum(mask.astype(jnp.int32)) - capacity, 0)
            bufs.append(buf)
        idx = jnp.stack(bufs)[None]          # (1, C, cap)
        badness = lax.psum(
            (bad + over).astype(jnp.float32), ax)
        return idx, badness

    key = ('plan1d', procmesh, D, nl, capacity, kside, N0, rows, s)
    if key not in _SHARDED_FN_CACHE:
        _SHARDED_FN_CACHE[key] = jax.jit(shard_map(
            plan, mesh=procmesh.mesh, in_specs=P(ax),
            out_specs=(P(ax, None, None), P())))
    send_idx, badcount = _SHARDED_FN_CACHE[key](
        jnp.asarray(pos0_grid))
    badness = jnp.where(badcount > 0, jnp.nan, 0.0).astype(jnp.float32)

    # validity of received slots = the permuted validity of sent slots
    def valid_fn(idx):
        idx = idx[0]
        outs = []
        for c, (m, side) in enumerate(chans):
            ok = idx[c] >= 0
            perm = [(j, (j + side * m) % D) for j in range(D)]
            outs.append(lax.ppermute(ok, ax, perm))
        return jnp.stack(outs)[None]

    vkey = ('valid1d', procmesh, D, kside)
    if vkey not in _SHARDED_FN_CACHE:
        _SHARDED_FN_CACHE[vkey] = jax.jit(shard_map(
            valid_fn, mesh=procmesh.mesh,
            in_specs=P(ax, None, None),
            out_specs=P(ax, None, None)))
    recv_valid = _SHARDED_FN_CACHE[vkey](send_idx)

    return ShardedLayout(procmesh, send_idx, recv_valid, badness,
                         npart, N0, rows, kside, capacity, smoothing,
                         npart_pad=npart_pad)


def reshard(procmesh, pos0_grid, N0, *arrays):
    """Globally re-sort particle arrays so block b holds exactly the
    particles of slab b — the mpsort role (reference uses mpsort for
    global re-layout, pm.py:389-448) restoring the residency contract
    of :func:`decompose`.

    After the sort, block b holds the b-th equal-count quantile of the
    home-block ordering.  When slab populations are uneven the split
    points sit a few particles off the exact slab boundaries, so edge
    particles land one block from home — well inside the kside ghost
    reach that :func:`decompose` (which re-validates residency and
    poisons on violation) tolerates.
    """
    D = procmesh.size
    home = home_block(pos0_grid, N0, D)
    # stable key: home block major, input order minor — one global
    # sort replaces the ragged alltoall of mpsort
    order = jnp.argsort(home, stable=True)
    arrays = tuple(jnp.asarray(a) for a in arrays)
    out = tuple(jnp.take(a, order, axis=0) for a in arrays)
    ax = procmesh.axis
    # eager with_sharding_constraint rejects particle counts that
    # do not divide D (jit-internal constraints accept them and let
    # GSPMD pick the best block split), so route through a tiny jit
    out = tuple(_constrain_blocks(
        a, jax.sharding.NamedSharding(
            procmesh.mesh, P(ax, *([None] * (a.ndim - 1)))))
        for a in out)
    if len(arrays) == 1:
        return out[0]
    return out


# --- sharded paint / readout -------------------------------------------
#
# The device-mesh execution of the reference's hottest loops
# (pmesh/pm.py:1795-1869 paint, 745-791 readout): ghost images are
# delivered by the ShardedLayout, then each device paints/reads ONLY
# its own (rows, N1, ...) slab — stencil cells outside the slab are
# dropped because the neighboring device's image of the same particle
# covers them (exactly the reference's local-canvas contract).

def _grid_coords(layout, pos, scale, translate=None):
    """Exchange simulation-unit positions as per-axis grid coordinate
    ghost arrays; axis 0 arrives in each receiver's unwrapped frame.

    ``translate`` (grid cells, per axis) is folded into the
    coordinates BEFORE the exchange so the ghost plan — built by
    :func:`decompose` from the same translated axis-0 coordinate —
    covers exactly the cells the kernel touches (the Affine translate
    role, reference pmesh/window.py:18-55)."""
    pos = jnp.asarray(pos)
    ndim = pos.shape[-1]
    if translate is None:
        translate = (0.0,) * ndim
    g0 = pos[:, 0] * jnp.asarray(scale[0], pos.dtype) \
        + jnp.asarray(translate[0], pos.dtype)
    eg0 = layout.exchange_grid0(g0)
    egs = [eg0]
    for d in range(1, ndim):
        gd = pos[:, d] * jnp.asarray(scale[d], pos.dtype) \
            + jnp.asarray(translate[d], pos.dtype)
        egs.append(layout.exchange(gd))
    return egs


def _exchange_mass(layout, mass, npart, dtype):
    """Per-image weights: the mass exchanged with 0 fill, so empty
    ghost slots paint nothing."""
    m = jnp.broadcast_to(jnp.asarray(mass, dtype=dtype), (npart,))
    return layout.exchange(m, fill=0)


def _check_hsml(layout, window, hsml, hsml_max):
    """static + in-graph validation of per-particle support scaling
    on the sharded path: the ghost reach must cover the LARGEST
    particle's window (reference _window_imp.c:24-47 scales the
    support per particle; here the reach is part of the static plan,
    so the bound is static and any particle exceeding it poisons)."""
    from ..ops.kernels import find_window
    if hsml is None:
        return None, None
    if hsml_max is None:
        raise ValueError(
            "the sharded paint/readout needs a static hsml_max with "
            "per-particle hsml (the ghost reach is a static plan)")
    reach = find_window(window).support_float * 0.5 * float(hsml_max)
    if reach > layout.smoothing + 1e-9:
        raise ValueError(
            "hsml_max=%g needs a ghost reach of %g cells but the "
            "layout was built with smoothing=%g; decompose with "
            "smoothing=support/2*hsml_max" % (hsml_max, reach,
                                              layout.smoothing))
    # particles whose hsml exceeds the declared bound would paint
    # outside the exchanged halo: poison, never truncate silently
    bad = jnp.where(jnp.max(jnp.asarray(hsml)) > hsml_max,
                    jnp.nan, 0.0).astype(jnp.float32)
    eh = layout.exchange(jnp.asarray(hsml), fill=1.0)
    return eh, bad


# jitted shard_map programs are cached by their static geometry:
# jax.jit caches on function identity, so a fresh closure per call
# would retrace/recompile the whole sharded stencil program on every
# eager paint/readout invocation
_SHARDED_FN_CACHE = {}


def _diff_scale(outs, scale, diffdir):
    """Match the single-device convention: derivative kernels carry
    the sim->grid chain-rule factor scale[d] (ops/paint.py _kweight),
    which the sharded path — computing in grid units (scale=1) —
    must re-apply, or gradients come out per GRID CELL instead of per
    simulation unit whenever BoxSize != Nmesh."""
    if diffdir is None:
        return outs
    if diffdir == 'all':
        return tuple(o * jnp.asarray(scale[d], o.dtype)
                     for d, o in enumerate(outs))
    f = float(scale[int(diffdir)])
    return tuple(o * jnp.asarray(f, o.dtype) for o in outs)


def paint_sharded(layout, pos, mass, shape, scale, window,
                  diffdir=None, dtype=None, base=None, hsml=None,
                  hsml_max=None, translate=None):
    """Paint a device-sharded particle set onto the slab-sharded mesh.

    Parameters
    ----------
    pos : (npart, ndim) simulation-unit positions (sharded or not).
    mass : scalar or (npart,) weights.
    shape : global mesh shape; shape[0] must be layout.N0.
    scale : per-axis sim->grid factors (the pm affine; translate 0).
    base : optional (shape) array to accumulate onto (hold=True).
    hsml, hsml_max : per-particle kernel scaling + its static bound
        (the layout's smoothing must cover support/2 * hsml_max).

    Returns the (shape) global RealField value, sharded P('x', ...).
    """
    from ..ops import paint as _paint_ops
    pos = jnp.asarray(pos)
    ndim = pos.shape[-1]
    shape = tuple(int(n) for n in shape)
    if shape[0] != layout.N0:
        raise ValueError("mesh shape %s does not match the layout's "
                         "N0=%d" % (shape, layout.N0))
    if dtype is None:
        dtype = pos.dtype
    egs = _grid_coords(layout, pos, scale, translate)
    em = _exchange_mass(layout, mass, pos.shape[0], dtype)
    eh, hbad = _check_hsml(layout, window, hsml, hsml_max)

    ax = layout.procmesh.axis
    rows = layout.rows
    lshape = (rows,) + shape[1:]
    # local paint: axis 0 unwrapped/no-period (ghosts cover the
    # straddle), axes 1.. periodic as usual
    period = (0,) + shape[1:]
    nh = 0 if eh is None else 1

    key = ('paint', layout.procmesh, rows, tuple(shape),
           str(window), diffdir, jnp.dtype(dtype).name, nh,
           None if hsml_max is None else float(hsml_max))
    if key not in _SHARDED_FN_CACHE:
        def local(em, *rest):
            egs = rest[:len(rest) - nh] if nh else rest
            b = lax.axis_index(ax)
            p = jnp.stack(
                [egs[0] - b.astype(egs[0].dtype) * rows]
                + list(egs[1:]), axis=-1)
            zeros = jnp.zeros(lshape, dtype=dtype)
            return _paint_ops.paint(zeros, p, mass=em, window=window,
                                    scale=1.0, translate=0.0,
                                    period=period, diffdir=diffdir,
                                    hsml=rest[-1] if nh else None,
                                    hsml_max=hsml_max)

        fn = shard_map(local, mesh=layout.procmesh.mesh,
                       in_specs=(P(ax),) * (1 + ndim + nh),
                       out_specs=P(ax, *([None] * (ndim - 1))))
        # jit the shard_map: eagerly it executes primitive-by-
        # primitive over the mesh (one pjit dispatch per stencil op —
        # minutes for a 64-offset hsml stencil); as one program it
        # compiles once
        from jax.sharding import NamedSharding
        _SHARDED_FN_CACHE[key] = jax.jit(
            fn, out_shardings=NamedSharding(
                layout.procmesh.mesh,
                P(ax, *([None] * (ndim - 1)))))
    operands = (em,) + tuple(egs) + ((eh,) if nh else ())
    out = _SHARDED_FN_CACHE[key](*operands)
    if rows * layout.D != shape[0]:
        # uneven mesh: the slabs are padded (dead rows at the top
        # absorb the wrap-seam stencil spill; the ghost images on the
        # wrapped side deposit the physical contribution) — slice the
        # global padded mesh back to the logical extent
        out = out[:shape[0]]
    out = _diff_scale((out,), scale, diffdir)[0]
    # NaN coordinates of a poisoned plan are silently dropped by the
    # bounds check; surface the poison in the mesh itself
    out = out + layout.badness.astype(out.dtype)
    if hbad is not None:
        out = out + hbad.astype(out.dtype)
    if base is not None:
        out = out + base
    return out


def readout_sharded(layout, meshes, pos, scale, window, diffdir=None,
                    hsml=None, hsml_max=None, translate=None):
    """Read slab-sharded meshes at a device-sharded particle set.

    ``meshes``: one (shape) array or a tuple sharing the stencil
    computation (the batched force-readout fast path).  Returns per
    mesh the (npart,) values in the original particle ordering.

    ``diffdir='all'``: ONE mesh, all ndim derivative readouts sharing
    a single stencil pass and ONE ghost gather (the fused gradient-
    mode force readout) — returns an ndim-tuple.
    """
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
    if shape[0] != layout.N0:
        raise ValueError("mesh shape %s does not match the layout's "
                         "N0=%d" % (shape, layout.N0))
    egs = _grid_coords(layout, pos, scale, translate)
    eh, hbad = _check_hsml(layout, window, hsml, hsml_max)

    ax = layout.procmesh.axis
    rows = layout.rows
    if rows * layout.D != shape[0]:
        # uneven mesh: pad to the dead-row slab extent with zeros
        # (the wrap-seam cells a local stencil would read past the
        # physical edge; the ghost image on the wrapped side reads
        # the real cells)
        pad = rows * layout.D - shape[0]
        meshes = tuple(jnp.pad(m, ((0, pad),) + ((0, 0),)
                               * (m.ndim - 1)) for m in meshes)
    period = (0,) + tuple(shape[1:])
    nmesh = len(meshes)
    nout = ndim if multi else nmesh
    nh = 0 if eh is None else 1

    key = ('readout', layout.procmesh, rows, tuple(shape),
           str(window), diffdir, nmesh, nh,
           None if hsml_max is None else float(hsml_max))
    if key not in _SHARDED_FN_CACHE:
        def local(*args):
            lmeshes = args[:nmesh]
            egs = args[nmesh:len(args) - nh] if nh else args[nmesh:]
            b = lax.axis_index(ax)
            p = jnp.stack(
                [egs[0] - b.astype(egs[0].dtype) * rows]
                + list(egs[1:]), axis=-1)
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

        mesh_spec = P(ax, *([None] * (ndim - 1)))
        _SHARDED_FN_CACHE[key] = jax.jit(shard_map(
            local, mesh=layout.procmesh.mesh,
            in_specs=(mesh_spec,) * nmesh + (P(ax),) * (ndim + nh),
            out_specs=(P(ax),) * nout))
    operands = meshes + tuple(egs) + ((eh,) if nh else ())
    # see paint_sharded: never eager
    partials = _SHARDED_FN_CACHE[key](*operands)
    # ONE fused gather for the multi-output case: stack the per-
    # derivative partials on a trailing axis so the ppermute routing
    # runs once over all outputs
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
