"""Binned slot-lattice particles: the general-position fast path.

The lattice formulation (ops/gridpm.py) requires displacements within
static bounds; its cost grows as nv^3 when particles drift (measured:
nv=6 costs 11x the nv=3 step).  The reference instead scatters
arbitrary positions particle-by-particle with C atomics
(pmesh/_window_generics.h:21-72) — the exact pattern TPUs cannot do
fast (XLA scatter: ~85 M updates/s; 10+ s per 512^3 paint).

This module keeps arbitrary particle distributions in *slot-lattice*
form: ``nslots`` mesh-shaped sub-lattices, slot k of cell c holding
the k-th particle homed in c as a fractional displacement in [0, 1):

    disp[k][d] : (mesh) per-axis displacement of slot k  (cells)
    valid[k]   : (mesh) 1.0 where the slot holds a particle

- paint  = sum_k lattice-paint(disp_k, mass=valid_k) — bounds stay
  (0, 1)+drift regardless of how far the system has evolved;
- readout = per-slot lattice readouts sharing the force meshes;
- **rebase** folds accumulated integer drift back into cell
  reassignment with ONLY dense masked rolls: count arrivals per
  target cell across the (slot, integer-offset) images in a fixed
  order, the running count is each image's arrival rank, and rank j
  lands in slot j.  No sort, no scatter, jittable, and the rolls
  lower to halo collective-permutes on a device mesh.

Overflow (a cell receiving more than ``nslots`` particles) is NEVER
silent: the overflow count is returned and the fields are poisoned
with NaN unless the caller handles it (pick more slots or rebase more
often; the FastPM driver re-checks every rebase).

The per-step cost is nslots * the lattice cost with nv=2 (8 passes),
so moderately clustered distributions (occupancy <= nslots) run
within a small factor of the pure-lattice path — the TPU answer to
the reference's general-position scatter.

Scope note: like ops/gridpm.py, the slot-lattice assumes a uniform
window width — per-particle ``hsml`` (reference _window_imp.c:24-47)
is not supported on this fast path; variable-smoothing catalogs take
the generic ops/paint.py / sharded-exchange paths (full hsml
support).
"""
import jax
import jax.numpy as jnp
import numpy as np

from . import gridpm as _gp

__all__ = ["from_lattice", "fold_lattice", "fold_needed", "rebase",
           "paint_binned", "readout_binned", "occupancy",
           "from_positions", "needed_slots", "grow_slots"]


def from_lattice(disp, vel=None, nslots=2):
    """Wrap a lattice state (one particle per cell) as a binned state
    with ``nslots`` slots (slot 0 full, the rest empty)."""
    ndim = len(disp)
    shape = disp[0].shape
    dtype = disp[0].dtype

    # every empty slot gets its OWN zero buffers: sharing one tuple
    # between dslots and vslots makes the same device buffer appear
    # under two arguments, and donating either one then invalidates
    # the other (the axon TPU backend rejects the launch with an
    # opaque INVALID_ARGUMENT) — donation of the state is how the
    # 512^3 superstep avoids old+new state coexisting
    def _zeros():
        return tuple(jnp.zeros(shape, dtype) for _ in range(ndim))

    dslots = (tuple(disp),) + tuple(_zeros() for _ in range(nslots - 1))
    valid = (jnp.ones(shape, dtype),) + tuple(
        jnp.zeros(shape, dtype) for _ in range(nslots - 1))
    if vel is None:
        return dslots, valid
    vslots = (tuple(vel),) + tuple(_zeros() for _ in range(nslots - 1))
    return dslots, vslots, valid


def _lattice_cells(disp):
    """flat home-cell id + rank-in-cell of a lattice+displacement
    state (shared by fold_lattice / fold_needed).  Returns
    (flat_sorted, order, rank, fracs): fracs are mesh-shaped
    fractional displacements wrt the new home cell."""
    ndim = len(disp)
    shape = disp[0].shape
    dtype = disp[0].dtype
    flat = None
    fracs = []
    for d in range(ndim):
        ax = jnp.arange(shape[d], dtype=dtype).reshape(
            (1,) * d + (-1,) + (1,) * (ndim - 1 - d))
        g = jnp.mod(ax + disp[d], shape[d])
        c = jnp.floor(g)
        fracs.append(g - c)
        ci = c.astype(jnp.int32)
        flat = ci if flat is None else flat * shape[d] + ci
    flat = flat.reshape(-1)
    order = jnp.argsort(flat, stable=True)
    flat_s = flat[order]
    n = flat.shape[0]
    i = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), flat_s[1:] != flat_s[:-1]])
    start = jax.lax.cummax(jnp.where(is_start, i, 0))
    rank = i - start
    return flat_s, order, rank, fracs


def fold_needed(disp):
    """Max cell occupancy after folding a lattice + ARBITRARY
    displacement state: the minimum ``nslots`` for
    :func:`fold_lattice`.  Jittable; host-sync the scalar to pick a
    static slot count."""
    _, _, rank, _ = _lattice_cells(disp)
    return jnp.max(rank) + 1


def fold_lattice(disp, vel=None, nslots=2):
    """Sort-based fold of a lattice + displacement state into a
    ``nslots``-slot binned state — the IC-ingestion analog of
    :func:`from_positions` (the reference side is the per-particle
    decompose+paint that accepts any position,
    pmesh/_window_generics.h:21-72).

    Handles ARBITRARY excursions in O(N) memory: :func:`rebase` on a
    wide initial excursion enumerates (hi-lo+1)^ndim roll images and
    keeps K_in+K_out mesh states live per image (measured 23.7 GB of
    HLO temps at 384^3, bounds (-1.6, 2.6), Kout=4 — past a 16 GB
    chip), where this fold is one global sort plus one scatter per
    payload field.  One-time cost; the production loop still uses the
    plane-walk :func:`rebase` for its bounded per-step drift.

    Like :func:`rebase`, overflow (a cell holding more than
    ``nslots`` particles) is counted and NaN-poisons the fields.
    Returns (dslots, valid, overflow) or with ``vel``
    (dslots, vslots, valid, overflow).
    """
    ndim = len(disp)
    shape = disp[0].shape
    dtype = disp[0].dtype
    size = int(np.prod(shape))
    flat_s, order, rank, fracs = _lattice_cells(disp)
    # int32 targets cap nslots*size below 2^31 (same contract as
    # from_positions): 512^3 * K=15 fits; 1024^3 needs K=1
    target = rank * size + flat_s
    ok = rank < nslots
    overflow = jnp.sum(jnp.where(ok, 0, 1))
    target = jnp.where(ok, target, nslots * size)

    def scatter(mesh_vals):
        f = jnp.zeros((nslots * size + 1,), dtype).at[target].set(
            mesh_vals.reshape(-1)[order], mode='drop')
        return f[:-1].reshape((nslots,) + shape)

    vfull = scatter(jnp.ones(shape, dtype))
    dfull = [scatter(fracs[d]) for d in range(ndim)]
    bad = jnp.where(overflow > 0, jnp.nan, 0.0).astype(dtype)
    dslots = tuple(tuple(dfull[d][k] + bad for d in range(ndim))
                   for k in range(nslots))
    valid = tuple(vfull[k] for k in range(nslots))
    if vel is None:
        return dslots, valid, overflow
    vfull_d = [scatter(vel[d]) for d in range(ndim)]
    vslots = tuple(tuple(vfull_d[d][k] + bad for d in range(ndim))
                   for k in range(nslots))
    return dslots, vslots, valid, overflow


def _icount(v):
    """EXACT particle count of a 0/1 validity field: f32 summation
    drifts by several units past ~2^24 ones (measured: a clean 384^3
    fold read back 56,623,092 of 56,623,104 particles), and the
    poison contract turns that drift into phantom overflow."""
    return jnp.sum(v.astype(jnp.int32))


def occupancy(valid):
    """total particle count and max cell occupancy."""
    tot = sum(_icount(v) for v in valid)
    occ = sum(jnp.asarray(v) for v in valid)
    return tot, jnp.max(occ)


def needed_slots(dslots, valid, drift_bounds):
    """Max post-rebase cell occupancy of the current state — the slot
    count a :func:`rebase` needs to fold the drift without overflow.

    The counting half of the rebase with no payload movement (one
    int32 field instead of (3+extras)*K payload fields), so an
    adaptive driver can measure BEFORE committing to a slot count and
    grow instead of poisoning — the recovery the reference never
    needs because its per-particle C loop handles any clustering
    (pmesh/_window_generics.h:21-72).  Jittable; host-sync the result
    to choose a static nslots_out.
    """
    ndim = len(dslots[0])
    axes = tuple(range(ndim))
    offsets = jnp.asarray(_drift_offsets(drift_bounds, ndim),
                          jnp.int32)
    # floor once per slot/axis; the offset loop is a lax.scan with
    # DYNAMIC rolls — unrolling K * |offsets| roll+compare passes
    # keeps too many mesh temporaries live (measured: 37 GB at 384^3
    # with (-4, 5) bounds) and blows both HBM and compile time for
    # wide drift bounds
    floors = tuple(tuple(jnp.floor(d).astype(jnp.int32) for d in dk)
                   for dk in dslots)
    occ = tuple(v > 0 for v in valid)
    count0 = jnp.zeros(dslots[0][0].shape, jnp.int32)

    def body(count, off):
        for k in range(len(dslots)):
            sel = occ[k]
            for d in range(ndim):
                sel = sel & (floors[k][d] == off[d])
            count = count + jnp.roll(sel.astype(jnp.int32),
                                     tuple(off[d] for d in
                                           range(ndim)), axes)
        return count, None

    count, _ = jax.lax.scan(body, count0, offsets)
    return jnp.max(count)


def grow_slots(valid, *slot_fields, nslots_new=None):
    """Append empty slots so a K-slot state becomes K'-slot (K' >= K).

    ``slot_fields``: any number of per-slot structures matching
    ``valid``'s nesting one level up (tuples over slots of per-axis
    tuples).  Returns (valid', fields'...)."""
    K = len(valid)
    Kn = int(nslots_new)
    if Kn < K:
        raise ValueError("grow_slots cannot shrink (%d -> %d); rebase "
                         "with nslots_out instead" % (K, Kn))
    shape = valid[0].shape
    dtype = valid[0].dtype
    pad_v = tuple(jnp.zeros(shape, dtype) for _ in range(Kn - K))
    out = [tuple(valid) + pad_v]
    for f in slot_fields:
        ndim = len(f[0])
        pad = tuple(tuple(jnp.zeros(shape, dtype) for _ in range(ndim))
                    for _ in range(Kn - K))
        out.append(tuple(f) + pad)
    return tuple(out)


def _drift_offsets(drift_bounds, ndim):
    lo, hi = drift_bounds
    dlo = int(np.floor(lo))
    dhi = int(np.floor(hi))
    import itertools
    return list(itertools.product(range(dlo, dhi + 1), repeat=ndim))


def rebase(dslots, valid, drift_bounds, extras=(), nslots_out=None,
           impl=None, procmesh=None):
    """Fold integer drift into cell reassignment.

    Parameters
    ----------
    dslots : tuple over slots of per-axis displacement tuples; values
        may have drifted anywhere within ``drift_bounds`` cells.
    valid : tuple over slots of occupancy masks (0/1, field dtype).
    drift_bounds : (lo, hi) floats — static bound on the current
        displacements (the paint bounds used since the last rebase).
    extras : tuple of additional per-slot per-axis field tuples that
        move with the particles (e.g. velocities), same nesting as
        dslots.
    nslots_out : output slot count (default: len(dslots)).
    procmesh : ProcessMesh or None — run the plane-walk kernel
        per-slab under shard_map with ring-halo x planes (the XLA
        fallback shards transparently through GSPMD instead).

    Returns (new_dslots, new_valid, new_extras, overflow): all
    displacements back in [0, 1); ``overflow`` counts particles that
    did not fit ``nslots_out`` slots — the caller MUST check it (the
    fields are NaN-poisoned when overflow > 0, so ignoring it cannot
    silently drop mass).
    """
    K = len(dslots)
    ndim = len(dslots[0])
    shape = dslots[0][0].shape
    dtype = dslots[0][0].dtype
    axes = tuple(range(ndim))
    Kout = nslots_out if nslots_out is not None else K
    offsets = _drift_offsets(drift_bounds, ndim)

    if impl is None:
        impl = 'pallas' if _gp._use_pallas(None) else 'xla'
    if (impl == 'pallas' and ndim == 3
            and all(-1 <= o <= 1 for off in offsets for o in off)):
        return _rebase_pallas(dslots, valid, extras, K, Kout, dtype,
                              procmesh=procmesh)

    new_d = [[jnp.zeros(shape, dtype) for _ in range(ndim)]
             for _ in range(Kout)]
    new_e = [[[jnp.zeros(shape, dtype) for _ in range(ndim)]
              for _ in range(Kout)] for _ in extras]
    new_v = [jnp.zeros(shape, dtype) for _ in range(Kout)]

    running = jnp.zeros(shape, jnp.int32)
    overflow = jnp.zeros((), jnp.int32)
    for k in range(K):
        for off in offsets:
            sel = valid[k] > 0
            for d in range(ndim):
                sel = sel & (jnp.floor(dslots[k][d]) == off[d])
            # image arrives at cell c + off
            arr = jnp.roll(sel, off, axes)
            rank = running
            running = running + arr.astype(jnp.int32)
            overflow = overflow + jnp.sum(
                jnp.where(arr & (rank >= Kout), 1, 0))
            # rolled payloads (fractional part re-centered to the
            # new home cell)
            moved_d = [jnp.roll(dslots[k][d] - off[d], off, axes)
                       for d in range(ndim)]
            moved_e = [[jnp.roll(e[k][d], off, axes)
                        for d in range(ndim)] for e in extras]
            for j in range(Kout):
                put = arr & (rank == j)
                new_v[j] = jnp.where(put, jnp.asarray(1, dtype),
                                     new_v[j])
                for d in range(ndim):
                    new_d[j][d] = jnp.where(put, moved_d[d],
                                            new_d[j][d])
                    for e in range(len(extras)):
                        new_e[e][j][d] = jnp.where(
                            put, moved_e[e][d], new_e[e][j][d])
            # sequence the images: without the barrier XLA schedules
            # every image's rolled temporaries concurrently (measured
            # 23 GB peak HBM for a 3.5 GB state at 512^3)
            flat, tree = jax.tree_util.tree_flatten(
                (running, new_v, new_d, new_e))
            flat = jax.lax.optimization_barrier(flat)
            running, new_v, new_d, new_e = \
                jax.tree_util.tree_unflatten(tree, flat)

    # losing a particle must never be silent: overflowed slots AND
    # particles whose drift escaped ``drift_bounds`` (their floor
    # matches no enumerated offset) both poison the result
    total_in = sum(_icount(v) for v in valid)
    total_out = sum(_icount(v) for v in new_v)
    lost = total_in - total_out - overflow
    overflow = overflow + jnp.abs(lost)
    bad = jnp.where(overflow > 0, jnp.nan, 0.0).astype(dtype)
    new_d = tuple(tuple(x + bad for x in slot) for slot in new_d)
    new_e = tuple(tuple(tuple(x + bad for x in slot) for slot in e)
                  for e in new_e)
    new_v = tuple(new_v)
    return new_d, new_v, new_e, overflow


def _rebase_pallas(dslots, valid, extras, K, Kout, dtype,
                   procmesh=None):
    """dispatch to the fused plane-walk kernel
    (ops/binned_pallas.py) and re-validate the particle count (the
    poison contract of :func:`rebase`)."""
    from . import binned_pallas as _bp
    shape = dslots[0][0].shape
    nextra = len(extras)
    if procmesh is not None and procmesh.size > 1:
        dstack = jnp.stack([jnp.stack(dk) for dk in dslots])
        vstack = jnp.stack(list(valid))
        if nextra:
            estacks = jnp.stack([
                jnp.stack([jnp.stack(ek) for ek in e])
                for e in extras])
        else:
            estacks = jnp.zeros((0, K, 3) + shape, dtype)
        nd, nv, ne, overflow = _bp.rebase_fused_sharded(
            procmesh, dstack, vstack, estacks, K, Kout, nextra)
        total_in = _icount(vstack)
        total_out = _icount(nv)
        lost = total_in - total_out - overflow
        overflow = overflow + jnp.abs(lost)
        bad = jnp.where(overflow > 0, jnp.nan, 0.0).astype(dtype)
        new_d = tuple(tuple(nd[j, a] + bad for a in range(3))
                      for j in range(Kout))
        new_v = tuple(nv[j] for j in range(Kout))
        new_e = tuple(
            tuple(tuple(ne[e, j, a] + bad for a in range(3))
                  for j in range(Kout))
            for e in range(nextra))
        return new_d, new_v, new_e, overflow

    # single device: the tuple form — the state arrays feed the
    # kernels directly, no (K, 3, N^3) stack/unstack copy temps
    # (those alone are ~7 GB at 512^3 K=2 + velocities and OOMed the
    # donated superstep)
    dflat = tuple(x for dk in dslots for x in dk)
    vtup = tuple(valid)
    eflat = tuple(x for e in extras for ek in e for x in ek)
    ndf, nvf, nef, overflow = _bp.rebase_fused_t(
        dflat, vtup, eflat, K, Kout, nextra)
    total_in = sum(_icount(v) for v in vtup)
    total_out = sum(_icount(v) for v in nvf)
    lost = total_in - total_out - overflow
    overflow = overflow + jnp.abs(lost)
    bad = jnp.where(overflow > 0, jnp.nan, 0.0).astype(dtype)
    new_d = tuple(tuple(ndf[j * 3 + a] + bad for a in range(3))
                  for j in range(Kout))
    new_v = tuple(nvf)
    new_e = tuple(
        tuple(tuple(nef[(e * Kout + j) * 3 + a] + bad
                    for a in range(3))
              for j in range(Kout))
        for e in range(nextra))
    return new_d, new_v, new_e, overflow


def paint_binned(dslots, valid, bounds=(0.0, 1.0), window='cic',
                 impl=None, procmesh=None):
    """density of a binned state: sum of per-slot lattice paints with
    the occupancy masks as masses."""
    out = None
    for dk, vk in zip(dslots, valid):
        p = _gp.paint_grid(tuple(dk), mass=vk, bounds=bounds,
                           window=window, impl=impl,
                           procmesh=procmesh)
        out = p if out is None else out + p
    return out


def readout_binned(meshes, dslots, valid, bounds=(0.0, 1.0),
                   window='cic', impl=None, procmesh=None,
                   diffdir=None):
    """per-slot readouts of one or more meshes; returns, per slot,
    the tuple of per-mesh value fields (invalid slots read garbage —
    mask with ``valid`` before use, as the integrators do).

    diffdir='all' reads ONE mesh with the 3 derivative windows in a
    fused pass per slot (the gradient-mode force; always returns a
    3-tuple per slot)."""
    single = not isinstance(meshes, (tuple, list))
    ms = (meshes,) if single else tuple(meshes)
    if diffdir == 'all' and len(ms) != 1:
        raise ValueError("diffdir='all' takes exactly one mesh")
    outs = []
    for dk in dslots:
        if diffdir == 'all':
            vals = _gp.readout_grid(ms[0], tuple(dk), bounds=bounds,
                                    window=window, impl=impl,
                                    procmesh=procmesh, diffdir='all')
            outs.append(vals)
            continue
        vals = _gp.readout_grid(ms, tuple(dk), bounds=bounds,
                                window=window, impl=impl,
                                procmesh=procmesh, diffdir=diffdir)
        outs.append(vals[0] if single else vals)
    return tuple(outs)


def from_positions(pos, shape, nslots, scale=1.0):
    """Bin arbitrary positions (N, ndim) into a slot-lattice (the
    one-time IC ingestion path; the production loop never sorts).

    Uses one global sort + rank-in-cell; particles beyond ``nslots``
    per cell overflow (counted; fields poisoned).  Positions are in
    simulation units; ``scale`` converts to grid cells.
    """
    pos = jnp.asarray(pos)
    ndim = pos.shape[-1]
    shape = tuple(int(n) for n in shape)
    dtype = pos.dtype
    g = [jnp.mod(pos[:, d] * scale, shape[d]) for d in range(ndim)]
    cell = [jnp.floor(x).astype(jnp.int32) for x in g]
    frac = [x - jnp.floor(x) for x in g]
    flat = cell[0]
    for d in range(1, ndim):
        flat = flat * shape[d] + cell[d]
    order = jnp.argsort(flat, stable=True)
    flat_s = flat[order]
    # rank within equal-cell runs
    n = pos.shape[0]
    i = jnp.arange(n)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), flat_s[1:] != flat_s[:-1]])
    start = jax.lax.cummax(jnp.where(is_start, i, 0))
    rank = i - start
    size = int(np.prod(shape))
    target = rank * size + flat_s
    ok = rank < nslots
    overflow = jnp.sum(jnp.where(~ok, 1, 0))
    target = jnp.where(ok, target, nslots * size)
    dfields = []
    vflat = jnp.zeros((nslots * size + 1,), dtype).at[target].set(
        1.0, mode='drop')
    for d in range(ndim):
        f = jnp.zeros((nslots * size + 1,), dtype).at[target].set(
            frac[d][order], mode='drop')
        dfields.append(f[:-1].reshape((nslots,) + shape))
    valid = vflat[:-1].reshape((nslots,) + shape)
    bad = jnp.where(overflow > 0, jnp.nan, 0.0).astype(dtype)
    dslots = tuple(
        tuple(dfields[d][k] + bad for d in range(ndim))
        for k in range(nslots))
    vslots = tuple(valid[k] for k in range(nslots))
    return dslots, vslots, overflow
