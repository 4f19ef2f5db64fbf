"""PM gravity N-body driver (CLI).

Rebuild of the reference driver stack nbody/gravpm.py:138-207 +
nbody/qpm.py (KDK loop) + nbody/genic.py (grid ICs): generates 2LPT
initial conditions from a linear power spectrum, runs the FastPM
leapfrog, measures P(k) at requested snapshot times, and writes
snapshots.  Snapshot IO: bigfile (the reference ecosystem container,
utils/bigfile.py, reference gravpm.py:23-31) or numpy .npz
(--format npz; orbax for sharded checkpoints via
utils/checkpoint.py).  ICs can be read back from any bigfile Gadget
snapshot with :func:`read_ic` (reference gravpm.py:89-109).

Run:  python -m pmesh_tpu.models.gravpm --nmesh 64 --boost 2 \
          --steps 10 --output /tmp/run
"""
import os
from argparse import ArgumentParser

import numpy as np
import jax.numpy as jnp

from ..pm import ParticleMesh
from ..ops.power import fftpower
from .cosmology import Planck15
from .powerspectrum import EHPower
from .fastpm import Solver

__all__ = ["main", "run_sim", "read_ic"]


def run_sim(nmesh=64, boxsize=256.0, boost=2, resampler='tsc',
            seed=120577, ainit=0.1, afinal=1.0, steps=10, order=2,
            unitary=True, compat='native', dtype='f8',
            snapshot_times=(), output=None, monitor_print=True,
            procmesh=None, lattice=False, fft='xla',
            force_mode='spectral', snapshot_format='bigfile'):
    """Run the full IC -> N-body -> P(k) pipeline; returns the final
    state and the list of measured spectra.

    lattice=True uses the mesh-shaped fast path (ops/gridpm.py):
    requires boost=1; displacement bounds are estimated from the LPT
    amplitude scaled by linear growth to afinal with a 30% margin
    (validated after the run).  fft selects the transform backend for
    the lattice force ('xla', 'mxu', 'mxu_bf16', 'mxu_bf16s'; see
    Solver.force_lattice).
    """
    if lattice and boost != 1:
        raise ValueError("lattice=True requires boost=1 (the force "
                         "mesh must equal the particle lattice)")
    if force_mode not in ('spectral', 'gradient'):
        raise ValueError("force_mode must be 'spectral' or "
                         "'gradient', got %r" % (force_mode,))
    pm = ParticleMesh(BoxSize=boxsize, Nmesh=[nmesh] * 3,
                      resampler=resampler, dtype=dtype,
                      procmesh=procmesh)
    solver = Solver(pm, Planck15, B=boost, force_resampler=resampler)
    power = EHPower(Planck15, redshift=0.0)

    dlin = solver.linear_field(power, seed=seed, unitary=unitary,
                               compat=compat)
    if lattice:
        return _run_lattice(pm, solver, dlin, ainit, afinal, steps,
                            order, snapshot_times, output,
                            monitor_print, fft, force_mode)
    state = solver.lpt(dlin, a0=ainit, order=order, shift=0.0)

    time_steps = np.linspace(ainit, afinal, steps, endpoint=True)
    spectra = []
    snapshot_times = sorted(snapshot_times)

    def measure(a, state):
        rho = pm.paint(state.X)
        k, p, n = fftpower(
            rho, Nbins=nmesh // 4,
            remove_shotnoise=float(np.prod(pm.BoxSize)) / state.Q.shape[0])
        spectra.append((a, np.asarray(k), np.asarray(p)))
        if monitor_print:
            print("a = %.3f   P(k~%.3g) = %.5g" % (a, k[1], p[1]))
        if output is not None:
            _write_snapshot(output, a, state, np.asarray(k),
                            np.asarray(p), pm,
                            fmt=snapshot_format)

    measured = set()

    def monitor(a, state):
        due = [tm for tm in snapshot_times if a >= tm - 1e-9]
        if due:
            # one measurement per crossing, however many marks it
            # passed; tag by the scale factor actually measured
            measure(a, state)
            measured.add(round(float(a), 12))
            for tm in due:
                snapshot_times.remove(tm)

    use_monitor = monitor if snapshot_times else None
    state = solver.nbody(state, time_steps, factors='fastpm',
                         scheme='symp2', monitor=use_monitor,
                         force_mode=force_mode)
    if round(float(afinal), 12) not in measured:
        measure(afinal, state)
    return state, spectra


def _run_lattice(pm, solver, dlin, ainit, afinal, steps, order,
                 snapshot_times, output, monitor_print, fft='xla',
                 force_mode='spectral'):
    """The lattice-form run: mesh-shaped SoA state, shift-sum
    paint/readout, snapshots via segmented nbody_lattice calls."""
    import jax
    from ..ops import gridpm
    from ..ops.power import fftpower as _fftpower

    nmesh = int(pm.Nmesh[0])
    cell = float(pm.BoxSize[0]) / nmesh
    disp, vel = solver.lpt_lattice(dlin, a0=ainit, order=order)

    # displacement bound: the LPT amplitude grown linearly to afinal
    # plus a 30% quasilinear margin (validated after the run).  Use
    # the symmetric amplitude so a one-sided initial distribution
    # (e.g. all-positive displacements) still widens in BOTH
    # directions instead of shrinking the near-zero side.
    pt = solver.cosmology
    lo, hi = gridpm.displacement_bounds(disp)
    grow = float(pt.D1(afinal)) / float(pt.D1(ainit))
    amp = max(abs(float(lo)), abs(float(hi))) * 1.3 * grow
    bounds = (min(float(lo), -amp), max(float(hi), amp))

    spectra = []

    pmh = (pm.procmesh if pm.procmesh is not None
           and pm.procmesh.size > 1 else None)

    def measure(a, disp):
        rho = gridpm.paint_grid(disp, bounds=bounds,
                                window=pm.resampler.window.kind,
                                procmesh=pmh)
        field = pm.create(type='real', value=rho)
        k, p, n = _fftpower(field, Nbins=nmesh // 4,
                            remove_shotnoise=float(
                                np.prod(pm.BoxSize)) / nmesh ** 3)
        spectra.append((a, np.asarray(k), np.asarray(p)))
        if monitor_print:
            print("a = %.3f   P(k~%.3g) = %.5g" % (a, k[1], p[1]))
        if output is not None:
            _write_lattice_snapshot(output, a, disp, vel, cell,
                                    np.asarray(k), np.asarray(p))

    # snapshot marks before ainit cannot be reached by a forward
    # integration — ignore them; a mark AT ainit measures the ICs
    marks = sorted(set(
        [t for t in snapshot_times
         if ainit - 1e-12 <= t <= afinal + 1e-12] + [afinal]))
    all_steps = np.linspace(ainit, afinal, steps, endpoint=True)
    a0 = ainit
    for am in marks:
        seg = [a for a in all_steps if a0 - 1e-12 < a <= am + 1e-12]
        seg = sorted(set([a0] + seg + [am]))
        if len(seg) >= 2:
            disp, vel = solver.nbody_lattice(disp, vel, seg, bounds,
                                             force_mode=force_mode,
                                             fft=fft)
        measure(am, disp)
        a0 = am
    # bound-overflow warnings are emitted per segment by
    # nbody_lattice (which tracks the run-wide extremes)
    return (disp, vel), spectra


def _write_lattice_snapshot(output, a, disp, vel, cell, k, p):
    os.makedirs(output, exist_ok=True)
    fn = os.path.join(output, "snapshot_a%.4f.npz" % a)
    n = disp[0].shape[0]
    np.savez(fn, a=a,
             DispX=np.asarray(disp[0]), DispY=np.asarray(disp[1]),
             DispZ=np.asarray(disp[2]),
             VelX=np.asarray(vel[0]), VelY=np.asarray(vel[1]),
             VelZ=np.asarray(vel[2]), cell=cell, k=k, power=p)
    print("wrote", fn)


def _write_snapshot(output, a, state, k, p, pm=None,
                    fmt='bigfile'):
    os.makedirs(output, exist_ok=True)
    if fmt == 'npz':
        fn = os.path.join(output, "snapshot_a%.4f.npz" % a)
        np.savez(fn, a=a,
                 Position=np.asarray(state.X),
                 Velocity=np.asarray(state.V),
                 ID=np.arange(state.Q.shape[0]),
                 k=k, power=p)
        print("wrote", fn)
        return
    # bigfile snapshot with the reference's Gadget layout: particle
    # type 1 blocks + a root header block (reference gravpm.py:23-31)
    from ..utils import bigfile as _bf
    fn = os.path.join(output, "snapshot_a%.4f" % a)
    n = state.Q.shape[0]
    attrs = {'Time': float(a), 'TotNumPart':
             np.array([0, n, 0, 0, 0, 0], dtype='i8')}
    if pm is not None:
        attrs['BoxSize'] = float(pm.BoxSize[0])
    _bf.write_block(fn, 'header', data=None, attrs=attrs)
    _bf.write_block(fn, '1/Position', np.asarray(state.X))
    _bf.write_block(fn, '1/Velocity', np.asarray(state.V))
    _bf.write_block(fn, '1/ID',
                    np.arange(n, dtype='i8'))
    _bf.write_block(fn, 'PowerSpectrum/k', np.asarray(k))
    _bf.write_block(fn, 'PowerSpectrum/P', np.asarray(p))
    print("wrote", fn)


def read_ic(path, ptype=1):
    """Read Position/Velocity/ID from a bigfile Gadget snapshot (the
    reference's IC ingestion, gravpm.py:89-109).  Returns
    (pos, vel, ids, attrs)."""
    from ..utils import bigfile as _bf
    f = _bf.BigFile(path)
    prefix = '%d/' % ptype
    pos = f[prefix + 'Position'].read()
    vel = (f[prefix + 'Velocity'].read()
           if prefix + 'Velocity' in f else None)
    ids = (f[prefix + 'ID'].read()
           if prefix + 'ID' in f else None)
    return pos, vel, ids, f.attrs


def main(argv=None):
    ap = ArgumentParser(description="FastPM gravity N-body driver")
    ap.add_argument("--nmesh", type=int, default=64,
                    help="particle grid per side")
    ap.add_argument("--boxsize", type=float, default=256.0)
    ap.add_argument("--boost", type=int, default=2,
                    help="force mesh boost factor")
    ap.add_argument("--resampler", type=str, default='tsc')
    ap.add_argument("--seed", type=int, default=120577)
    ap.add_argument("--ainit", type=float, default=0.1)
    ap.add_argument("--afinal", type=float, default=1.0)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--order", type=int, default=2, choices=[1, 2],
                    help="LPT order of the ICs")
    ap.add_argument("--compat", type=str, default='native',
                    choices=['native', 'gadget'],
                    help="whitenoise stream")
    ap.add_argument("--dtype", type=str, default='f8')
    ap.add_argument("--snapshot-times", type=float, nargs='*',
                    default=[])
    ap.add_argument("--output", type=str, default=None)
    ap.add_argument("--lattice", action='store_true',
                    help="mesh-shaped fast path (requires --boost 1)")
    ap.add_argument("--fft", type=str, default='xla',
                    choices=['xla', 'mxu', 'mxu_bf16', 'mxu_bf16s'],
                    help="transform backend for the lattice force")
    ap.add_argument("--force-mode", type=str, default='spectral',
                    choices=['spectral', 'gradient'],
                    help="force family: 3 spectral inverses, or one "
                         "Poisson inverse + derivative-window "
                         "readouts (the QPM route)")
    ap.add_argument("--format", type=str, default='bigfile',
                    choices=['bigfile', 'npz'],
                    help="snapshot container format")
    ns = ap.parse_args(argv)

    state, spectra = run_sim(
        nmesh=ns.nmesh, boxsize=ns.boxsize, boost=ns.boost,
        resampler=ns.resampler, seed=ns.seed, ainit=ns.ainit,
        afinal=ns.afinal, steps=ns.steps, order=ns.order,
        compat=ns.compat, dtype=ns.dtype,
        snapshot_times=ns.snapshot_times, output=ns.output,
        lattice=ns.lattice, fft=ns.fft, force_mode=ns.force_mode,
        snapshot_format=ns.format)
    return state, spectra


if __name__ == '__main__':
    main()
