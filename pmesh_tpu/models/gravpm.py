"""PM gravity N-body driver (CLI).

Rebuild of the reference driver stack nbody/gravpm.py:138-207 +
nbody/qpm.py (KDK loop) + nbody/genic.py (grid ICs): generates 2LPT
initial conditions from a linear power spectrum, runs the FastPM
leapfrog, measures P(k) at requested snapshot times, and writes
snapshots.  Snapshot IO uses numpy .npz (optionally orbax for sharded
checkpoints, utils/checkpoint.py) instead of bigfile.

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

__all__ = ["main", "run_sim"]


def run_sim(nmesh=64, boxsize=256.0, boost=2, resampler='tsc',
            seed=120577, ainit=0.1, afinal=1.0, steps=10, order=2,
            unitary=True, compat='native', dtype='f8',
            snapshot_times=(), output=None, monitor_print=True,
            procmesh=None):
    """Run the full IC -> N-body -> P(k) pipeline; returns the final
    state and the list of measured spectra."""
    pm = ParticleMesh(BoxSize=boxsize, Nmesh=[nmesh] * 3,
                      resampler=resampler, dtype=dtype,
                      procmesh=procmesh)
    solver = Solver(pm, Planck15, B=boost, force_resampler=resampler)
    power = EHPower(Planck15, redshift=0.0)

    dlin = solver.linear_field(power, seed=seed, unitary=unitary,
                               compat=compat)
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
                            np.asarray(p))

    def monitor(a, state):
        for tm in list(snapshot_times):
            if abs(a - tm) < 1e-9 or (snapshot_times and a >= tm):
                measure(a, state)
                snapshot_times.remove(tm)

    use_monitor = monitor if snapshot_times else None
    state = solver.nbody(state, time_steps, factors='fastpm',
                         scheme='symp2', monitor=use_monitor)
    measure(afinal, state)
    return state, spectra


def _write_snapshot(output, a, state, k, p):
    os.makedirs(output, exist_ok=True)
    fn = os.path.join(output, "snapshot_a%.4f.npz" % a)
    np.savez(fn,
             a=a,
             Position=np.asarray(state.X),
             Velocity=np.asarray(state.V),
             ID=np.arange(state.Q.shape[0]),
             k=k, power=p)
    print("wrote", fn)


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
    ns = ap.parse_args(argv)

    state, spectra = run_sim(
        nmesh=ns.nmesh, boxsize=ns.boxsize, boost=ns.boost,
        resampler=ns.resampler, seed=ns.seed, ainit=ns.ainit,
        afinal=ns.afinal, steps=ns.steps, order=ns.order,
        compat=ns.compat, dtype=ns.dtype,
        snapshot_times=ns.snapshot_times, output=ns.output)
    return state, spectra


if __name__ == '__main__':
    main()
