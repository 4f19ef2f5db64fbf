"""Physics-level bf16 validation (VERDICT round-1 weak item 2).

Runs a short FastPM lattice integration twice — f32-exact MXU FFTs vs
bf16 MXU matmuls — and compares the FINAL power spectra, not just a
single force evaluation.  Run on the real TPU:

    python tools/validate_bf16.py [N]

Recorded result (2026-08-17, TPU v5e, N=128, 8 steps a=0.2->0.5):
max |P_bf16/P_f32 - 1| = 1.05e-3, mean 7.2e-4 — the bf16 FFT error
accumulates to the ~1e-3 level over a short integration.  This is
why the benchmark HEADLINE is the f32-exact configuration; bf16 is
an opt-in preview mode.  The script's bar (2e-3) flags regressions
beyond the recorded level.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  "/tmp/pmesh_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from pmesh_tpu import ParticleMesh
from pmesh_tpu.models.fastpm import Solver
from pmesh_tpu.models.powerspectrum import EHPower
from pmesh_tpu.models.cosmology import Planck15
from pmesh_tpu.ops import gridpm as gp
from pmesh_tpu.ops.power import fftpower


def main(N=256):
    pm = ParticleMesh(Nmesh=[N] * 3, BoxSize=float(N), dtype='f4',
                      resampler='cic')
    solver = Solver(pm)
    power = EHPower(Planck15, redshift=0.0)
    from pmesh_tpu import whitenoise as _wn
    from pmesh_tpu.pm import TransposedComplexField
    cshape, cdtype = pm._shape_dtype(TransposedComplexField)

    # IC generation runs on the host CPU backend: eager complex
    # dispatch is UNIMPLEMENTED through the axon tunnel (see
    # .claude/skills/verify), and the LPT scalars are host math
    cpu = jax.devices('cpu')[0]
    with jax.default_device(cpu):
        pm_cpu = ParticleMesh(Nmesh=[N] * 3, BoxSize=float(N),
                              dtype='f4', resampler='cic')
        solver_cpu = Solver(pm_cpu)
        wn = _wn.generate(tuple(int(n) for n in pm.Nmesh),
                          cshape, 100, False, dtype=cdtype,
                          compat='native')
        gauss = pm_cpu.create(type='complex', value=wn)

        def convolve(k, v):
            kmag = k.normp(2, zeromode=1.0) ** 0.5
            ampl = (power(kmag) / pm_cpu.BoxSize.prod()) ** 0.5
            return jnp.where(kmag > 0, v * ampl, 0)
        dlin = gauss.apply(convolve)
        disp, vel = solver_cpu.lpt_lattice(dlin, a0=0.2, shift=0.5,
                                           order=2)
    dev = jax.devices()[0]
    disp = tuple(jax.device_put(np.asarray(d), dev) for d in disp)
    vel = tuple(jax.device_put(np.asarray(v), dev) for v in vel)
    steps = np.linspace(0.2, 0.5, 9)
    bounds = (-2.0, 3.0)

    def run(fft):
        S, V = solver.nbody_lattice(disp, vel, steps, bounds=bounds,
                                    fft=fft)

        @jax.jit
        def pk(S):
            rho = gp.paint_grid(S, bounds=bounds)
            return fftpower(pm.create(type='real', value=rho),
                            Nbins=40)
        k, p, nmodes = pk(S)
        return np.asarray(k), np.asarray(p)

    k, p32 = run('mxu')
    sel = None
    for mode, bar in (('mxu_bf16', 2e-3), ('mxu_bf16s', 2e-3)):
        # mxu_bf16: bf16 DFT matmuls end to end (preview mode).
        # mxu_bf16s: f32 matmuls, bf16 inter-pass spectrum STORAGE —
        # the halved-HBM/halved-ICI production option; its drift
        # budget must be quantified over a real integration, not
        # just the per-mode rounding test (tests/test_fft_mxu.py).
        _, pbf = run(mode)
        sel = np.isfinite(p32) & (p32 > 0)
        rel = np.abs(pbf[sel] / p32[sel] - 1.0)
        print("[%s] k range: %.3g .. %.3g"
              % (mode, k[sel].min(), k[sel].max()))
        print("[%s] max |P/P_f32 - 1| = %.3e" % (mode, rel.max()))
        print("[%s] mean = %.3e" % (mode, rel.mean()))
        assert rel.max() < bar, (
            "%s P(k) drift %.3e beyond the %.0e bar"
            % (mode, rel.max(), bar))
    print("bf16 P(k) validation PASSED")


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
