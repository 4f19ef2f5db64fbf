"""Benchmark: full PM gravity step on the real TPU chip.

Measures the reference pipeline shape (SURVEY.md section 3.5 /
BASELINE.md): CIC paint of N^3 particles on an N^3 mesh + r2c +
3 x (force transfer + c2r + readout), jitted end to end, f32.

The north-star target is the full 1024^3 step < 100 ms on v5e-8.
1024^3 on 8 chips is 512^3 of work per chip, so the single-chip
512^3 step time approximates the 8-chip 1024^3 step (modulo ICI
transposes); vs_baseline = 100 ms / measured.

Prints ONE JSON line.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from pmesh_tpu import ParticleMesh
    from pmesh_tpu.models.fastpm import Solver

    N = 512
    pm = ParticleMesh(Nmesh=[N, N, N], BoxSize=float(N), dtype='f4',
                      resampler='cic')
    solver = Solver(pm)

    # uniform grid + pseudo-random displacements, built on device;
    # 512^3 is close to the single-chip HBM capacity, so free every
    # intermediate before timing
    @jax.jit
    def make_positions():
        Q = pm.generate_uniform_particle_grid(shift=0.0).astype(
            jnp.float32)
        X = Q + 2.0 * jax.random.uniform(jax.random.key(0), Q.shape,
                                         dtype=jnp.float32)
        return jnp.remainder(X, float(N))

    X = make_positions()

    # staged execution: 512^3 + 512^3 particles is within ~1 GB of the
    # v5e HBM capacity in a single program; staging keeps each program
    # small (and matches how a memory-bound production config runs)
    force = solver.force_staged

    def sync(x):
        # block_until_ready alone is not reliable through the axon
        # tunnel; force a device->host transfer of a reduction
        return float(jnp.sum(x[:8]))

    # warmup / compile
    F = force(X)
    sync(F)
    del F

    nrep = 5
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(nrep):
        F = force(X)
        acc += sync(F)
        del F
    dt = (time.perf_counter() - t0) / nrep * 1000.0

    mp_per_s = (N ** 3 / 1e6) / (dt / 1000.0)
    result = {
        "metric": "pm_gravity_step_512^3_ms",
        "value": round(dt, 3),
        "unit": "ms",
        "vs_baseline": round(100.0 / dt, 3),
        "extra": {
            "config": "512^3 CIC paint + r2c + 3x(force c2r readout), "
                      "f32, single chip",
            "particles_Mps": round(mp_per_s, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
