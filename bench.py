"""Benchmark: full PM gravity step on the real TPU chip.

Measures the reference pipeline shape (SURVEY.md section 3.5 /
BASELINE.md): paint of N^3 lattice particles on an N^3 mesh + r2c +
3 x (force transfer + c2r) + readout of the 3 force meshes, jitted
end to end, f32, CIC.

The particle state is lattice-form (per-axis mesh-shaped
displacements, models/fastpm.py force_lattice), so paint/readout run
as dense shift-sums (ops/gridpm.py) with no scatter/gather — the
TPU-native formulation.  Positions are NEVER materialized as (M, 3)
arrays (a (134e6, 3) f32 array tiles to T(8,128) on TPU = 42x HBM
padding).

The north-star target is the full 1024^3 step < 100 ms on v5e-8.
1024^3 on 8 chips is 512^3 of work per chip, so the single-chip
512^3 step time approximates the 8-chip 1024^3 step (modulo ICI
transposes); vs_baseline = 100 ms / measured.

Prints ONE JSON line.
"""
import json
import time


def main():
    import jax
    import jax.numpy as jnp
    from pmesh_tpu import ParticleMesh
    from pmesh_tpu.models.fastpm import Solver

    N = 512
    pm = ParticleMesh(Nmesh=[N, N, N], BoxSize=float(N), dtype='f4',
                      resampler='cic')
    solver = Solver(pm)

    # mesh-shaped displacement fields: uniform in [0, 2) cells
    @jax.jit
    def make_disp(key):
        ks = jax.random.split(key, 3)
        return tuple(
            2.0 * jax.random.uniform(k, (N, N, N), dtype=jnp.float32)
            for k in ks)

    disp = make_disp(jax.random.key(0))

    force = jax.jit(lambda d: solver.force_lattice(d, bounds=(0.0, 2.0)))

    def sync(F):
        # block_until_ready alone is not reliable through the axon
        # tunnel; force a device->host transfer of a reduction
        return float(jnp.sum(F[0][0, 0, :8]))

    # warmup / compile
    F = force(disp)
    sync(F)
    del F

    nrep = 5
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(nrep):
        F = force(disp)
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
            "config": "512^3 CIC paint + r2c + 3x(force c2r) + "
                      "readout, f32, single chip, lattice fast path",
            "particles_Mps": round(mp_per_s, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
