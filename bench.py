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
        # [0.05, 1.95) cells: strictly inside the (0, 2) bounds so the
        # tiny benchmark kicks cannot push a particle out of range
        return tuple(
            0.05 + 1.9 * jax.random.uniform(k, (N, N, N),
                                            dtype=jnp.float32)
            for k in ks)

    disp = make_disp(jax.random.key(0))

    # the production shape: a chained KDK loop (lax.scan) with one
    # force per step — no host round trip inside the loop.  Timing
    # two scan lengths and differencing removes the constant
    # dispatch + device->host sync latency of the axon tunnel.
    bounds = (0.0, 2.0)

    def make_scan(nstep):
        @jax.jit
        def run(disp):
            def step(S, _):
                # fft='mxu': DFT-matmul pallas FFT with the i*k_d
                # force kernel folded into the inverse DFT matrices;
                # matches the XLA-FFT path to f32 roundoff (7e-8)
                F = solver.force_lattice(S, bounds=bounds, fft='mxu')
                # tiny kick-drift so displacements stay in bounds
                S = tuple(s + 1e-6 * f for s, f in zip(S, F))
                return S, None
            S, _ = jax.lax.scan(step, disp, None, length=nstep)
            return S
        return run

    def sync(S):
        # block_until_ready alone is not reliable through the axon
        # tunnel; force a device->host transfer of a reduction
        return float(jnp.sum(S[0][0, 0, :8]))

    n_short, n_long = 1, 6
    run_short = make_scan(n_short)
    run_long = make_scan(n_long)
    sync(run_short(disp))   # compile
    sync(run_long(disp))

    t0 = time.perf_counter()
    sync(run_short(disp))
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(run_long(disp))
    t_long = time.perf_counter() - t0
    dt = (t_long - t_short) / (n_long - n_short) * 1000.0
    nrep = n_long - n_short

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
