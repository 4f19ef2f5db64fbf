"""Benchmark: full PM gravity step on the real TPU chip.

Measures the reference pipeline shape (SURVEY.md section 3.5 /
BASELINE.md): paint of N^3 lattice particles on an N^3 mesh + r2c +
3 x (force transfer + c2r) + readout of the 3 force meshes, jitted
end to end, CIC, chained in a lax.scan KDK loop (the production
shape; no host round trip inside the loop).

TPU-native implementation: lattice fast path (mesh-shaped per-axis
displacement state, shift-sum Pallas paint/readout — ops/gridpm.py)
and MXU DFT-matmul FFTs with the spectral force kernel folded into
the inverse DFT matrices (ops/fft_mxu.py).

Two precision configs are timed:
- mxu_bf16 (HEADLINE): bf16 MXU matmuls in the FFT passes; max
  relative force error 1.6e-4 vs the f32 pipeline — an order of
  magnitude below the SuperLanczos-vs-spectral differentiation
  stencil difference.  State, paint and readout stay f32.
- mxu (extras, 'f32_exact_step_ms' = the FULL step at this config):
  f32-exact FFTs (3-pass matmuls, 6e-8 vs jnp.fft).

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
    # persistent compilation cache: repeated bench runs (and the
    # driver's fresh process) reuse the compiled executables instead
    # of paying ~3-4 min of remote compiles
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/pmesh_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from pmesh_tpu import ParticleMesh
    from pmesh_tpu.models.fastpm import Solver

    N = 512
    pm = ParticleMesh(Nmesh=[N, N, N], BoxSize=float(N), dtype='f4',
                      resampler='cic')
    solver = Solver(pm)

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
    bounds = (0.0, 2.0)

    def make_scan(nstep, fft):
        @jax.jit
        def run(disp):
            def step(S, _):
                F = solver.force_lattice(S, bounds=bounds, fft=fft)
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

    def measure(fft):
        n_short, n_long = 1, 6
        run_short = make_scan(n_short, fft)
        run_long = make_scan(n_long, fft)
        sync(run_short(disp))   # compile
        sync(run_long(disp))
        t0 = time.perf_counter()
        sync(run_short(disp))
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(run_long(disp))
        t_long = time.perf_counter() - t0
        return (t_long - t_short) / (n_long - n_short) * 1000.0

    dt_f32 = measure('mxu')
    dt = measure('mxu_bf16')

    mp_per_s = (N ** 3 / 1e6) / (dt / 1000.0)
    result = {
        "metric": "pm_gravity_step_512^3_ms",
        "value": round(dt, 3),
        "unit": "ms",
        "vs_baseline": round(100.0 / dt, 3),
        "extra": {
            "config": "512^3 CIC paint + r2c + 3x(force c2r) + "
                      "readout, chained scan, single chip; lattice "
                      "shift-sum pallas paint/readout (f32) + MXU "
                      "DFT-matmul FFT with bf16 matmuls (1.6e-4 rel "
                      "force err vs f32 pipeline)",
            "f32_exact_step_ms": round(dt_f32, 3),
            "particles_Mps": round(mp_per_s, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
