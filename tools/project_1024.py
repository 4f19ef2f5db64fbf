"""1024^3 v5e-8 step projection from measured per-chip kernels.

Multi-chip hardware is not reachable from this environment, so the
8-chip 1024^3 step is projected by TIMING THE ACTUAL PER-CHIP WORK
of the sharded pipeline on one real chip — the exact shapes each of
the 8 devices executes under shard_map:

  paint:    paint_fused_ext on a (128[+nv], 1024, 1024) slab
  fwd FFT:  _zy_fwd_half_call (128, 1024, 1024) -> (128, 1024, 513)
            + _xpass_half_call (1024, 128, 513)     [x2 per triple]
  inverse:  _zy_inv_half_call (128, 1024, 513) -> real   [x3]
  readout:  readout_fused_ext per force mesh          [x3]

plus 4 all_to_all pencil transposes (2 per x-pass pair) estimated
from the per-chip payload at an assumed ICI effective bandwidth —
stated explicitly, NOT measured.

Run on the TPU:  python tools/project_1024.py
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  "/tmp/pmesh_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import functools

from pmesh_tpu.ops import fft_mxu as fm
from pmesh_tpu.ops import gridpm_pallas as gpp

ROWS, N1, N2 = 128, 1024, 1024
# 128-aligned split-Nyquist width (the ct2 pipeline); the dense
# Zh=513 kernels compile pathologically slowly remotely at this size
Zh = N2 // 2


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]
                         .reshape(-1)[:8]))


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(fn(*args))
    dt = (time.perf_counter() - t0) / reps * 1000
    print("%-38s %8.2f ms" % (name, dt), flush=True)
    return dt


def main():
    key = jax.random.key(0)
    ks = jax.random.split(key, 4)
    slab = jax.random.normal(ks[0], (ROWS, N1, N2), jnp.float32)
    disp = tuple(0.05 + 1.9 * jax.random.uniform(
        k, (ROWS, N1, N2), dtype=jnp.float32) for k in ks[1:4])
    # paint: bounds (0,2) -> vmin 0, vmax 2 -> ext rows +2
    vmin, vmax = 0, 2

    @jax.jit
    def paint(disp):
        exts = tuple(jnp.concatenate([d[-2:], d], 0) for d in disp)
        return gpp.paint_fused_ext(exts, 1.0, vmin, vmax, 'cic',
                                   nrows=ROWS)
    t_paint = timeit("paint slab (128+2,1024^2)", paint, disp)

    # the ct2 pipeline per-chip stages (the production sharded path)
    wz = fm._dft_half_np(N2, Zh)
    wy = fm._ct_fwd_mats_np(N1)
    wx = fm._ct_fwd_mats_np(1024)

    @jax.jit
    def zyfwd(x):
        return fm._zy_fwd_ct2_call(x, N2, Zh, wz, wy, None)
    t_zy = timeit("fwd zy ct2 pass (slab)", zyfwd, slab)

    spec = jax.random.normal(ks[0], (1024, ROWS, Zh), jnp.float32)

    @jax.jit
    def xpass(r, i):
        return fm._xct_call(r, i, wx, 1.0, None)
    t_x = timeit("x ct pass (1024,128,512)", xpass, spec, spec)

    wyi = fm._ct_inv_mats_np(N1)
    A_p, B_p = fm._irfft_mats_np(N2, Zh, nyquist_last=False)
    half = jax.random.normal(ks[1], (ROWS, N1, Zh), jnp.float32)

    @jax.jit
    def zyinv(r, i):
        return fm._zy_inv_ct2_call(r, i, wyi, (A_p, B_p), N2, None)
    t_zyi = timeit("inv zy ct2 pass (slab)", zyinv, half, half)

    mesh = jax.random.normal(ks[2], (ROWS + 2, N1, N2), jnp.float32)

    @jax.jit
    def readout(mesh, disp):
        return gpp.readout_fused_ext((mesh,), disp, vmin, vmax,
                                     'cic')[0]
    t_ro = timeit("readout slab (1 mesh)", readout, mesh, disp)

    # pipeline totals: fwd = zy + x; triple = 2 x-passes + 3 zy-inv;
    # readout x3
    compute = (t_paint + t_zy + t_x
               + 2 * t_x + 3 * t_zyi + 3 * t_ro)
    # 4 all_to_alls (2 per x-pass boundary), per-chip payload:
    # (128, 1024, 513) f32 x2 (r,i) x 7/8 leaves the chip
    payload = 2 * ROWS * N1 * Zh * 4 * 7 / 8 / 1e9   # GB
    for bw in (50, 100, 200):
        t_a2a = 4 * payload / bw * 1000
        print("a2a @ %3d GB/s eff: 4 x %.2f GB -> %6.1f ms  |  "
              "TOTAL %7.1f ms" % (bw, payload, t_a2a,
                                  compute + t_a2a), flush=True)
    print("per-chip compute only: %.1f ms" % compute)


if __name__ == '__main__':
    main()
