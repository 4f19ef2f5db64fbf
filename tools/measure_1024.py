"""MEASURED single-chip 1024^3 PM lattice force step (bf16 state).

The f32 1024^3 state alone is 12 GB — it cannot fit a 16 GB chip next
to its force meshes, so the single-chip anchor stores the state and
inter-stage spectra in bf16 (storage-only; every matmul still runs
f32-accumulated in VMEM).  The production 8-chip config is f32 with
1.5 GB of state per chip; this run anchors the paint / FFT / readout
cost at the FULL 1024 extents with real HBM pressure, complementing
the per-chip slab-stage measurements of tools/tune_slab.py.

Chain-differenced timing (see tune_slab.py).  Prints the per-step ms.
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

from pmesh_tpu.ops import fft_mxu as fm
from pmesh_tpu.ops import gridpm_pallas as gpp

N = 1024
Zm = N // 2
BOUNDS = (0.0, 2.0)
VMIN, VMAX = 0, 2


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]
                         .reshape(-1)[:8]))


def kd_tab(n, cell=1.0):
    k = np.fft.fftfreq(n, d=cell) * 2 * np.pi
    w = k * cell
    return tuple((1 / (6 * cell) * (8 * np.sin(w)
                                    - np.sin(2 * w))).tolist())


def main():
    wz = fm._z_fwd_tabs(N, Zm)
    wyf = fm._ct_fwd_mats_np(N)
    wxf = fm._ct_fwd_mats_np(N)
    kdx = kd_tab(N)
    kdy = kd_tab(N)
    kz = np.fft.rfftfreq(N, d=1.0) * 2 * np.pi
    wzn = kz * 1.0
    kdz = tuple((1 / 6 * (8 * np.sin(wzn) - np.sin(2 * wzn))).tolist())
    wxi = fm._ct_inv_mats_np(N)
    wxg = fm._ct_inv_mats_np(N, fold_kvec=kdx)
    wyi = fm._ct_inv_mats_np(N)
    wyg = fm._ct_inv_mats_np(N, fold_kvec=kdy)
    ABp = fm._z_inv_tabs(N, Zm)
    ABg = fm._z_inv_tabs(N, Zm, grad_kvec=np.asarray(kdz))
    ks = [np.fft.fftfreq(N) * 2 * np.pi] * 2 + [kz]
    k2x = fm._ct_table(N, (ks[0] ** 2)).astype(np.float32)
    k2y = fm._ct_table(N, (ks[1] ** 2)).astype(np.float32)
    k2z = (ks[2][:Zm] ** 2).astype(np.float32)
    if fm._use_zct_fwd(N, Zm):
        k2z = fm._zct_table(N, k2z).astype(np.float32)

    bf16 = jnp.bfloat16

    def force(disp):
        rho = gpp.paint_fused_parts(disp, 1.0, VMIN, VMAX, 'cic')
        # bf16 STORAGE between every stage via out_dtype — the
        # kernels upcast at their refs and compute f32 (no separate
        # astype passes over the 2.1 GB intermediates)
        rb, ib, nq = fm._zy_fwd_ct2_call(rho, N, Zm, wz, wyf, None,
                                         out_dtype=bf16)
        rb, ib = fm._xct_call_multi(rb, ib, wxf, 1.0 / (N * N * N),
                                    None, out_dtype=bf16)
        outs = []
        for wxs, wys, AB in ((wxi, wyg, ABp), (wxi, wyi, ABg),
                             (wxg, wyi, ABp)):
            sr, si = fm._xct_call_multi(rb, ib, wxs, 1.0, None,
                                        inverse=True,
                                        k2=(k2x, k2y, k2z),
                                        out_dtype=bf16)
            mb = fm._zy_inv_ct2_call(sr, si, wys, AB, N, None,
                                     out_dtype=bf16)
            del sr, si
            val = gpp.readout_fused_parts((mb,), disp, VMIN, VMAX,
                                          'cic')[0]
            outs.append(jnp.sum(val.astype(jnp.float32)))
        return jnp.stack(outs)

    def make(L):
        @jax.jit
        def go(disp):
            def body(c, _):
                f = force(c)
                tie = (0.0 * f[0]).astype(c[0].dtype)
                return tuple(x + tie for x in c), None
            c, _ = jax.lax.scan(body, disp, None, length=L)
            return c[0]
        return go

    key = jax.random.key(0)
    kk = jax.random.split(key, 3)
    disp = tuple(
        (0.1 + 1.8 * jax.random.uniform(k, (N, N, N),
                                        dtype=jnp.float32))
        .astype(bf16) for k in kk)
    # two executables at once exhaust the 16 GB chip next to the
    # 6.4 GB state: time L=1 fully, FREE it, then time L=2
    # (chain-differenced across the two lives; compile time is
    # outside both timers)
    import gc
    g1 = make(1)
    print("compiling/running L=1 ...", flush=True)
    sync(g1(disp))
    t0 = time.perf_counter(); sync(g1(disp))
    ta = time.perf_counter() - t0
    del g1
    gc.collect()
    jax.clear_caches()
    g2 = make(2)
    print("compiling/running L=2 ...", flush=True)
    sync(g2(disp))
    t0 = time.perf_counter(); sync(g2(disp))
    tb = time.perf_counter() - t0
    dt = (tb - ta) / 1 * 1000
    print("pm_gravity_step_1024^3_single_chip_bf16_state_ms %.1f"
          % dt, flush=True)


if __name__ == '__main__':
    main()
