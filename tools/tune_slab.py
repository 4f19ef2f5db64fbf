"""Per-shape kernel tuning for the 1024^3 v5e-8 slab stages.

METHODOLOGY: every number is a CHAIN-DIFFERENCED per-iteration time —
the stage runs L1 and L2 times inside one jitted lax.scan (with a
data dependency threaded through the carry) and the cost is
(t_L2 - t_L1) / (L2 - L1).  Per-call timing through the axon tunnel
carries ~30 ms of fixed dispatch/sync overhead (measured: a single
0.54 GB elementwise add "costs" 35 ms per call but ~2 ms differenced),
which round-2's projection mistook for slab-shape kernel inefficiency.

Run:  python tools/tune_slab.py [hbm|zy|x|zyi|ro|paint|pipe|all]
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

ROWS, N1, N2 = 128, 1024, 1024
Zm = N2 // 2
L1, L2 = 1, 5


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]
                         .reshape(-1)[:8]))


def bench(name, fn, x):
    """fn: carry -> pytree; x: the carried input (array or tuple of
    arrays).  EVERY large array fn touches must ride the carry — a
    closed-over device array is embedded into the HLO as a literal
    constant and a 0.5 GB literal wedges the remote compile service
    (memory: const-only jit / tpu-bench-protocol).  Returns the
    chain-differenced per-iteration ms."""
    tup = isinstance(x, tuple)

    def make(L):
        @jax.jit
        def go(x):
            def body(c, _):
                out = fn(c)
                leaf = jax.tree_util.tree_leaves(out)[0]
                tie = jnp.sum(leaf.reshape(-1)[:8])
                if tup:
                    c0 = c[0] + (0.0 * tie).astype(c[0].dtype)
                    return (c0,) + tuple(c[1:]), None
                return c + (0.0 * tie).astype(c.dtype), None
            c, _ = jax.lax.scan(body, x, None, length=L)
            return c
        return go
    try:
        g1, g2 = make(L1), make(L2)
        sync(g1(x)); sync(g2(x))
        t0 = time.perf_counter(); sync(g1(x))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter(); sync(g2(x))
        tb = time.perf_counter() - t0
        dt = (tb - ta) / (L2 - L1) * 1000
        print("%-46s %8.2f ms" % (name, dt), flush=True)
        return dt
    except Exception as e:
        print("%-46s FAILED: %s" % (name, str(e)[:110]), flush=True)
        return None


def data(key=0):
    ks = jax.random.split(jax.random.key(key), 4)
    slab = jax.random.normal(ks[0], (ROWS, N1, N2), jnp.float32)
    spec = jax.random.normal(ks[1], (N1, ROWS, Zm), jnp.float32)
    half = jax.random.normal(ks[2], (ROWS, N1, Zm), jnp.float32)
    return slab, spec, half, ks[3]


def kd_tabs():
    cell = 1.0
    kd = []
    for n in (ROWS * 8, N1, N2):
        k = np.fft.fftfreq(n, d=cell) * 2 * np.pi
        w = k * cell
        kd.append(tuple((1 / 6 * (8 * np.sin(w)
                                  - np.sin(2 * w))).tolist()))
    kz = np.fft.rfftfreq(N2, d=cell) * 2 * np.pi
    wz = kz * cell
    kd[2] = tuple((1 / 6 * (8 * np.sin(wz) - np.sin(2 * wz))).tolist())
    return kd


def sweep_hbm():
    slab, spec, _, _ = data()
    for name, arr in (("slab 0.54GB", slab), ("spec 0.27GB", spec)):
        dt = bench("hbm add %s" % name, lambda c: c + 1.0, arr)
        if dt:
            gb = arr.size * 4 * 2 / 1e9
            print("   -> %.0f GB/s effective" % (gb / dt * 1000),
                  flush=True)


def sweep_zy():
    slab, _, _, _ = data()
    for zkind in ('zct', 'dense'):
        for radix in (8, 4):
            for bx in (1, 2, 4, 8):
                fm.TUNE.clear()
                fm.TUNE['radix:1024'] = radix
                fm.TUNE['bx:%dx%dx%d' % (ROWS, N1, Zm)] = bx
                wz = (fm._zct_fwd_mats_np(N2) if zkind == 'zct'
                      else fm._dft_half_np(N2, Zm))
                wy = fm._ct_fwd_mats_np(N1)
                bench("zy_fwd %s R=%d BX=%d" % (zkind, radix, bx),
                      lambda c: fm._zy_fwd_ct2_call(c, N2, Zm, wz,
                                                    wy, None), slab)
    fm.TUNE.clear()


def sweep_x():
    _, spec, _, _ = data()
    cfgs = [
        dict(tag="flat r8 4MB", radix=8, flat=True, ref=4),
        dict(tag="noflat r8 4MB", radix=8, flat=False, ref=4),
        dict(tag="flat r4 4MB", radix=4, flat=True, ref=4),
        dict(tag="flat r8 4MB by16", radix=8, flat=True, ref=4,
             by=16),
        dict(tag="flat r8 8MB", radix=8, flat=True, ref=8),
    ]
    for c in cfgs:
        fm.TUNE.clear()
        fm.TUNE['radix:1024'] = c['radix']
        fm.TUNE['xct_flat'] = c['flat']
        fm.TUNE['xct_ref_bytes'] = c['ref'] * 1024 * 1024
        if 'by' in c:
            fm.TUNE['xct_by'] = c['by']
        wx = fm._ct_inv_mats_np(N1)
        bench("xct inv %s" % c['tag'],
              lambda z: fm._xct_call_multi(z, z, wx, 1.0, None,
                                           inverse=True), spec)
    for tag, dual, k2 in (("dual", True, False),
                          ("dual+k2", True, True),
                          ("single+k2", False, True)):
        fm.TUNE.clear()
        wx = fm._ct_inv_mats_np(N1)
        wxg = fm._ct_inv_mats_np(N1, fold_kvec=tuple(
            np.sin(np.arange(N1) / N1).tolist()))
        k2t = None
        if k2:
            k2t = (np.arange(N1, dtype=np.float32) + 1.0,
                   np.arange(ROWS, dtype=np.float32) + 1.0,
                   np.arange(Zm, dtype=np.float32) + 1.0)
        bench("xct inv %s" % tag,
              lambda z: fm._xct_call_multi(
                  z, z, wx, 1.0, None, inverse=True,
                  wx2=wxg if dual else None, k2=k2t), spec)
    fm.TUNE.clear()


def sweep_zyi():
    _, _, half, _ = data()
    for zkind in ('zct', 'dense'):
        for radix in (8, 4):
            for bx in (1, 2, 4):
                fm.TUNE.clear()
                fm.TUNE['radix:1024'] = radix
                fm.TUNE['bx:%dx%dx%d' % (ROWS, N1, Zm)] = bx
                wyi = fm._ct_inv_mats_np(N1)
                AB = (fm._zct_inv_mats_np(N2) if zkind == 'zct' else
                      fm._irfft_mats_np(N2, Zm, nyquist_last=False))
                bench("zy_inv %s R=%d BX=%d" % (zkind, radix, bx),
                      lambda c: fm._zy_inv_ct2_call(c, c, wyi, AB,
                                                    N2, None), half)
    # dual (fy+fz from one read) vs 2x single
    for zkind in ('zct', 'dense'):
        for bx in (1, 2, 4):
            fm.TUNE.clear()
            fm.TUNE['bx:zyid:%dx%dx%d' % (ROWS, N1, Zm)] = bx
            wyi = fm._ct_inv_mats_np(N1)
            wyg = fm._ct_inv_mats_np(N1, fold_kvec=tuple(
                np.sin(np.arange(N1) / N1).tolist()))
            if zkind == 'zct':
                ABp = fm._zct_inv_mats_np(N2)
                ABg = fm._zct_inv_mats_np(
                    N2, grad_kvec=np.arange(Zm + 1).astype('f8'))
            else:
                ABp = fm._irfft_mats_np(N2, Zm, nyquist_last=False)
                ABg = fm._irfft_mats_np(
                    N2, Zm, grad_kvec=np.arange(Zm).astype('f8'),
                    nyquist_last=False)
            bench("zy_inv DUAL %s BX=%d" % (zkind, bx),
                  lambda c: fm._zy_inv_ct2_call_dual(
                      c, c, wyg, ABp, wyi, ABg, N2, None), half)
    fm.TUNE.clear()


def sweep_ro():
    _, _, _, k = data()
    ks = jax.random.split(k, 4)
    disp = tuple(0.05 + 1.9 * jax.random.uniform(
        kk, (ROWS, N1, N2), dtype=jnp.float32) for kk in ks[:3])
    vmin, vmax = 0, 2
    mesh = jax.random.normal(ks[3], (ROWS, N1, N2), jnp.float32)
    mext = jax.random.normal(ks[3], (ROWS + 2, N1, N2), jnp.float32)

    # production form: no-copy interior + boundary windows.  The mesh
    # AND the displacements ride the carry (closed-over 0.5 GB arrays
    # wedge the remote compiler as HLO literals).
    def parts(c):
        return gpp.readout_fused_parts((c[0],), c[1:], vmin, vmax,
                                       'cic')[0]

    # old form on a pre-extended array (copy cost excluded here!)
    def ext(c):
        return gpp.readout_fused_ext((c[0],), c[1:], vmin, vmax,
                                     'cic')[0]

    bench("readout parts 1-mesh", parts, (mesh,) + disp)
    bench("readout ext 1-mesh (no copy cost)", ext, (mext,) + disp)
    for budget in (48, 96):
        gpp._REF_BUDGET_BYTES = budget * 1024 * 1024
        bench("readout parts budget=%d" % budget, parts,
              (mesh,) + disp)
    gpp._REF_BUDGET_BYTES = 72 * 1024 * 1024

    # 3-mesh fused vs 3x 1-mesh: the kernel is VPU-bound (12.5 ms vs
    # a ~1.4 ms HBM roofline), so sharing the 27 window-weight
    # computations across meshes should win ~1.5x IF the bigger VMEM
    # working set still pipelines (round-2 measured it slower, but
    # with the biased per-call method)
    mesh3 = tuple(mesh * s for s in (1.0, 0.5, 0.25))

    def parts3(c):
        return gpp.readout_fused_parts(c[:3], c[3:], vmin, vmax,
                                       'cic')

    def parts3sep(c):
        return tuple(gpp.readout_fused_parts((m,), c[3:], vmin,
                                             vmax, 'cic')[0]
                     for m in c[:3])

    for budget in (48, 72, 96):
        gpp._REF_BUDGET_BYTES = budget * 1024 * 1024
        bench("readout parts 3-mesh fused b=%d" % budget, parts3,
              mesh3 + disp)
    gpp._REF_BUDGET_BYTES = 72 * 1024 * 1024
    bench("readout parts 3x 1-mesh", parts3sep, mesh3 + disp)


def sweep_paint():
    _, _, _, k = data()
    ks = jax.random.split(k, 3)
    disp = tuple(0.05 + 1.9 * jax.random.uniform(
        kk, (ROWS, N1, N2), dtype=jnp.float32) for kk in ks)
    vmin, vmax = 0, 2

    def paint(c):
        return gpp.paint_fused_parts(c, 1.0, vmin, vmax, 'cic')

    for budget in (48, 72, 96):
        gpp._REF_BUDGET_BYTES = budget * 1024 * 1024
        bench("paint parts budget=%d" % budget, paint, disp)
    gpp._REF_BUDGET_BYTES = 72 * 1024 * 1024


def sweep_pipe(spec_dtype=None):
    """the full per-chip compute chain of the sharded force step
    (minus the a2a collectives): paint + zy-fwd + dual x-inverse
    (with folded 1/k^2) + 3 zy-inv + readouts, as one carried chain.

    spec_dtype=bf16: inter-pass spectra are STORED bf16 (kernels
    still compute f32) — halves the HBM traffic of the FFT stages
    AND the a2a payload of the sharded layout (the transposes ship
    the same arrays)."""
    _, _, _, k = data()
    ks = jax.random.split(k, 3)
    dispc = tuple(0.05 + 1.9 * jax.random.uniform(
        kk, (ROWS, N1, N2), dtype=jnp.float32) for kk in ks)
    vmin, vmax = 0, 2
    kd = kd_tabs()
    wz = fm._z_fwd_tabs(N2, Zm)
    wyf = fm._ct_fwd_mats_np(N1)
    wxi = fm._ct_inv_mats_np(N1)   # per-chip x-pass is over N1=1024
    wxg = fm._ct_inv_mats_np(N1, fold_kvec=kd[1])
    wyi = fm._ct_inv_mats_np(N1)
    wyg = fm._ct_inv_mats_np(N1, fold_kvec=kd[1])
    ABp = fm._z_inv_tabs(N2, Zm)
    ABg = fm._z_inv_tabs(N2, Zm, grad_kvec=np.asarray(kd[2]))
    k2t = (np.arange(N1, dtype=np.float32) + 1.0,
           np.arange(ROWS, dtype=np.float32) + 1.0,
           np.arange(Zm, dtype=np.float32) + 1.0)

    sdt = spec_dtype or jnp.float32

    def step(c):
        disp = c
        rho = gpp.paint_fused_parts(disp, 1.0, vmin, vmax, 'cic')
        pr, pi, nq = fm._zy_fwd_ct2_call(rho, N2, Zm, wz, wyf, None,
                                         out_dtype=sdt)
        # stand-in for the a2a transpose: reshape/transpose to the
        # (N1, ROWS, Zm) local block of the transposed layout
        tr = jnp.swapaxes(pr, 0, 1)
        ti = jnp.swapaxes(pi, 0, 1)
        sr, si, gr, gi = fm._xct_call_multi(tr, ti, wxi, 1.0, None,
                                            inverse=True, wx2=wxg,
                                            k2=k2t, out_dtype=sdt)
        sr = jnp.swapaxes(sr, 0, 1); si = jnp.swapaxes(si, 0, 1)
        gr = jnp.swapaxes(gr, 0, 1); gi = jnp.swapaxes(gi, 0, 1)
        fy, fz = fm._zy_inv_ct2_call_dual(sr, si, wyg, ABp, wyi, ABg,
                                          N2, None)
        fx = fm._zy_inv_ct2_call(gr, gi, wyi, ABp, N2, None)
        vals = tuple(
            gpp.readout_fused_parts((m,), disp, vmin, vmax,
                                    'cic')[0] for m in (fx, fy, fz))
        return vals

    tag = 'bf16 spectra' if spec_dtype else 'f32'
    bench("full per-chip compute chain (%s)" % tag, step, dispc)


def sweep_pipe_grad(spec_dtype=None):
    """gradient-mode per-chip chain: paint + zy-fwd + ONE x-inverse
    (1/k^2 folded) + ONE zy-inverse (the potential) + the fused
    3-diff readout (diffdir='all', shared plane rolls)."""
    _, _, _, k = data()
    ks = jax.random.split(k, 3)
    dispc = tuple(0.05 + 1.9 * jax.random.uniform(
        kk, (ROWS, N1, N2), dtype=jnp.float32) for kk in ks)
    vmin, vmax = 0, 2
    wz = fm._z_fwd_tabs(N2, Zm)
    wyf = fm._ct_fwd_mats_np(N1)
    wxi = fm._ct_inv_mats_np(N1)
    wyi = fm._ct_inv_mats_np(N1)
    ABp = fm._z_inv_tabs(N2, Zm)
    k2t = (np.arange(N1, dtype=np.float32) + 1.0,
           np.arange(ROWS, dtype=np.float32) + 1.0,
           np.arange(Zm, dtype=np.float32) + 1.0)
    sdt = spec_dtype or jnp.float32

    def step(c):
        disp = c
        rho = gpp.paint_fused_parts(disp, 1.0, vmin, vmax, 'cic')
        pr, pi, nq = fm._zy_fwd_ct2_call(rho, N2, Zm, wz, wyf, None,
                                         out_dtype=sdt)
        tr = jnp.swapaxes(pr, 0, 1)
        ti = jnp.swapaxes(pi, 0, 1)
        sr, si = fm._xct_call_multi(tr, ti, wxi, 1.0, None,
                                    inverse=True, k2=k2t,
                                    out_dtype=sdt)
        sr = jnp.swapaxes(sr, 0, 1); si = jnp.swapaxes(si, 0, 1)
        phi = fm._zy_inv_ct2_call(sr, si, wyi, ABp, N2, None)
        return gpp.readout_fused_parts((phi,), disp, vmin, vmax,
                                       'cic', diffdir='all')

    tag = 'bf16 spectra' if spec_dtype else 'f32'
    bench("gradient-mode per-chip chain (%s)" % tag, step, dispc)
    # the fused 3-diff readout alone (vs 3 single-diff calls)
    mesh = jax.random.normal(ks[0], (ROWS, N1, N2), jnp.float32)

    def ro_all(c):
        return gpp.readout_fused_parts((c[0],), c[1:], vmin, vmax,
                                       'cic', diffdir='all')

    def ro_sep(c):
        return tuple(gpp.readout_fused_parts(
            (c[0],), c[1:], vmin, vmax, 'cic', diffdir=d)[0]
            for d in range(3))

    bench("readout 3-diff fused", ro_all, (mesh,) + dispc)
    bench("readout 3-diff separate", ro_sep, (mesh,) + dispc)


def sweep_zmm():
    """Isolated dense z-DFT matmul (the 1024 -> 512 half-rfft pair,
    275 GFLOP per pass) at each matmul precision — pins down the
    bf16 pass count of each precision grade on this chip and the
    achievable TF/s, which tools/roofline.py needs to decompose the
    pipe (the z matmuls model as ~33 ms of the 60 ms chain at
    6-pass; if HIGHEST is 3-pass on v5e the z-CT savings halve)."""
    slab, _, _, _ = data()
    wz = fm._dft_half_np(N2, Zm)
    wzr = jnp.asarray(wz[0])
    wzi = jnp.asarray(wz[1])
    gf = 2 * (2 * ROWS * N1 * N2 * Zm) / 1e9

    for name, prec in (("DEFAULT (1-pass bf16)", 'default'),
                       ("HIGH/tf32 (3-pass)", 'tensorfloat32'),
                       ("HIGHEST/f32", 'float32')):
        p = jax.lax.Precision(prec)

        def zmm(c, _p=p):
            x = c.reshape(ROWS * N1, N2)
            zr = jax.lax.dot(x, wzr, precision=_p)
            zi = jax.lax.dot(x, wzi, precision=_p)
            return zr.reshape(ROWS, N1, Zm) + zi.reshape(ROWS, N1,
                                                         Zm)
        dt = bench("z-matmul pair %s" % name, zmm, slab)
        if dt:
            print("   -> %.1f TF/s effective (%.0f GFLOP)"
                  % (gf / dt, gf), flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    print("device:", jax.devices()[0], flush=True)
    if which == 'zmm':
        sweep_zmm()
    if which in ('hbm', 'all'):
        sweep_hbm()
    if which in ('zy', 'all'):
        sweep_zy()
    if which in ('x', 'all'):
        sweep_x()
    if which in ('zyi', 'all'):
        sweep_zyi()
    if which in ('ro', 'all'):
        sweep_ro()
    if which in ('paint', 'all'):
        sweep_paint()
    if which in ('pipe', 'all'):
        sweep_pipe()
    if which in ('pipe_bf16', 'all'):
        sweep_pipe(spec_dtype=jnp.bfloat16)
    if which in ('pipe_grad', 'all'):
        sweep_pipe_grad()
    if which in ('pipe_grad_bf16', 'all'):
        sweep_pipe_grad(spec_dtype=jnp.bfloat16)
    if which in ('multi_unroll', 'all'):
        sweep_multi_unroll()




def sweep_multi_unroll():
    """fused 3-diff readout: fori vs unrolled body at the production
    27-offset chunk (the shared 80-offset limit keeps it fori)."""
    _, _, _, k = data()
    ks = jax.random.split(k, 4)
    dispc = tuple(0.05 + 1.9 * jax.random.uniform(
        kk, (ROWS, N1, N2), dtype=jnp.float32) for kk in ks[:3])
    mesh = jax.random.normal(ks[3], (ROWS, N1, N2), jnp.float32)

    def ro_all(c):
        return gpp.readout_fused_parts((c[0],), c[1:], 0, 2, 'cic',
                                       diffdir='all')

    for lim in (80, 96, 128):
        gpp._UNROLL_LIMIT_MULTI = lim
        bench("3-diff fused UNROLL_MULTI=%d" % lim, ro_all,
              (mesh,) + dispc)
    gpp._UNROLL_LIMIT_MULTI = 80

if __name__ == '__main__':
    main()
