"""Benchmark: full PM gravity step on the real TPU chip.

Measures the reference pipeline shape (SURVEY.md section 3.5 /
BASELINE.md): paint of N^3 lattice particles on an N^3 mesh + r2c +
3 x (force transfer + c2r) + readout of the 3 force meshes, jitted
end to end, CIC, chained in a lax.scan KDK loop (the production
shape; no host round trip inside the loop).

TPU-native implementation: lattice fast path (mesh-shaped per-axis
displacement state, shift-sum Pallas paint/readout — ops/gridpm.py)
and MXU DFT-matmul FFTs with Cooley-Tukey factored x/y axes, the
z-Nyquist plane split off for 128-lane alignment, and the spectral
force kernel folded into the inverse DFT matrices (ops/fft_mxu.py).

HEADLINE is the f32-EXACT step (FFT matmuls at
precision='float32', 6e-8 vs jnp.fft).  Extras:
- bf16_step_ms: single-pass bf16 FFT matmuls (1.6e-4 relative force
  error — an order below the SuperLanczos-vs-spectral stencil
  difference); state/paint/readout stay f32.
- realistic_step_ms: f32 step with late-time displacement amplitude
  (bounds (-2, 3) cells -> nv=6 -> 216 shift passes vs 27), the
  honest deep-run cost of the lattice path.

PROCESS ISOLATION: each measurement runs in its OWN subprocess,
sharing the persistent XLA compilation cache.  Measured fact
(round 4): after the giant nv=6 programs run, every subsequent
differently-shaped program in the SAME process dies with
'TPU backend error (InvalidArgument)' through the axon tunnel,
while each measurement is green standalone.  One process per
measurement makes the record immune to that cross-program state.

The north-star target is the full 1024^3 step < 100 ms on v5e-8.
1024^3 on 8 chips is 512^3 of work per chip, so the single-chip
512^3 step approximates the 8-chip 1024^3 step (modulo the ICI
transposes, which the pencil FFT does in 2 all_to_alls);
vs_baseline = 100 ms / measured.

Prints ONE JSON line.
"""
import functools
import json
import os
import subprocess
import sys
import time

_CACHE_DIR = "/tmp/pmesh_tpu_jax_cache"


def _jax():
    import jax
    # persistent compilation cache: repeated bench runs (and the
    # subprocess isolation below) reuse the compiled executables
    # instead of paying ~3-4 min of remote compiles per process
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def measure_step(fft='mxu', bounds=(0.0, 2.0), mode='spectral'):
    """One 512^3 lattice KDK step, chain-differenced scan."""
    jax = _jax()
    import jax.numpy as jnp
    from pmesh_tpu import ParticleMesh
    from pmesh_tpu.models.fastpm import Solver

    N = 512
    pm = ParticleMesh(Nmesh=[N, N, N], BoxSize=float(N), dtype='f4',
                      resampler='cic')
    solver = Solver(pm)

    @jax.jit
    def make_disp(key, lo, hi):
        ks = jax.random.split(key, 3)
        # strictly inside (lo, hi) so the tiny benchmark kicks cannot
        # push a particle out of the static bounds
        pad = 0.05 * (hi - lo)
        return tuple(
            (lo + pad) + (hi - lo - 2 * pad)
            * jax.random.uniform(k, (N, N, N), dtype=jnp.float32)
            for k in ks)

    def make_scan(nstep):
        @jax.jit
        def run(disp):
            def step(S, _):
                F = solver.force_lattice(S, bounds=bounds, fft=fft,
                                         mode=mode)
                S = tuple(s + 1e-6 * f for s, f in zip(S, F))
                return S, None
            S, _ = jax.lax.scan(step, disp, None, length=nstep)
            return S
        return run

    def sync(S):
        # block_until_ready alone is not reliable through the axon
        # tunnel; force a device->host transfer of a reduction
        return float(jnp.sum(S[0][0, 0, :8]))

    disp = make_disp(jax.random.key(0), *bounds)
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
    return (t_long - t_short) / (n_long - n_short) * 1000.0


def measure_binned(Nb):
    """Binned slot-lattice (general/clustered positions, ops/binned):
    one KDK superstep (rebase_every=2) at Nb^3 K=2.  On 8 chips the
    state shards and 1024^3 runs the 512^3 per-chip shape."""
    jax = _jax()
    import jax.numpy as jnp
    from pmesh_tpu import ParticleMesh
    from pmesh_tpu.models.fastpm import Solver
    from pmesh_tpu.ops import binned as bn
    from pmesh_tpu.models.fastpm import leapfrog_factors, FastPM
    pmb = ParticleMesh(Nmesh=[Nb] * 3, BoxSize=float(Nb),
                       dtype='f4', resampler='cic')
    sb = Solver(pmb)
    key = jax.random.key(0)
    ks = jax.random.split(key, 6)
    disp = tuple(0.05 + 0.9 * jax.random.uniform(
        k, (Nb,) * 3, dtype=jnp.float32) for k in ks[:3])
    vel = tuple(0.02 * jax.random.normal(
        k, (Nb,) * 3, dtype=jnp.float32) for k in ks[3:])
    dslots, vslots, valid = bn.from_lattice(disp, vel, nslots=2)
    bounds = (-0.5, 1.5)
    fac = FastPM(sb.cosmology)
    K1, D1s, K2 = leapfrog_factors([0.5, 0.55, 0.6], fac, 'symp2')
    K1, D1s, K2 = (a.astype(jnp.float32) for a in (K1, D1s, K2))

    def force(d, v):
        F = sb.force_binned(d, v, bounds, fft='mxu')
        return tuple(tuple(f for f in s) for s in F)

    # donate the state: at 512^3 K=2 the split rebase + donation
    # keep old+new state from ever coexisting whole
    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def superstep(dslots, vslots, valid):
        F = force(dslots, valid)
        for i in range(2):
            vslots = tuple(tuple(v + f * K1[i] for v, f in
                                 zip(vk, fk))
                           for vk, fk in zip(vslots, F))
            dslots = tuple(tuple(s + v * D1s[i] for s, v in
                                 zip(dk, vk))
                           for dk, vk in zip(dslots, vslots))
            F = force(dslots, valid)
            vslots = tuple(tuple(v + f * K2[i] for v, f in
                                 zip(vk, fk))
                           for vk, fk in zip(vslots, F))
        dslots, valid, (vslots,), ov = bn.rebase(
            dslots, valid, bounds, extras=(vslots,))
        return dslots, vslots, valid, ov

    out = superstep(dslots, vslots, valid)
    float(jnp.sum(out[0][0][0][0, 0, :8]))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = superstep(*out[:3])
        float(jnp.sum(out[0][0][0][0, 0, :8]))
    # per KDK step (2 steps + 1 rebase per superstep)
    return (time.perf_counter() - t0) / reps / 2 * 1000.0


def measure_pipe_chain(spec_dtype=None, mode='spectral'):
    """The MEASURED per-chip compute chain of the 8-chip 1024^3
    sharded force step (the (128, 1024, 1024) slab shapes): paint
    + zy-fwd ct2 + dual x-inverse with folded 1/k^2 + zy-inverses
    + 3 readouts, chain-differenced — tools/tune_slab.py 'pipe'
    inlined so the driver's bench record carries the number."""
    jax = _jax()
    import jax.numpy as jnp
    from pmesh_tpu.ops import fft_mxu as fm
    from pmesh_tpu.ops import gridpm_pallas as gpp
    ROWS, N1, N2 = 128, 1024, 1024
    Zm = N2 // 2
    ks = jax.random.split(jax.random.key(0), 3)
    dispc = tuple(0.05 + 1.9 * jax.random.uniform(
        kk, (ROWS, N1, N2), dtype=jnp.float32) for kk in ks)
    import numpy as _np
    kd = []
    for n in (ROWS * 8, N1):
        w = _np.fft.fftfreq(n) * 2 * _np.pi
        kd.append(tuple((1 / 6 * (8 * _np.sin(w)
                                  - _np.sin(2 * w))).tolist()))
    wz2 = _np.fft.rfftfreq(N2) * 2 * _np.pi
    kdz = tuple((1 / 6 * (8 * _np.sin(wz2)
                          - _np.sin(2 * wz2))).tolist())
    wz = fm._z_fwd_tabs(N2, Zm)
    wyf = fm._ct_fwd_mats_np(N1)
    wxi = fm._ct_inv_mats_np(N1)
    wxg = fm._ct_inv_mats_np(N1, fold_kvec=kd[1])
    wyi = fm._ct_inv_mats_np(N1)
    wyg = fm._ct_inv_mats_np(N1, fold_kvec=kd[1])
    ABp = fm._z_inv_tabs(N2, Zm)
    ABg = fm._z_inv_tabs(N2, Zm, grad_kvec=_np.asarray(kdz))
    k2t = (_np.arange(N1, dtype=_np.float32) + 1.0,
           _np.arange(ROWS, dtype=_np.float32) + 1.0,
           _np.arange(Zm, dtype=_np.float32) + 1.0)
    sdt = spec_dtype or jnp.float32

    def chain_spectral(c):
        disp = c
        rho = gpp.paint_fused_parts(disp, 1.0, 0, 2, 'cic')
        pr, pi, nq = fm._zy_fwd_ct2_call(rho, N2, Zm, wz, wyf,
                                         None, out_dtype=sdt)
        tr = jnp.swapaxes(pr, 0, 1)
        ti = jnp.swapaxes(pi, 0, 1)
        sr, si, gr, gi = fm._xct_call_multi(
            tr, ti, wxi, 1.0, None, inverse=True, wx2=wxg,
            k2=k2t, out_dtype=sdt)
        sr = jnp.swapaxes(sr, 0, 1); si = jnp.swapaxes(si, 0, 1)
        gr = jnp.swapaxes(gr, 0, 1); gi = jnp.swapaxes(gi, 0, 1)
        fy, fz = fm._zy_inv_ct2_call_dual(sr, si, wyg, ABp, wyi,
                                          ABg, N2, None)
        fx = fm._zy_inv_ct2_call(gr, gi, wyi, ABp, N2, None)
        return tuple(gpp.readout_fused_parts(
            (m,), disp, 0, 2, 'cic')[0] for m in (fx, fy, fz))

    def chain_gradient(c):
        # the QPM-family chain: ONE Poisson inverse (x-pass with
        # folded 1/k^2, one zy-inverse) + 3-derivative readout
        disp = c
        rho = gpp.paint_fused_parts(disp, 1.0, 0, 2, 'cic')
        pr, pi, nq = fm._zy_fwd_ct2_call(rho, N2, Zm, wz, wyf,
                                         None, out_dtype=sdt)
        tr = jnp.swapaxes(pr, 0, 1)
        ti = jnp.swapaxes(pi, 0, 1)
        sr, si = fm._xct_call_multi(tr, ti, wxi, 1.0, None,
                                    inverse=True, k2=k2t,
                                    out_dtype=sdt)
        sr = jnp.swapaxes(sr, 0, 1); si = jnp.swapaxes(si, 0, 1)
        phi = fm._zy_inv_ct2_call(sr, si, wyi, ABp, N2, None)
        return gpp.readout_fused_parts((phi,), disp, 0, 2,
                                       'cic', diffdir='all')

    chain = chain_gradient if mode == 'gradient' \
        else chain_spectral

    def make(L):
        @jax.jit
        def go(c):
            def body(c, _):
                out = chain(c)
                tie = jnp.sum(out[0].reshape(-1)[:8])
                return tuple(x + (0.0 * tie).astype(x.dtype)
                             for x in c), None
            c, _ = jax.lax.scan(body, c, None, length=L)
            return c
        return go

    def sync2(x):
        return float(jnp.sum(x[0].reshape(-1)[:8]))
    g1, g2 = make(1), make(5)
    sync2(g1(dispc)); sync2(g2(dispc))
    t0 = time.perf_counter(); sync2(g1(dispc))
    ta = time.perf_counter() - t0
    t0 = time.perf_counter(); sync2(g2(dispc))
    tb = time.perf_counter() - t0
    return (tb - ta) / 4 * 1000.0


def measure_imbalance():
    """clustered-state ghost/paint imbalance on an 8-device CPU mesh
    (reference get_exchange_cost role, domain.py:125-136): max/mean
    of per-device stencil work after an equal-count reshard of a
    half-clustered state."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from pmesh_tpu.parallel.pmesh import ProcessMesh
    from pmesh_tpu.parallel import exchange as ex
    N = 128
    rng = np.random.RandomState(3)
    n = N ** 2 * 32
    g0 = np.concatenate([
        rng.uniform(0, N, n // 2),
        rng.normal(N * 0.37, 2.5, n // 2) % N])
    pm = ProcessMesh(jax.devices()[:8])
    order = np.argsort(ex.home_block(jnp.asarray(g0), N, 8),
                       stable=True)
    load = ex.measure_load(pm, jnp.asarray(g0[order]), N,
                           smoothing=1.0)
    return load['imbalance']


# name -> (callable, kwargs, needs_tpu)
MEASUREMENTS = {
    'headline':  (measure_step, {}, True),
    'bf16':      (measure_step, {'fft': 'mxu_bf16'}, True),
    'gradient':  (measure_step, {'mode': 'gradient'}, True),
    'nv6':       (measure_step, {'bounds': (-2.0, 3.0)}, True),
    'nv6_grad':  (measure_step, {'bounds': (-2.0, 3.0),
                                 'mode': 'gradient'}, True),
    'binned256': (measure_binned, {'Nb': 256}, True),
    'binned512': (measure_binned, {'Nb': 512}, True),
    'pipe':      (measure_pipe_chain, {}, True),
    'pipe_bf16': (measure_pipe_chain, {'spec_dtype': 'bf16'}, True),
    'pipe_grad': (measure_pipe_chain, {'mode': 'gradient'}, True),
    'imbalance': (measure_imbalance, {}, False),
}


def _run_child(name):
    """Child mode: run ONE measurement, print one JSON line."""
    fn, kw, needs_tpu = MEASUREMENTS[name]
    if not needs_tpu:
        # the JAX_PLATFORMS env var is silently overridden by the
        # axon plugin; the config update is honored (measured)
        import jax
        jax.config.update('jax_platforms', 'cpu')
    if name == 'pipe_bf16':
        import jax.numpy as jnp
        kw = {'spec_dtype': jnp.bfloat16}
    val = fn(**kw)
    print(json.dumps({"name": name, "value": round(val, 3)}))


def _spawn(name, timeout=2400):
    """Run one measurement in a fresh process; returns float or
    'failed: ...'.  Retries once after a cool-down: a crashed TPU
    client can wedge the chip lease for ~3-5 min."""
    _, _, needs_tpu = MEASUREMENTS[name]
    env = dict(os.environ)
    if not needs_tpu:
        env['JAX_PLATFORMS'] = 'cpu'
        env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '')
                            + ' --xla_force_host_platform_device_count=8')
    last_err = None
    for attempt in range(2):
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 '--measure', name],
                env=env, capture_output=True, text=True,
                timeout=timeout)
            if out.returncode == 0 and out.stdout.strip():
                rec = json.loads(out.stdout.strip().splitlines()[-1])
                return rec['value']
            tail = (out.stderr or out.stdout or '').strip()
            last_err = tail.splitlines()[-1][:110] if tail else \
                'rc=%d' % out.returncode
        except subprocess.TimeoutExpired:
            last_err = 'timeout %ds' % timeout
        except Exception as e:  # parse errors etc.
            last_err = str(e)[:110]
        if attempt == 0 and needs_tpu:
            time.sleep(240)     # chip lease cool-down before retry
    return "failed: %s" % last_err


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == '--measure':
        _run_child(sys.argv[2])
        return

    results = {}
    # order matters: the nv=6 monsters (216-shift programs) can wedge
    # the chip lease for several minutes in a way that outlives the
    # process (measured round 4: binned children failed with 'TPU
    # backend error (InvalidArgument)' right after nv6 ran, green
    # standalone) — run everything else first
    for name in ('headline', 'bf16', 'gradient', 'binned256',
                 'binned512', 'pipe', 'pipe_bf16', 'pipe_grad',
                 'nv6', 'nv6_grad', 'imbalance'):
        results[name] = _spawn(name)
        print("# %s: %s" % (name, results[name]), file=sys.stderr)

    dt = results['headline']
    if not isinstance(dt, float):
        # headline MUST be a number; fail loudly so the driver's
        # record shows rc!=0 rather than a silent nonsense line
        print(json.dumps({"metric": "pm_gravity_step_512^3_ms",
                          "error": dt}))
        raise SystemExit(1)

    # the 8-chip projection: measured per-chip compute + the pencil
    # a2a payload (3 f32 (r,i) pairs, 7/8 off-chip) at a stated ICI
    # bandwidth.  v5e ICI is ~180 GB/s/chip aggregate; 100 GB/s
    # effective all_to_all is the conservative anchor, with the
    # 50/200 GB/s bounds recorded alongside.
    PAIR_GB = 2 * 128 * 1024 * 512 * 4 / 1e9
    a2a_gb = 3 * PAIR_GB * 7 / 8

    def project(pipe, half=False, pairs=3):
        if not isinstance(pipe, float):
            return pipe
        # gradient mode ships 2 spectrum pairs (forward + potential)
        # instead of the spectral triple's 3
        gb = a2a_gb * (0.5 if half else 1.0) * (pairs / 3.0)
        return {
            "at_50_GBps": round(pipe + gb / 50 * 1000, 1),
            "at_100_GBps": round(pipe + gb / 100 * 1000, 1),
            "at_200_GBps": round(pipe + gb / 200 * 1000, 1),
        }

    N = 512
    mp_per_s = (N ** 3 / 1e6) / (dt / 1000.0)
    result = {
        "metric": "pm_gravity_step_512^3_ms",
        "value": round(dt, 3),
        "unit": "ms",
        "vs_baseline": round(100.0 / dt, 3),
        "extra": {
            "config": "512^3 CIC paint + r2c + 3x(force c2r) + "
                      "readout, chained scan, single chip, f32-EXACT "
                      "(6e-8 vs jnp.fft): lattice shift-sum pallas "
                      "paint/readout + Cooley-Tukey MXU FFT "
                      "(split-Nyquist, folded force kernels); one "
                      "subprocess per measurement (shared XLA cache)",
            "bf16_step_ms": results['bf16'],
            "gradient_mode_step_ms": results['gradient'],
            "realistic_nv6_step_ms": results['nv6'],
            "realistic_nv6_gradient_step_ms": results['nv6_grad'],
            "binned_step_256^3_ms": results['binned256'],
            "binned_step_512^3_ms": results['binned512'],
            # MEASURED per-chip compute chain of the sharded 1024^3
            # step at the (128, 1024, 1024) slab shapes (the 8-chip
            # per-chip work), chain-differenced on this chip
            "pipe_chain_per_chip_ms": results['pipe'],
            "pipe_chain_per_chip_bf16_spectra_ms": results['pipe_bf16'],
            # gradient (QPM-family) chain: ONE Poisson inverse + the
            # 3-derivative readout; ships 2 spectrum pairs on ICI
            "pipe_chain_grad_per_chip_ms": results['pipe_grad'],
            # measured compute + projected pencil-a2a (3 f32 pairs,
            # 7/8 off-chip = 1.41 GB/step/chip; x0.5 for bf16,
            # x2/3 for gradient mode) at stated ICI bandwidths —
            # multi-chip hardware is not reachable from this harness
            "projected_1024^3_v5e8_step_ms": project(results['pipe']),
            "projected_1024^3_v5e8_bf16_spectra_ms": project(
                results['pipe_bf16'], half=True),
            "projected_1024^3_v5e8_gradient_ms": project(
                results['pipe_grad'], pairs=2),
            # clustered-state ghost/paint-work imbalance across an
            # 8-device mesh (reference get_exchange_cost role)
            "ghost_imbalance_clustered_8dev": results['imbalance'],
            "particles_Mps": round(mp_per_s, 1),
        },
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
