"""FastPM-style particle-mesh N-body solver.

The flagship model: the modern-API N-body of the reference
(examples/nbody.py: kick/drift factor classes 13-76, symplectic
steppers symp1/2/3 84-152, force pipeline 199-218, LPT init 245-288)
and the 2LPT initial conditions of nbody/genic.py:122-158 — rebuilt
so the entire time loop is ONE jitted lax.scan over precomputed
kick/drift coefficients, with the force pipeline
(paint -> r2c -> transfer -> c2r -> readout xN) traced once and the
whole state (Q, S, V) resident in HBM across steps.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..pm import ParticleMesh, RealField
from ..ops import transfer as tf
from .cosmology import Cosmology, Planck15

__all__ = ["Solver", "State", "lpt", "leapfrog_factors",
           "FastPM", "Quinn", "TVE", "VTE", "Naive"]


class State(object):
    """Particle state: Lagrangian grid Q, displacement S, velocity V.
    Registered as a pytree so it flows through jit/scan."""

    def __init__(self, Q, S, V):
        self.Q = Q
        self.S = S
        self.V = V

    @property
    def X(self):
        return self.Q + self.S

jax.tree_util.register_pytree_node(
    State,
    lambda s: ((s.Q, s.S, s.V), None),
    lambda aux, children: State(*children))


# --- kick / drift factor families (examples/nbody.py:13-76) ---------------

def _quad(func, lo, hi, n=256):
    """Fixed-order trapezoid quadrature on the host (replaces
    scipy.integrate.quad in the reference factor classes)."""
    x = np.linspace(lo, hi, n)
    return float(np.trapezoid([func(xi) for xi in x], x))


class FastPM:
    """Growth-factor-exact kick and drift (the FastPM scheme)."""
    def __init__(self, pt):
        self.pt = pt

    def K(self, ai, af, ar):
        pt = self.pt
        return 1 / (ar ** 2 * float(pt.E(ar))) * (
            float(pt.Gf(af)) - float(pt.Gf(ai))) / float(pt.gf(ar))

    def D(self, ai, af, ar):
        pt = self.pt
        return 1 / (ar ** 3 * float(pt.E(ar))) * (
            float(pt.Gp(af)) - float(pt.Gp(ai))) / float(pt.gp(ar))


class Quinn:
    """Standard symplectic quadrature factors (Quinn et al)."""
    def __init__(self, pt):
        self.pt = pt

    def K(self, ai, af, ar):
        return _quad(lambda a: 1.0 / (a * a * float(self.pt.E(a))), ai, af)

    def D(self, ai, af, ar):
        return _quad(lambda a: 1.0 / (a ** 3 * float(self.pt.E(a))), ai, af)


class TVE:
    """H = T + (E + V) split: drift has no explicit time dependence."""
    def __init__(self, pt):
        self.pt = pt

    def K(self, ai, af, ar):
        return _quad(lambda a: 1.0 / (a * a * float(self.pt.E(a))), ai, af)

    def D(self, ai, af, ar):
        return ar ** -2 * _quad(
            lambda a: 1.0 / (a * float(self.pt.E(a))), ai, af)


class VTE:
    """H = (T + E) + V split: kick has no explicit time dependence."""
    def __init__(self, pt):
        self.pt = pt

    def K(self, ai, af, ar):
        return ar ** -1 * _quad(
            lambda a: 1.0 / (a * float(self.pt.E(a))), ai, af)

    def D(self, ai, af, ar):
        return _quad(lambda a: 1.0 / (a ** 3 * float(self.pt.E(a))), ai, af)


class Naive:
    def __init__(self, pt):
        self.pt = pt

    def K(self, ai, af, ar):
        return 1.0 / (ar * ar * float(self.pt.E(ar))) * (af - ai)

    def D(self, ai, af, ar):
        return 1.0 / (ar ** 3 * float(self.pt.E(ar))) * (af - ai)


_FACTORS = {'fastpm': FastPM, 'quinn': Quinn, 'tve': TVE, 'vte': VTE,
            'naive': Naive}


def leapfrog_factors(time_steps, factors, scheme='symp2'):
    """Precompute the per-step kick/drift coefficient table on the
    host, so the device loop is a pure lax.scan.

    Returns (K1, D1, K2) arrays for symp2 (the KDK scheme of
    examples/nbody.py:90-105); symp1 returns (K1, D1, 0)."""
    Ks1, Ds1, Ks2 = [], [], []
    for ai, af in zip(time_steps[:-1], time_steps[1:]):
        if scheme == 'symp2':
            ac = (ai * af) ** 0.5
            Ks1.append(factors.K(ai, ac, ai))
            Ds1.append(factors.D(ai, af, ac))
            Ks2.append(factors.K(ac, af, af))
        elif scheme == 'symp1':
            Ks1.append(factors.K(ai, af, ai))
            Ds1.append(factors.D(ai, af, af))
            Ks2.append(0.0)
        else:
            raise ValueError("scheme must be symp1 or symp2")
    return (jnp.asarray(Ks1), jnp.asarray(Ds1), jnp.asarray(Ks2))


_REBASE_PROGS = {}
_FOLD_PROGS = {}


def _scoped_jit(fn, donate_argnums=()):
    """jax.jit with a raised XLA scoped-vmem limit on TPU backends.

    A donated program wraps the paint/rebase pallas calls in kCustom
    fusions whose scoped allocations XLA checks against its own 16 MB
    default instead of the kernel's Mosaic budget
    (CompilerParams.vmem_limit_bytes) — at 384^3+ the 512^2-plane
    paint needs ~19-34 MB and the compile fails with 'It should not
    be possible to run out of scoped vmem'.  The option is
    proto-backed, so it forwards through AOT remote compiles too."""
    kw = {}
    try:
        if jax.default_backend() == 'tpu':
            kw['compiler_options'] = {
                "xla_tpu_scoped_vmem_limit_kib": 65536}
    except Exception:
        pass
    return jax.jit(fn, donate_argnums=donate_argnums, **kw)


def _fold_prog(nslots):
    """cached jit program for the sort-based initial fold
    (ops/binned.fold_lattice): handles ANY initial excursion in O(N)
    memory, where the roll-based rebase on wide bounds enumerates
    (hi-lo+1)^3 drift images and OOMs (measured 23.7 GB of HLO temps
    at 384^3 bounds (-1.6, 2.6) on the 16 GB chip)."""
    from ..ops import binned as _bn
    if nslots not in _FOLD_PROGS:
        @_scoped_jit
        def run(disp, vel):
            return _bn.fold_lattice(disp, vel, nslots=nslots)
        _FOLD_PROGS[nslots] = run
    return _FOLD_PROGS[nslots]


def _rebase_prog(bounds, nslots_out, pmh, donate=True):
    """ONE donated jit program for a standalone (eager-context)
    rebase-with-velocities: inside a single program XLA recycles the
    kernel outputs and poison-add temps, and donation lets the new
    state land in the old state's buffers.  Called eagerly instead,
    the old state, the kernel outputs AND the eager poison-add copies
    all coexist — 2.5x the state size of peak HBM (measured
    RESOURCE_EXHAUSTED at 384^3 K=2->4 on the 16 GB chip).

    ``donate=False`` for the INITIAL rebase only: its slot-0 arrays
    ARE the caller's disp/vel (from_lattice aliases, it does not
    copy), and donating them would delete arrays the caller still
    owns.  Loop-interior state is library-private — donate it.

    Keyed by (bounds, nslots_out, procmesh, donate); the slot count
    is part of jit's own shape key."""
    from ..ops import binned as _bn
    key = (bounds, nslots_out, pmh, donate)
    if key not in _REBASE_PROGS:
        @functools.partial(_scoped_jit,
                           donate_argnums=(0, 1, 2) if donate else ())
        def run(dslots, vslots, valid):
            d2, va2, (v2,), ov = _bn.rebase(
                dslots, valid, bounds, extras=(vslots,),
                nslots_out=nslots_out, procmesh=pmh)
            return d2, v2, va2, ov
        _REBASE_PROGS[key] = run
    return _REBASE_PROGS[key]


class Solver(object):
    """End-to-end FastPM solver.

    Parameters
    ----------
    pm : ParticleMesh
        the IC-resolution mesh (particles: one per mesh point).
    cosmology : Cosmology
    B : int
        force-mesh boost factor (reference uses pm.Nmesh * boost,
        examples/nbody.py:293).
    """

    def __init__(self, pm, cosmology=None, B=1, force_resampler='cic'):
        self.pm = pm
        self.cosmology = cosmology if cosmology is not None else Planck15
        self.fpm = pm.reshape(Nmesh=pm.Nmesh * B) if B != 1 else pm
        if force_resampler is not None:
            self.fpm = ParticleMesh(
                Nmesh=self.fpm.Nmesh, BoxSize=self.fpm.BoxSize,
                dtype=self.fpm.dtype, resampler=force_resampler,
                procmesh=self.fpm.procmesh)
        # sharded-exchange plan parameters (kside/capacity) measured
        # by tune_exchange; empty = decompose defaults (capacity =
        # full block, never overflows but 1+2*kside x the memory)
        self._exch_kwargs = {}

    def tune_exchange(self, X, slack=1.5):
        """Measure ghost counts on a concrete particle state and fix
        the sharded exchange capacity for subsequent force() calls
        (the reference sizes its Alltoallv buffers exactly,
        domain.py:113-136; XLA needs a static capacity, so measure
        once with slack and let any later overflow poison loudly).

        Call once before a run (``nbody`` does it automatically on
        the initial state); no-op on a single device."""
        fpm = self.fpm
        if fpm.procmesh is None or fpm.procmesh.size <= 1 \
                or not (fpm._even_mesh or fpm._uneven1d
                        or fpm._pencil2d):
            return None
        if fpm._pencil2d:
            # 2-d pencil grid: per-channel Moore-neighborhood
            # capacities (corner channels carry orders of magnitude
            # fewer ghosts than faces — measure each)
            from ..parallel import exchange2d as _ex2
            X = jnp.asarray(X)
            g0 = X[:, 0] * jnp.asarray(fpm.affine.scale[0], X.dtype)
            g1 = X[:, 1] * jnp.asarray(fpm.affine.scale[1], X.dtype)
            smoothing = fpm.resampler.support * 0.5
            npx, npy = fpm.procmesh.grid
            N0, N1 = int(fpm.Nmesh[0]), int(fpm.Nmesh[1])
            ks = _ex2._default_ksides(smoothing, N0 // npx, N1 // npy)
            counts, reach = _ex2.measure_ghosts2d(
                fpm.procmesh, g0, g1, N0, N1, X.shape[0], smoothing,
                ksides=ks)
            if reach[0] > ks[0] or reach[1] > ks[1]:
                raise ValueError(
                    "particles reach %s slabs from home (> ksides="
                    "%s): reshard before tuning "
                    "(pm.reshard_particles)" % (reach, ks))
            caps = tuple(max(8, int(np.ceil(float(c) * float(slack))))
                         for c in counts)
            self._exch_kwargs = dict(kside=ks, capacity=caps)
            self.last_load = _ex2.measure_load2d(
                fpm.procmesh, g0, g1, N0, N1, smoothing, ksides=ks)
            return self._exch_kwargs
        from ..parallel import exchange as _ex
        X = jnp.asarray(X)
        g0 = X[:, 0] * jnp.asarray(fpm.affine.scale[0], X.dtype)
        smoothing = fpm.resampler.support * 0.5
        D = fpm.procmesh.size
        N0 = int(fpm.Nmesh[0])
        rows = _ex._slab_rows(N0, D)
        kside = _ex._default_kside(smoothing, rows, D, N0=N0)
        counts, reach = _ex.measure_ghosts(
            fpm.procmesh, g0, int(fpm.Nmesh[0]), X.shape[0],
            smoothing, kside=kside)
        if reach > kside:
            raise ValueError(
                "particles reach %d slabs from home (> kside=%d): "
                "reshard before tuning (pm.reshard_particles)"
                % (reach, kside))
        capacity = max(16, int(np.ceil(float(counts.max())
                                       * float(slack))))
        self._exch_kwargs = dict(kside=kside, capacity=capacity)
        # load accounting (reference get_exchange_cost/load roles,
        # domain.py:125-136, 409-499): equal-count blocks balance
        # particle work by construction; the residual skew from
        # clustering (ghost traffic + slab paint work) is measured
        # and REPORTED so a driver can decide to reshard
        self.last_load = _ex.measure_load(
            fpm.procmesh, g0, int(fpm.Nmesh[0]), smoothing,
            kside=kside)
        return self._exch_kwargs

    # --- initial conditions ---
    def linear_field(self, power, seed, unitary=False, compat='gadget'):
        """The linear density contrast in fourier space at z=0
        (examples/nbody.py:258-264)."""
        pm = self.pm
        gauss = pm.generate_whitenoise(seed, unitary=unitary,
                                       type='complex', compat=compat)

        def convolve(k, v):
            kmag = k.normp(2) ** 0.5
            ampl = (power(kmag) / k.BoxSize.prod()) ** 0.5
            return v * ampl
        return gauss.apply(convolve)

    def lpt(self, dlinear, a0, order=2, shift=0.0):
        """1/2LPT initial displacements and velocities
        (examples/nbody.py:266-288; nbody/genic.py:122-158).

        Returns a State scaled to time a0.
        """
        pm = self.pm
        pt = self.cosmology
        Q = pm.generate_uniform_particle_grid(shift=shift)

        DX1 = jnp.stack([
            dlinear.apply(tf.dx1_transfer(d)).c2r().readout(Q)
            for d in range(pm.ndim)], axis=-1)

        D1 = float(pt.D1(a0))
        f1 = float(pt.f1(a0))
        E0 = float(pt.E(a0))
        S = DX1 * D1
        V = DX1 * (D1 * f1 * a0 ** 2 * E0)

        if order >= 2 and pm.ndim == 3:
            # 2LPT source: sum_{a<b} phi_aa phi_bb - phi_ab^2 with
            # phi_ab = k_a k_b / k^2 dlinear (genic.py:136-158)
            def phi_ab(a, b):
                def filt(k, v):
                    k2 = k.normp(2, zeromode=1.0)
                    return v * k[a] * k[b] / k2
                return dlinear.apply(filt).c2r().value

            diag = [phi_ab(d, d) for d in range(3)]
            src = 0.0
            for a in range(3):
                for b in range(a + 1, 3):
                    src = src + (diag[a] * diag[b]
                                 - phi_ab(a, b) ** 2)
            source2 = pm.create(type=RealField, value=src).r2c()
            DX2 = jnp.stack([
                source2.apply(tf.dx1_transfer(d)).c2r().readout(Q)
                for d in range(3)], axis=-1)
            D2 = float(pt.D2(a0))
            f2 = float(pt.f2(a0))
            # D2 carries the -3/7 sign; DX2 kernel is +ik/k2 of source
            S = S + DX2 * D2
            V = V + DX2 * (D2 * f2 * a0 ** 2 * E0)

        return State(Q, S, V)

    # --- force ---
    def force(self, X, factor=None, mode='spectral'):
        """PM gravity: paint -> r2c -> per-axis force kernel -> c2r ->
        readout (examples/nbody.py:199-218).  Jittable.

        The three directional force meshes are stacked and read out in
        ONE batched gather pass so the (N,)-sized stencil index
        buffers exist once, and an optimization barrier between the
        paint and readout phases stops XLA from keeping the paint's
        index buffers alive across the FFT (2x liveness on 512^3
        meshes otherwise).

        mode='gradient' uses the derivative-window family (one
        Poisson c2r, readouts with the diff kernels — the reference
        QPM route, qpm.py:82-109): a third of the inverse-FFT work,
        slightly more small-scale force noise.
        """
        from ..ops import paint as _paint_ops
        fpm = self.fpm
        N = X.shape[0]
        layout = fpm.decompose(X, **self._exch_kwargs)
        rho = fpm.paint(X, layout=layout)
        rho = rho * (float(fpm.Nmesh.prod()) / N)
        rhok = rho.r2c()
        if factor is None:
            factor = 1.5 * self.cosmology.Om0
        if mode == 'gradient':
            phi = rhok.apply(tf.poisson()).c2r()
            Xb = jax.lax.optimization_barrier(X)
            from ..parallel.exchange import (ShardedLayout,
                                             readout_sharded)
            from ..parallel.exchange2d import (ShardedLayout2D,
                                               readout_sharded2d)
            # gradient readouts return d/dpos in SIMULATION units
            # (the vjp convention), so no cell factor here
            if isinstance(layout, (ShardedLayout, ShardedLayout2D)):
                # fused: ONE exchange + ONE stencil program + ONE
                # ghost gather for all ndim derivative readouts
                a = fpm.affine
                _ro = (readout_sharded2d
                       if isinstance(layout, ShardedLayout2D)
                       else readout_sharded)
                vals = _ro(
                    layout, phi.value, Xb, a.scale,
                    fpm.resampler.window, diffdir='all',
                    translate=a.translate)
                vals = tuple(-v for v in vals)
            else:
                vals = tuple(
                    -phi.readout(Xb, layout=layout, gradient=d)
                    for d in range(fpm.ndim))
            return jnp.stack(vals, axis=-1) * factor
        elif mode != 'spectral':
            raise ValueError("mode must be 'spectral' or 'gradient'")
        meshes = tuple(
            rhok.apply(tf.force_transfer(d)).c2r().value
            for d in range(fpm.ndim))
        Xb = jax.lax.optimization_barrier(X)
        a = fpm.affine
        from ..parallel.exchange import ShardedLayout, readout_sharded
        from ..parallel.exchange2d import (ShardedLayout2D,
                                           readout_sharded2d)
        if isinstance(layout, (ShardedLayout, ShardedLayout2D)):
            # device-sharded particles: ghost images read their local
            # slab/pencil; gather('sum') reassembles the straddled
            # stencils
            _ro = (readout_sharded2d
                   if isinstance(layout, ShardedLayout2D)
                   else readout_sharded)
            vals = _ro(layout, meshes, Xb, a.scale,
                       fpm.resampler.window)
        else:
            vals = _paint_ops.readout(meshes, Xb,
                                      window=fpm.resampler.window,
                                      scale=a.scale,
                                      translate=a.translate,
                                      period=a.period)
        return jnp.stack(vals, axis=-1) * factor

    def force_staged(self, X, factor=None):
        """The same PM force as :meth:`force`, executed as separate
        jit stages (paint+fft / per-direction transfer+readout) so the
        peak HBM of any one program stays low.  Use when a single-chip
        mesh is near HBM capacity (e.g. 512^3 on v5e); inside a jitted
        scan use :meth:`force` instead."""
        from ..ops import paint as _paint_ops
        fpm = self.fpm
        N = X.shape[0]
        if factor is None:
            factor = 1.5 * self.cosmology.Om0

        # cache keyed by the particle count: the jitted closures bake
        # the density normalization N into the trace
        if not hasattr(self, '_staged_fns'):
            self._staged_fns = {}
        if N not in self._staged_fns:

            @jax.jit
            def stage_paint(X):
                rho = fpm.paint(X)
                rho = rho * (float(fpm.Nmesh.prod()) / N)
                return rho.r2c().value

            def make_dir(d):
                @jax.jit
                def stage_dir(rhok_value, X):
                    rhok = fpm.create(type='transposedcomplex',
                                      value=rhok_value)
                    mesh = rhok.apply(tf.force_transfer(d)).c2r().value
                    a = fpm.affine
                    return _paint_ops.readout(
                        mesh, X, window=fpm.resampler.window,
                        scale=a.scale, translate=a.translate,
                        period=a.period)
                return stage_dir

            self._staged_fns[N] = (
                stage_paint, [make_dir(d) for d in range(fpm.ndim)])

        stage_paint, stage_dirs = self._staged_fns[N]
        rhok_value = stage_paint(X)
        cols = [fn(rhok_value, X) for fn in stage_dirs]
        return jnp.stack(cols, axis=-1) * factor

    # --- lattice fast path -------------------------------------------
    #
    # PM particles are born on the mesh lattice and stay in lattice
    # order; storing the state as per-axis MESH-SHAPED displacement/
    # velocity fields lets paint/readout run as dense shift-sums
    # (ops/gridpm.py) with zero scatter/gather — the TPU-native
    # formulation of the reference's hot loop (examples/
    # nbody.py:199-218).  Applies while displacements stay within
    # ``bounds`` cells (tracked by the caller; see
    # gridpm.displacement_bounds).

    def lpt_lattice(self, dlinear, a0, shift=0.0, order=1):
        """LPT state in lattice form: (disp, vel) as ndim mesh-shaped
        arrays each, in units of CELLS (not box units).  Sampling the
        displacement kernels at the unshifted lattice sites makes the
        readout an identity, so the c2r mesh IS the per-particle
        displacement — no interpolation at all."""
        from ..ops import gridpm as _gp  # noqa: F401 (API affinity)
        pm = self.pm
        pt = self.cosmology
        cell = float(pm.BoxSize[0] / pm.Nmesh[0])
        DX1 = tuple(
            (dlinear.apply(tf.dx1_transfer(d)).c2r().value / cell)
            for d in range(pm.ndim))
        D1 = float(pt.D1(a0))
        f1 = float(pt.f1(a0))
        E0 = float(pt.E(a0))
        disp = tuple(dx * D1 + shift for dx in DX1)
        vel = tuple(dx * (D1 * f1 * a0 ** 2 * E0) for dx in DX1)
        if order >= 2 and pm.ndim == 3:
            # 2LPT source from strain products, as in lpt()
            def phi_ab(a, b):
                def filt(k, v):
                    k2 = k.normp(2, zeromode=1.0)
                    return v * k[a] * k[b] / k2
                return dlinear.apply(filt).c2r().value

            diag = [phi_ab(d, d) for d in range(3)]
            src = 0.0
            for a in range(3):
                for b in range(a + 1, 3):
                    src = src + (diag[a] * diag[b]
                                 - phi_ab(a, b) ** 2)
            source2 = pm.create(type=RealField, value=src).r2c()
            DX2 = tuple(
                (source2.apply(tf.dx1_transfer(d)).c2r().value / cell)
                for d in range(3))
            D2 = float(pt.D2(a0))
            f2 = float(pt.f2(a0))
            disp = tuple(s + dx2 * D2 for s, dx2 in zip(disp, DX2))
            vel = tuple(v + dx2 * (D2 * f2 * a0 ** 2 * E0)
                        for v, dx2 in zip(vel, DX2))
        return disp, vel

    def _mxu_force_meshes(self, rho, precision=None,
                          spectrum_dtype=None):
        """differentiable spectral force meshes via the MXU FFT.

        The force triple is LINEAR in rho and each direction is a
        circular convolution with a real ODD kernel (i*k_d/k^2 is
        imaginary-odd), so the real transpose is its own negative:
        T_d^T = -T_d.  jax.custom_derivatives.linear_call wires both
        AD modes from that identity — jvp is the operator itself,
        vjp applies -T_d to each cotangent mesh (one x-pass + one
        zy-inverse per direction via ``only=d``; no tape, nothing
        saved).  Mirrors the reference's analytic c2r_vjp/r2c_vjp
        pairing (pmesh/pm.py:865-870, 1021-1026) on the fused
        operator instead of per-transform."""
        from jax import custom_derivatives as _cd

        def fun(_, rho):
            return self._mxu_force_raw(rho, precision,
                                       spectrum_dtype)

        def fun_t(_, ct):
            acc = None
            for d in range(3):
                f = self._mxu_force_raw(ct[d], precision,
                                        spectrum_dtype, only=d)
                acc = f if acc is None else acc + f
            return -acc

        return _cd.linear_call(fun, fun_t, (), rho)

    def _mxu_setup(self):
        """shared static config of the MXU spectral paths: mesh
        shape, k^2 tables, SuperLanczos difference kernels, the
        sharding procmesh (even meshes only) and the ct2 eligibility
        flag."""
        import numpy as np
        from ..ops import fft_mxu
        fpm = self.fpm
        shape = tuple(int(n) for n in fpm.Nmesh)
        if not hasattr(self, '_mxu_cache'):
            # hermitian-half z axis throughout (fft_mxu half variants)
            ks = [np.fft.fftfreq(n, d=float(b) / n) * 2 * np.pi
                  for n, b in zip(shape[:2], fpm.BoxSize[:2])]
            ks.append(np.fft.rfftfreq(
                shape[2], d=float(fpm.BoxSize[2]) / shape[2])
                * 2 * np.pi)
            # SuperLanczos order-1 difference kernel, matching
            # tf.force_transfer's default (examples/nbody.py:162-169);
            # it vanishes at Nyquist, which the half-spectrum gradient
            # requires
            kd = []
            for d, n in enumerate(shape):
                cell = float(fpm.BoxSize[d]) / n
                w = ks[d] * cell
                kd.append(tuple(
                    (1.0 / (6.0 * cell)
                     * (8 * np.sin(w) - np.sin(2 * w))).tolist()))
            # cache PLAIN numpy: jnp constants created inside a trace
            # are trace-bound and would leak into later traces
            self._mxu_cache = (
                tuple((k ** 2).astype('f4') for k in ks), tuple(kd))
        k2_np, kd = self._mxu_cache
        pmh = fpm.procmesh if (fpm.procmesh is not None
                               and fpm.procmesh.size > 1
                               and fpm._even_mesh) else None
        # Cooley-Tukey factored x/y axes when they split as R*128k:
        # R-fold fewer MACs at full MXU contraction, with the
        # z-Nyquist plane split off so every block is 128-lane
        # aligned (fft_mxu ct2 pipeline).  The spectrum is
        # chunk-permuted, so permute the k^2 tables to match; kvecs
        # stay natural (the CT inverse permutes internally).
        ct = (fft_mxu._ct_factor(shape[0])[0] > 1
              and fft_mxu._ct_factor(shape[1])[0] > 1
              and shape[2] % 2 == 0
              and (pmh is None or (shape[0] % pmh.size == 0
                                   and shape[1] % pmh.size == 0)))
        return shape, k2_np, kd, pmh, ct


    def _potential_mesh(self, rho, fft):
        """the (tf.poisson-signed) potential of a painted 1+delta
        density: the ct2 MXU route when eligible (one x-pass + one
        zy-inverse, fft_mxu.fft3_poisson_half_ct2), else the field
        path — shared by the lattice and binned gradient-mode
        forces."""
        fpm = self.fpm
        phi = None
        if fft.startswith('mxu') and fpm.ndim == 3 \
                and jnp.dtype(rho.dtype) == jnp.float32:
            phi = self._mxu_potential(
                rho, precision=('bf16' if fft == 'mxu_bf16'
                                else None),
                spectrum_dtype=(jnp.bfloat16 if fft == 'mxu_bf16s'
                                else None))
        if phi is None:
            phi = fpm.create(type=RealField, value=rho).r2c() \
                .apply(tf.poisson()).c2r().value
        return phi

    def _mxu_potential(self, rho, precision=None,
                       spectrum_dtype=None):
        """differentiable Poisson potential via the MXU ct2 FFT —
        ONE x-pass (1/k^2 folded) + ONE zy-inverse, vs the force
        triple's dual x-pass + three.  The operator is a circular
        convolution with a real EVEN kernel (1/k^2), hence
        self-adjoint: linear_call transpose = itself.  Returns None
        at non-ct2 shapes (caller falls back to the field path)."""
        from jax import custom_derivatives as _cd
        _, _, _, _, ct = self._mxu_setup()
        if not ct:
            return None

        def fun(_, rho):
            return self._mxu_potential_raw(rho, precision,
                                           spectrum_dtype)

        return _cd.linear_call(fun, lambda _, ct_: fun(_, ct_),
                               (), rho)

    def _mxu_potential_raw(self, rho, precision=None,
                           spectrum_dtype=None):
        from ..ops import fft_mxu
        shape, k2_np, kd, pmh, ct = self._mxu_setup()
        assert ct
        pk2 = tuple(tuple(float(v) for v in k) for k in k2_np)
        if pmh is not None:
            r, i, nqr, nqi = \
                fft_mxu.fft3_real_forward_half_ct2_sharded(
                    pmh, rho, precision=precision,
                    spectrum_dtype=spectrum_dtype)
            return fft_mxu.fft3_poisson_half_ct2_sharded(
                pmh, r, i, nqr, nqi, n2=shape[2], poisson_k2=pk2,
                precision=precision)
        r, i, nqr, nqi = fft_mxu.fft3_real_forward_half_ct2(
            rho, precision=precision, spectrum_dtype=spectrum_dtype)
        return fft_mxu.fft3_poisson_half_ct2(
            r, i, nqr, nqi, n2=shape[2], poisson_k2=pk2,
            precision=precision)

    def _mxu_force_raw(self, rho, precision=None,
                       spectrum_dtype=None, only=None):
        """spectral force meshes via the MXU DFT-matmul FFT
        (ops/fft_mxu.py): one real forward, 1/k^2 applied to the full
        (re, im) spectrum, and the i*k_d force kernel FOLDED into the
        per-axis inverse DFT matrices — three inverse transforms, no
        extra elementwise passes.

        spectrum_dtype=jnp.bfloat16: ct2-path spectra are STORED bf16
        (matmuls stay f32) — half the spectrum HBM and a2a traffic.
        Non-ct2 fallback shapes ignore it (f32 storage).

        only: None for the (fx, fy, fz) triple, or 0/1/2 for a single
        direction (the linear-transpose backward path)."""
        from ..ops import fft_mxu
        fpm = self.fpm
        shape, k2_np, kd, pmh, ct = self._mxu_setup()

        def _invk2(k2):
            return jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0),
                             0.0)

        if ct:
            # the 1/k^2 Poisson filter folds into the inverse x-pass
            # kernel from NATURAL-order 1-d tables (fft_mxu applies
            # the storage permutation internally) — no elementwise
            # pass over the spectrum at all
            pk2 = tuple(tuple(float(v) for v in k) for k in k2_np)
            if pmh is not None:
                r, i, nqr, nqi = \
                    fft_mxu.fft3_real_forward_half_ct2_sharded(
                        pmh, rho, precision=precision,
                        spectrum_dtype=spectrum_dtype)
                return \
                    fft_mxu.fft3_real_inverse_grad3_half_ct2_sharded(
                        pmh, r, i, nqr, nqi, n2=shape[2], kvecs=kd,
                        precision=precision, poisson_k2=pk2,
                        only=only)
            r, i, nqr, nqi = fft_mxu.fft3_real_forward_half_ct2(
                rho, precision=precision,
                spectrum_dtype=spectrum_dtype)
            return fft_mxu.fft3_real_inverse_grad3_half_ct2(
                r, i, nqr, nqi, n2=shape[2], kvecs=kd,
                precision=precision, poisson_k2=pk2, only=only)

        k2_1d = tuple(jnp.asarray(k) for k in k2_np)
        if pmh is not None:
            # pencil execution: pass 1 local per slab, all_to_all
            # transpose, x-pass local on the transposed layout
            r, i = fft_mxu.fft3_real_forward_half_sharded(
                pmh, rho, precision=precision)
        else:
            r, i = fft_mxu.fft3_real_forward_half(
                rho, precision=precision)
        # 1/k^2 built in-graph from three (N,) constants; the tie to
        # `r` stops XLA from constant-folding the (N,N,N) product into
        # a 512 MB program literal (the remote compiler rejects those)
        tie = 0.0 * r[0, 0, 0]
        k2 = ((k2_1d[0] + tie)[:, None, None]
              + k2_1d[1][None, :, None] + k2_1d[2][None, None, :])
        invk2 = _invk2(k2)
        pr = r * invk2
        pi = i * invk2
        if pmh is not None:
            out = fft_mxu.fft3_real_inverse_grad3_half_sharded(
                pmh, pr, pi, n2=shape[2], kvecs=kd,
                precision=precision)
        else:
            out = fft_mxu.fft3_real_inverse_grad3_half(
                pr, pi, n2=shape[2], kvecs=kd, precision=precision)
        # non-ct fallback shapes: the triple is computed whole; the
        # backward path just takes its direction (correct, 3x the
        # work — production ct2 sizes use the efficient only= path)
        return out if only is None else out[only]

    def force_lattice(self, disp, bounds, factor=None, mode='spectral',
                      fft='xla'):
        """PM gravity force at the lattice particles.

        Parameters
        ----------
        disp : tuple of ndim mesh-shaped displacement arrays (cells).
        bounds : (lo, hi) static displacement bounds in cells.
        mode : 'spectral' | 'gradient'
            'spectral' differentiates in k-space (3 inverse FFTs, the
            examples/nbody.py:199-218 pipeline).  'gradient' solves
            one Poisson inverse FFT for the potential and takes the
            force from the derivative-window readout (K' kernels) —
            the finite-difference force family the reference's QPM
            app uses (transfer.py SuperLanzcos; window diff kernels);
            3x less FFT work, slightly more small-scale force noise.

        Returns the ndim force meshes (per-axis force at each
        particle, in box-unit acceleration), jittable end to end.
        """
        from ..ops import gridpm as _gp
        fpm = self.fpm
        if tuple(fpm.Nmesh) != tuple(self.pm.Nmesh):
            raise ValueError("the lattice path needs B=1 "
                             "(force mesh == particle lattice)")
        if factor is None:
            factor = 1.5 * self.cosmology.Om0
        cell = float(fpm.BoxSize[0] / fpm.Nmesh[0])
        kind = fpm.resampler.window.kind
        # on a device mesh the pallas kernels run per-slab inside
        # shard_map with ring halo exchange (ops/gridpm._shift_sharded)
        pmh = fpm.procmesh if (fpm.procmesh is not None
                               and fpm.procmesh.size > 1
                               and fpm._even_mesh) else None
        impl = None

        rho = _gp.paint_grid(disp, bounds=bounds, window=kind,
                             impl=impl, procmesh=pmh)
        if fft not in ('xla', 'mxu', 'mxu_bf16', 'mxu_bf16s'):
            raise ValueError("unknown fft backend %r (use 'xla', "
                             "'mxu', 'mxu_bf16' or 'mxu_bf16s')"
                             % (fft,))
        if mode == 'spectral' and fft.startswith('mxu'):
            if fpm.ndim != 3:
                raise ValueError("fft='mxu' is 3-d only")
            if jnp.dtype(rho.dtype) != jnp.float32:
                raise ValueError(
                    "fft='mxu' computes in f32 (MXU matmuls); use a "
                    "dtype='f4' mesh or fft='xla' for f64 runs")
            # 'mxu' = f32-exact (3-pass matmuls, 6e-8 vs jnp.fft);
            # 'mxu_bf16' = single-pass bf16 matmuls, ~1.6e-4 relative
            # force error — far below the SuperLanczos-vs-spectral
            # stencil difference, and ~2.7x faster on the FFT passes;
            # 'mxu_bf16s' = f32 matmuls with bf16 spectrum STORAGE
            # (half the spectrum HBM + ICI a2a traffic, ~1e-3
            # spectrum rounding; ct2 sizes only)
            meshes = self._mxu_force_meshes(
                rho, precision='bf16' if fft == 'mxu_bf16' else None,
                spectrum_dtype=(jnp.bfloat16 if fft == 'mxu_bf16s'
                                else None))
            vals = _gp.readout_grid(meshes, disp, bounds=bounds,
                                    window=kind, impl=impl,
                                    procmesh=pmh)
            return tuple(v * factor for v in vals)
        if mode == 'spectral':
            rhok = fpm.create(type=RealField, value=rho).r2c()
            meshes = tuple(
                rhok.apply(tf.force_transfer(d)).c2r().value
                for d in range(fpm.ndim))
            vals = _gp.readout_grid(meshes, disp, bounds=bounds,
                                    window=kind, impl=impl,
                                    procmesh=pmh)
        elif mode == 'gradient':
            # F_d = -d(phi)/dx_d; the diffdir readout returns the
            # derivative of the interpolation w.r.t. position in cell
            # units (see gridpm.readout_grid), so F_d = -readout_d/cell
            phi = self._potential_mesh(rho, fft)
            if fpm.ndim == 3:
                # one fused pass: 3 derivative readouts sharing the
                # plane rolls (diffdir='all')
                rds = _gp.readout_grid(phi, disp, bounds=bounds,
                                       window=kind, diffdir='all',
                                       impl=impl, procmesh=pmh)
                vals = tuple(-r / cell for r in rds)
            else:
                vals = tuple(
                    -_gp.readout_grid(phi, disp, bounds=bounds,
                                      window=kind, diffdir=d,
                                      impl=impl, procmesh=pmh) / cell
                    for d in range(fpm.ndim))
        else:
            raise ValueError("mode must be 'spectral' or 'gradient'")
        # transfers work in box wavenumbers; acceleration comes out in
        # box units per unit kick factor, as in force()
        return tuple(v * factor for v in vals)

    def _spectral_meshes(self, rho, fft):
        """the 3 directional force meshes of a painted (1+delta)
        density — shared by the lattice and binned paths."""
        fpm = self.fpm
        if fft in ('mxu', 'mxu_bf16', 'mxu_bf16s'):
            if fpm.ndim != 3:
                raise ValueError("fft='mxu' is 3-d only")
            if jnp.dtype(rho.dtype) != jnp.float32:
                raise ValueError(
                    "fft='mxu' computes in f32 (MXU matmuls); use a "
                    "dtype='f4' mesh or fft='xla' for f64 runs")
            return self._mxu_force_meshes(
                rho, precision='bf16' if fft == 'mxu_bf16' else None,
                spectrum_dtype=(jnp.bfloat16 if fft == 'mxu_bf16s'
                                else None))
        rhok = fpm.create(type=RealField, value=rho).r2c()
        return tuple(rhok.apply(tf.force_transfer(d)).c2r().value
                     for d in range(fpm.ndim))

    # --- binned slot-lattice path ------------------------------------
    #
    # Arbitrary particle distributions (clustered late-time states,
    # external catalogs) as nslots sub-lattices with displacements
    # always in [0, 1)+drift — the general-position path without a
    # single scatter (ops/binned.py).  The reference handles this
    # regime with its per-particle C scatter loop
    # (_window_generics.h:21-72).

    def force_binned(self, dslots, valid, bounds, factor=None,
                     fft='xla', mode='spectral'):
        """PM gravity for a binned state: per-slot force value fields
        (mask with ``valid``; invalid slots are garbage).

        mode='gradient' solves ONE Poisson inverse and reads the
        potential with the fused 3-derivative window per slot —
        nslots readout passes instead of 3*nslots."""
        from ..ops import binned as _bn
        fpm = self.fpm
        if factor is None:
            factor = 1.5 * self.cosmology.Om0
        pmh = fpm.procmesh if (fpm.procmesh is not None
                               and fpm.procmesh.size > 1
                               and fpm._even_mesh) else None
        kind = fpm.resampler.window.kind
        rho = _bn.paint_binned(dslots, valid, bounds=bounds,
                               window=kind, procmesh=pmh)
        # normalize to 1+delta for a general particle count
        ntot = sum(jnp.sum(v) for v in valid)
        rho = rho * (float(fpm.Nmesh.prod()) / ntot)
        if mode == 'gradient':
            cell = float(fpm.BoxSize[0] / fpm.Nmesh[0])
            phi = self._potential_mesh(rho, fft)
            vals = _bn.readout_binned(phi, dslots, valid,
                                      bounds=bounds, window=kind,
                                      procmesh=pmh, diffdir='all')
            return tuple(tuple(-v * factor / cell for v in slot)
                         for slot in vals)
        elif mode != 'spectral':
            raise ValueError("mode must be 'spectral' or 'gradient'")
        meshes = self._spectral_meshes(rho, fft)
        vals = _bn.readout_binned(meshes, dslots, valid,
                                  bounds=bounds, window=kind,
                                  procmesh=pmh)
        return tuple(tuple(v * factor for v in slot) for slot in vals)

    def nbody_binned(self, disp, vel, time_steps, nslots=2,
                     rebase_every=4, step_drift=0.25,
                     factors='fastpm', scheme='symp2', fft='xla',
                     force_mode='spectral', adaptive=False):
        """KDK loop on the binned state with periodic dense rebase:
        displacements stay within (-drift, 1+drift) cells FOREVER —
        no nv^3 cost wall, no silent mass loss (a rebase overflow or
        an out-of-budget drift poisons the state with NaN and is
        reported in the returned overflow count).

        ``disp``/``vel`` are lattice-form per-axis mesh fields (cell
        units); ``step_drift`` bounds |velocity * dt| per step
        (checked at every rebase by construction: escaping particles
        poison).  Returns (dslots, vslots, valid, overflow).

        ``adaptive=True`` runs the superstep loop host-side and
        MEASURES the needed slot count before every rebase
        (ops/binned.needed_slots): a cell exceeding ``nslots`` grows
        the state instead of poisoning it — the role of the
        reference's any-clustering per-particle loop
        (pmesh/_window_generics.h:21-72).  Each slot-count change
        recompiles the step program once; deep runs grow K a handful
        of times, so the cost is a few extra compiles, not per-step
        work.  The returned state's slot count is ``len(dslots)``.
        """
        if adaptive:
            return self._nbody_binned_adaptive(
                disp, vel, time_steps, nslots, rebase_every,
                step_drift, factors, scheme, fft, force_mode)
        from ..ops import binned as _bn
        fac = _FACTORS[factors](self.cosmology) \
            if isinstance(factors, str) else factors
        K1, D1s, K2 = leapfrog_factors(time_steps, fac, scheme)
        # coefficients ride the scan in the STATE dtype: under
        # x64 they would otherwise promote an f4 state to f8
        # mid-scan (carry type mismatch)
        K1, D1s, K2 = (a.astype(self.pm.dtype)
                       for a in (K1, D1s, K2))
        cell = float(self.pm.BoxSize[0] / self.pm.Nmesh[0])
        drift = float(step_drift) * rebase_every
        bounds = (-drift, 1.0 + drift)
        nsteps = len(K1)
        pmh = self.pm.procmesh if (self.pm.procmesh is not None
                                   and self.pm.procmesh.size > 1
                                   and self.pm._even_mesh) \
            else None

        # fold any initial excursion into the slots right away
        if pmh is None:
            # sort-based fold: any excursion, O(N) memory
            dslots, vslots, valid, overflow = _fold_prog(nslots)(
                disp, vel)
        else:
            # sharded: the plane-walk rebase keeps the slab layout —
            # as ONE jit program: called eagerly, the rebase kernel
            # outputs and the poison-add copies would coexist with
            # the whole old state (measured RESOURCE_EXHAUSTED at
            # 384^3 on the 16 GB chip before any KDK step ran)
            dslots, vslots, valid = _bn.from_lattice(disp, vel,
                                                     nslots=nslots)
            lo0 = float(jnp.min(jnp.stack([jnp.min(d) for dk in dslots
                                           for d in dk])))
            hi0 = float(jnp.max(jnp.stack([jnp.max(d) for dk in dslots
                                           for d in dk])))
            dslots, vslots, valid, overflow = _rebase_prog(
                (min(lo0, 0.0), max(hi0, 1.0)), None, pmh,
                donate=False)(dslots, vslots, valid)

        def force_cells(dslots, valid):
            F = self.force_binned(dslots, valid, bounds, fft=fft,
                                  mode=force_mode)
            return tuple(tuple(f / cell for f in slot) for slot in F)

        def step(carry, coeffs):
            dslots, vslots, valid, F = carry
            k1, d1, k2 = coeffs
            vslots = tuple(tuple(v + f * k1 for v, f in zip(vk, fk))
                           for vk, fk in zip(vslots, F))
            dslots = tuple(tuple(s + v * d1 for s, v in zip(dk, vk))
                           for dk, vk in zip(dslots, vslots))
            F = force_cells(dslots, valid)
            vslots = tuple(tuple(v + f * k2 for v, f in zip(vk, fk))
                           for vk, fk in zip(vslots, F))
            return (dslots, vslots, valid, F), None

        def superstep(carry, coeffs):
            # R KDK steps then a rebase.  The force is recomputed
            # after the rebase rather than riding it as an extra:
            # carrying F through the rebase costs 3*nslots mesh
            # fields of peak HBM twice over (measured OOM at 512^3
            # K=2 on a 16 GB chip); one extra force per superstep is
            # the cheaper currency.
            dslots, vslots, valid, F, overflow = carry
            (dslots, vslots, valid, F), _ = jax.lax.scan(
                step, (dslots, vslots, valid, F), coeffs)
            del F
            dslots, valid, (vslots,), ov = _bn.rebase(
                dslots, valid, bounds, extras=(vslots,),
                procmesh=pmh)
            F = force_cells(dslots, valid)
            return (dslots, vslots, valid, F,
                    overflow + ov), None

        R = int(rebase_every)
        nsuper = nsteps // R
        rem = nsteps - nsuper * R

        @_scoped_jit
        def run(dslots, vslots, valid, overflow):
            F = force_cells(dslots, valid)
            carry = (dslots, vslots, valid, F, overflow)
            if nsuper:
                cm = tuple(c[:nsuper * R].reshape((nsuper, R))
                           for c in (K1, D1s, K2))
                carry, _ = jax.lax.scan(superstep, carry, cm)
            if rem:
                dslots, vslots, valid, F, overflow = carry
                (dslots, vslots, valid, F), _ = jax.lax.scan(
                    step, (dslots, vslots, valid, F),
                    (K1[-rem:], D1s[-rem:], K2[-rem:]))
                dslots, valid, (vslots,), ov = _bn.rebase(
                    dslots, valid, bounds, extras=(vslots,),
                    procmesh=pmh)
                carry = (dslots, vslots, valid, F, overflow + ov)
            dslots, vslots, valid, F, overflow = carry
            return dslots, vslots, valid, overflow

        return run(dslots, vslots, valid, overflow)

    def _nbody_binned_adaptive(self, disp, vel, time_steps, nslots,
                               rebase_every, step_drift, factors,
                               scheme, fft, force_mode):
        """Host-driven superstep loop with measured slot growth (see
        :meth:`nbody_binned` adaptive=True).  The KDK chunk between
        rebases stays one jitted lax.scan; only the rebase boundary
        syncs a scalar (the needed slot count) to the host."""
        from ..ops import binned as _bn
        fac = _FACTORS[factors](self.cosmology) \
            if isinstance(factors, str) else factors
        K1, D1s, K2 = leapfrog_factors(time_steps, fac, scheme)
        K1, D1s, K2 = (a.astype(self.pm.dtype)
                       for a in (K1, D1s, K2))
        cell = float(self.pm.BoxSize[0] / self.pm.Nmesh[0])
        drift = float(step_drift) * rebase_every
        bounds = (-drift, 1.0 + drift)
        nsteps = len(K1)
        pmh = self.pm.procmesh if (self.pm.procmesh is not None
                                   and self.pm.procmesh.size > 1
                                   and self.pm._even_mesh) \
            else None

        def force_cells(dslots, valid):
            F = self.force_binned(dslots, valid, bounds, fft=fft,
                                  mode=force_mode)
            return tuple(tuple(f / cell for f in slot) for slot in F)

        chunk_cache = {}

        def kdk_chunk(K, R):
            # jitted per (slot count, chunk length): K changes are
            # rare (growth events), R changes twice (body + remainder).
            # The state is donated: at 384^3 K=4 the chunk's args
            # (6.1 GB) plus its temp arena would otherwise brush the
            # 16 GB chip.
            if (K, R) not in chunk_cache:
                @functools.partial(_scoped_jit,
                                   donate_argnums=(0, 1))
                def run(dslots, vslots, valid, coeffs):
                    F = force_cells(dslots, valid)

                    def step(carry, co):
                        dslots, vslots, valid, F = carry
                        k1, d1, k2 = co
                        vslots = tuple(
                            tuple(v + f * k1 for v, f in zip(vk, fk))
                            for vk, fk in zip(vslots, F))
                        dslots = tuple(
                            tuple(s + v * d1 for s, v in zip(dk, vk))
                            for dk, vk in zip(dslots, vslots))
                        F = force_cells(dslots, valid)
                        vslots = tuple(
                            tuple(v + f * k2 for v, f in zip(vk, fk))
                            for vk, fk in zip(vslots, F))
                        return (dslots, vslots, valid, F), None

                    (dslots, vslots, valid, F), _ = jax.lax.scan(
                        step, (dslots, vslots, valid, F), coeffs)
                    return dslots, vslots, valid
                chunk_cache[(K, R)] = run
            return chunk_cache[(K, R)]

        need_cache = {}

        def needed(dslots, valid, b):
            K = len(dslots)
            if (K, b) not in need_cache:
                need_cache[(K, b)] = jax.jit(functools.partial(
                    _bn.needed_slots, drift_bounds=b))
            return int(need_cache[(K, b)](dslots, valid))

        growth_events = 0
        if pmh is None:
            # sort-based fold: measures the needed slot count from
            # the in-cell ranks, then folds ANY initial excursion in
            # O(N) memory (the roll-rebase on wide bounds OOMs —
            # see _fold_prog)
            K = max(nslots, int(jax.jit(_bn.fold_needed)(disp)))
            dslots, vslots, valid, overflow = _fold_prog(K)(disp,
                                                            vel)
        else:
            dslots, vslots, valid = _bn.from_lattice(disp, vel,
                                                     nslots=nslots)
            lo0 = float(jnp.min(jnp.stack([jnp.min(d) for dk in dslots
                                           for d in dk])))
            hi0 = float(jnp.max(jnp.stack([jnp.max(d) for dk in dslots
                                           for d in dk])))
            b0 = (min(lo0, 0.0), max(hi0, 1.0))
            K = max(nslots, needed(dslots, valid, b0))
            dslots, vslots, valid, overflow = _rebase_prog(
                b0, K, pmh, donate=False)(dslots, vslots, valid)
        overflow = int(overflow)
        if K > nslots:
            # the initial fold already grew the state — evidence the
            # adaptive machinery ran, same as a loop growth
            growth_events += 1

        R = int(rebase_every)
        done = 0
        while done < nsteps:
            r = min(R, nsteps - done)
            coeffs = (K1[done:done + r], D1s[done:done + r],
                      K2[done:done + r])
            dslots, vslots, valid = kdk_chunk(K, r)(
                dslots, vslots, valid, coeffs)
            done += r
            Kout = max(K, needed(dslots, valid, bounds))
            if Kout > K:
                growth_events += 1
            dslots, vslots, valid, ov = _rebase_prog(
                bounds, Kout, pmh)(dslots, vslots, valid)
            overflow += int(ov)
            K = Kout
        # observability for benches/monitors: how often the state grew
        # (each growth = one recompile of the KDK chunk) and where it
        # ended up — the adaptive analog of the reference's
        # any-occupancy per-particle loop (_window_generics.h:21-72)
        self.last_binned_stats = {'growth_events': growth_events,
                                  'final_nslots': K,
                                  'overflow': overflow}
        return dslots, vslots, valid, jnp.asarray(overflow,
                                                  jnp.int32)

    def nbody_lattice(self, disp, vel, time_steps, bounds,
                      factors='fastpm', scheme='symp2',
                      force_mode='spectral', fft='xla'):
        """KDK loop in lattice form: one jitted lax.scan, state =
        2*ndim mesh-shaped arrays.  ``vel`` and the kick are in the
        same cell units as ``disp``."""
        fac = _FACTORS[factors](self.cosmology) \
            if isinstance(factors, str) else factors
        K1, D1s, K2 = leapfrog_factors(time_steps, fac, scheme)
        # coefficients ride the scan in the STATE dtype: under
        # x64 they would otherwise promote an f4 state to f8
        # mid-scan (carry type mismatch)
        K1, D1s, K2 = (a.astype(self.pm.dtype)
                       for a in (K1, D1s, K2))
        cell = float(self.pm.BoxSize[0] / self.pm.Nmesh[0])

        def force_cells(disp):
            F = self.force_lattice(disp, bounds, mode=force_mode,
                                   fft=fft)
            return tuple(f / cell for f in F)

        from ..ops.gridpm import displacement_bounds

        def poison(S, V, lo, hi):
            # a displacement outside the static bounds would silently
            # lose mass in the shift-sum paint; fold a NaN into the
            # state THE MOMENT it happens (the exchange.py badness
            # discipline — never a warning after wrong numbers).
            # Both S and V are poisoned explicitly: the window-weight
            # `where` masks would otherwise swallow the NaN on its way
            # through the force pipeline.  Callers that need headroom
            # widen `bounds` or use the binned path (which rebases
            # instead of poisoning).
            bad = jnp.where((lo < bounds[0]) | (hi > bounds[1]),
                            jnp.nan, 0.0).astype(S[0].dtype)
            return (tuple(s + bad for s in S),
                    tuple(v + bad for v in V))

        def step(carry, coeffs):
            S, V, F, lo, hi = carry
            k1, d1, k2 = coeffs
            V = tuple(v + f * k1 for v, f in zip(V, F))
            S = tuple(s + v * d1 for s, v in zip(S, V))
            # track the RUN-WIDE displacement extremes and poison
            # in-scan on a breach — a transient excursion past the
            # static bounds drops mass even if the final state is
            # back inside, so it must never pass silently
            slo, shi = displacement_bounds(S)
            lo = jnp.minimum(lo, slo)
            hi = jnp.maximum(hi, shi)
            S, V = poison(S, V, slo, shi)
            F = force_cells(S)
            V = tuple(v + f * k2 for v, f in zip(V, F))
            return (S, V, F, lo, hi), None

        @jax.jit
        def run(S, V):
            lo, hi = displacement_bounds(S)
            S, V = poison(S, V, lo, hi)
            F = force_cells(S)
            (S, V, F, lo, hi), _ = jax.lax.scan(
                step, (S, V, F, lo, hi), (K1, D1s, K2))
            return S, V, lo, hi

        S, V, flo, fhi = run(tuple(disp), tuple(vel))
        return S, V

    # --- time integration ---
    def nbody(self, state, time_steps, factors='fastpm', scheme='symp2',
              monitor=None, force_mode='spectral', rebalance=None):
        """Run the KDK loop.  With monitor=None and rebalance=None the
        whole loop is one jitted lax.scan; a monitor callback (or
        rebalance) forces per-step python stepping (for
        snapshots/logging).  force_mode: 'spectral' or 'gradient'
        (see :meth:`force`).

        rebalance : None or float
            measured-load-driven re-layout (the reference assigns
            uneven domains to ranks from measured N^gamma load,
            domain.py:468-499; TPU slabs stay equal so balance is
            restored by re-sorting particles instead): after each
            step the per-device ghost+paint work imbalance
            (:func:`~pmesh_tpu.parallel.exchange.measure_load`) is
            measured, and when max/mean exceeds this threshold the
            particle arrays are resharded into home-slab quantile
            order and the exchange capacity re-tuned.  Forces python
            stepping (the measurement host-syncs).  Try 1.5.
        """
        fac = _FACTORS[factors](self.cosmology) \
            if isinstance(factors, str) else factors
        K1, D1s, K2 = leapfrog_factors(time_steps, fac, scheme)
        # coefficients ride the scan in the STATE dtype: under
        # x64 they would otherwise promote an f4 state to f8
        # mid-scan (carry type mismatch)
        K1, D1s, K2 = (a.astype(self.pm.dtype)
                       for a in (K1, D1s, K2))

        # measure the exchange capacity once on the (concrete) initial
        # state — the scan body can then build capacity-padded plans
        # with static shapes; later drift beyond the slack poisons
        if (self.fpm.procmesh is not None
                and self.fpm.procmesh.size > 1
                and not self._exch_kwargs):
            import jax.core as _core
            if not isinstance(state.Q, _core.Tracer):
                self.tune_exchange(state.X)

        force = functools.partial(self.force, mode=force_mode)

        def step(carry, coeffs, Q):
            S, V, F = carry
            k1, d1, k2 = coeffs
            V = V + F * k1
            S = S + V * d1
            F = force(Q + S)
            V = V + F * k2
            return (S, V, F), None

        if monitor is None and rebalance is None:
            @jax.jit
            def run(S, V):
                F = force(state.Q + S)
                (S, V, F), _ = jax.lax.scan(
                    functools.partial(step, Q=state.Q),
                    (S, V, F), (K1, D1s, K2))
                return S, V
            S, V = run(state.S, state.V)
            return State(state.Q, S, V)

        fpm = self.fpm
        sharded = (fpm.procmesh is not None and fpm.procmesh.size > 1
                   and (fpm._even_mesh or fpm._uneven1d
                        or fpm._pencil2d))
        F = force(state.X)
        Q, S, V = state.Q, state.S, state.V
        for i, (ai, af) in enumerate(zip(time_steps[:-1],
                                         time_steps[1:])):
            (S, V, F), _ = step((S, V, F),
                                (K1[i], D1s[i], K2[i]), Q)
            if rebalance is not None and sharded:
                X = Q + S
                smoothing = fpm.resampler.support * 0.5
                if fpm._pencil2d:
                    from ..parallel import exchange2d as _ex2
                    g0 = X[:, 0] * jnp.asarray(fpm.affine.scale[0],
                                               X.dtype)
                    g1 = X[:, 1] * jnp.asarray(fpm.affine.scale[1],
                                               X.dtype)
                    self.last_load = _ex2.measure_load2d(
                        fpm.procmesh, g0, g1, int(fpm.Nmesh[0]),
                        int(fpm.Nmesh[1]), smoothing,
                        ksides=self._exch_kwargs.get('kside'))
                else:
                    from ..parallel import exchange as _ex
                    g0 = X[:, 0] * jnp.asarray(fpm.affine.scale[0],
                                               X.dtype)
                    self.last_load = _ex.measure_load(
                        fpm.procmesh, g0, int(fpm.Nmesh[0]),
                        smoothing,
                        kside=self._exch_kwargs.get('kside'))
                if self.last_load['imbalance'] > float(rebalance):
                    _, Q, S, V, F = fpm.reshard_particles(
                        X, Q, S, V, F)
                    self._exch_kwargs = {}
                    self.tune_exchange(Q + S)
            if monitor is not None:
                monitor(af, State(Q, S, V))
        return State(Q, S, V)


def lpt(pm, dlinear, a0, cosmology=None, order=2, shift=0.0):
    """Convenience: LPT state without constructing a Solver."""
    return Solver(pm, cosmology).lpt(dlinear, a0, order=order,
                                     shift=shift)
