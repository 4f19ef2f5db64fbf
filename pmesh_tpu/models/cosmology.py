"""Cosmology background functions for the N-body applications.

Replaces the reference's nbody/cosmology.py (romberg/spline Dplus,
FOmega, Ea) and its use of nbodykit's PerturbationGrowth in
examples/nbody.py:10-11.  Flat-ish LCDM background; the linear growth
ODE is solved once at construction on a dense log-a grid (host-side
RK4, no scipy dependency in the hot path) and interpolated with jnp
so growth factors can be used inside jitted steppers.

Conventions (matching FastPM / nbodykit PerturbationGrowth):
  E(a)    = H(a)/H0 = sqrt(Om0 a^-3 + Ok0 a^-2 + Ol0)
  D1(a)   linear growth, normalized D1(1) = 1
  f1(a)   = dlnD1/dlna
  D2(a)   second-order growth (D2 ~ -3/7 D1^2 at early times)
  Gp = D1, gp = dD1/da, Gf = D1' a^3 E, gf = dGf/da
"""
import numpy as np
import jax.numpy as jnp

__all__ = ["Cosmology", "Planck15"]


class Cosmology(object):
    def __init__(self, Om0=0.3089, Ol0=None, h=0.6774, sigma8=0.8159,
                 ns=0.9667, Ob0=0.0486, Tcmb0=0.0):
        self.Om0 = float(Om0)
        self.Ol0 = float(1.0 - Om0) if Ol0 is None else float(Ol0)
        self.Ok0 = 1.0 - self.Om0 - self.Ol0
        self.h = float(h)
        self.sigma8 = float(sigma8)
        self.ns = float(ns)
        self.Ob0 = float(Ob0)
        self.Tcmb0 = float(Tcmb0)
        self._solve_growth()

    # --- background ---
    def efunc(self, a):
        a = jnp.asarray(a)
        return jnp.sqrt(self.Om0 * a ** -3 + self.Ok0 * a ** -2 + self.Ol0)

    E = efunc

    def Ea(self, z):
        """E as a function of redshift (reference cosmology.py Ea)."""
        return self.efunc(1.0 / (1.0 + jnp.asarray(z)))

    def Om(self, a):
        a = jnp.asarray(a)
        return self.Om0 * a ** -3 / self.efunc(a) ** 2

    # --- growth ODE ---
    def _solve_growth(self):
        # D'' + (3/a + E'/E) D' - (3/2) Om(a)/a^2 D = 0, in lna.
        # Using x = lna: D,xx + (2 + E'a/E) D,x = 3/2 Om(a) D.
        # Solve first and second order growth together:
        #   second order: D2,xx + (2 + Elog) D2,x = 3/2 Om (D2 - D1^2)
        lna = np.linspace(np.log(1e-4), np.log(2.0), 2048)
        dx = lna[1] - lna[0]

        def Om_np(a):
            E2 = self.Om0 * a ** -3 + self.Ok0 * a ** -2 + self.Ol0
            return self.Om0 * a ** -3 / E2

        def Elog_np(a):
            # dlnE/dlna
            E2 = self.Om0 * a ** -3 + self.Ok0 * a ** -2 + self.Ol0
            return 0.5 * (-3 * self.Om0 * a ** -3
                          - 2 * self.Ok0 * a ** -2) / E2

        def rhs(x, y):
            a = np.exp(x)
            D1, dD1, D2, dD2 = y
            om = Om_np(a)
            fric = 2.0 + Elog_np(a)
            return np.array([
                dD1,
                -fric * dD1 + 1.5 * om * D1,
                dD2,
                -fric * dD2 + 1.5 * om * (D2 - D1 ** 2),
            ])

        # matter-dominated initial conditions: D1 ~ a, D2 ~ -3/7 a^2
        a0 = np.exp(lna[0])
        y = np.array([a0, a0, -3.0 / 7.0 * a0 ** 2, -6.0 / 7.0 * a0 ** 2])
        D1 = np.zeros_like(lna)
        dD1 = np.zeros_like(lna)
        D2 = np.zeros_like(lna)
        dD2 = np.zeros_like(lna)
        D1[0], dD1[0], D2[0], dD2[0] = y
        for i in range(1, len(lna)):
            x = lna[i - 1]
            k1 = rhs(x, y)
            k2 = rhs(x + dx / 2, y + dx / 2 * k1)
            k3 = rhs(x + dx / 2, y + dx / 2 * k2)
            k4 = rhs(x + dx, y + dx * k3)
            y = y + dx / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            D1[i], dD1[i], D2[i], dD2[i] = y

        # normalize D1(a=1) = 1, D2 consistently (D2/D1^2 invariant)
        norm = np.interp(0.0, lna, D1)
        D1 /= norm
        dD1 /= norm
        D2 /= norm ** 2
        dD2 /= norm ** 2

        self._lna = jnp.asarray(lna)
        self._D1 = jnp.asarray(D1)
        self._f1 = jnp.asarray(dD1 / D1)       # dlnD/dlna
        self._D2 = jnp.asarray(D2)
        self._f2 = jnp.asarray(dD2 / D2)

    def _interp(self, table, a):
        return jnp.interp(jnp.log(jnp.asarray(a)), self._lna, table)

    def D1(self, a):
        """Linear growth factor, D1(1) = 1 (reference Dplus up to
        normalization, cosmology.py)."""
        return self._interp(self._D1, a)

    Dplus = D1

    def f1(self, a):
        """Linear growth rate dlnD1/dlna (reference FOmega)."""
        return self._interp(self._f1, a)

    FOmega = f1

    def D2(self, a):
        """Second-order growth factor (negative, ~ -3/7 D1^2)."""
        return self._interp(self._D2, a)

    def f2(self, a):
        return self._interp(self._f2, a)

    # --- FastPM / nbodykit PerturbationGrowth interface ---
    def Gp(self, a):
        return self.D1(a)

    def gp(self, a):
        # dD1/da = D1 f1 / a
        a = jnp.asarray(a)
        return self.D1(a) * self.f1(a) / a

    def Gf(self, a):
        # D1'(a) a^3 E(a)
        a = jnp.asarray(a)
        return self.gp(a) * a ** 3 * self.efunc(a)

    def gf(self, a):
        # dGf/da by numerical differentiation of the tabulated Gf
        a = jnp.asarray(a)
        eps = 1e-4
        return (self.Gf(a * (1 + eps)) - self.Gf(a * (1 - eps))) \
            / (2 * eps * a)

    def Gp2(self, a):
        return self.D2(a)

    def gp2(self, a):
        a = jnp.asarray(a)
        return self.D2(a) * self.f2(a) / a

    def Gf2(self, a):
        a = jnp.asarray(a)
        return self.gp2(a) * a ** 3 * self.efunc(a)

    def gf2(self, a):
        a = jnp.asarray(a)
        eps = 1e-4
        return (self.Gf2(a * (1 + eps)) - self.Gf2(a * (1 - eps))) \
            / (2 * eps * a)


Planck15 = Cosmology(Om0=0.3089, h=0.6774, sigma8=0.8159, ns=0.9667,
                     Ob0=0.0486)
