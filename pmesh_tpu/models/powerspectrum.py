"""Linear matter power spectra for initial conditions.

Replaces nbody/powerspectrum.py (log-interpolated table with sigma8
normalization, reference powerspectrum.py:1-50 + embedded WMAP9
table) and the use of nbodykit's EHPower in examples/nbody.py:10.

Two sources:
- :class:`EHPower` — the Eisenstein & Hu (1998) analytic transfer
  function (with baryon wiggles suppressed: the "no-wiggle" form),
  adequate for demo/benchmark ICs and fully self-contained;
- :class:`PowerSpectrum` — a (k, P) table (e.g. CAMB/CLASS output)
  log-log interpolated, with optional sigma8 renormalization via the
  top-hat variance integral (reference powerspectrum.py:20-50).

Both are callable as P(k) with jnp arrays inside jit.
"""
import numpy as np
import jax.numpy as jnp

__all__ = ["EHPower", "PowerSpectrum", "normalize_sigma8"]


def _tophat_w(x):
    x = jnp.where(x == 0, 1e-8, x)
    return 3.0 / x ** 3 * (jnp.sin(x) - x * jnp.cos(x))


def sigma_r(power, r=8.0, kmin=1e-5, kmax=1e2, n=1024):
    """sigma(R) from a P(k) callable by log-trapezoid quadrature."""
    lnk = np.linspace(np.log(kmin), np.log(kmax), n)
    k = jnp.asarray(np.exp(lnk))
    integrand = power(k) * k ** 3 * _tophat_w(k * r) ** 2 / (2 * np.pi ** 2)
    var = jnp.trapezoid(integrand, jnp.asarray(lnk))
    return jnp.sqrt(var)


def normalize_sigma8(power, sigma8):
    """Return a rescaled P(k) with the requested sigma8."""
    s = float(sigma_r(power, 8.0))
    amp = (sigma8 / s) ** 2

    def scaled(k):
        return power(k) * amp
    return scaled


class EHPower(object):
    """Eisenstein & Hu (1998) zero-baryon transfer-function power
    spectrum at a given redshift:  P(k) = A k^ns T(k)^2 D1(z)^2,
    normalized to cosmology.sigma8 at z=0.

    k in h/Mpc, P in (Mpc/h)^3.
    """

    def __init__(self, cosmology, redshift=0.0):
        self.c = cosmology
        self.redshift = float(redshift)
        om, ob, h = cosmology.Om0, cosmology.Ob0, cosmology.h
        theta = 2.728 / 2.7  # CMB temperature in 2.7K units
        # Eisenstein & Hu 1998 eq 26, 28, 29-31 (shape parameters)
        self._s = 44.5 * np.log(9.83 / (om * h * h)) / \
            np.sqrt(1 + 10 * (ob * h * h) ** 0.75)
        self._alpha = (1 - 0.328 * np.log(431 * om * h * h) * ob / om
                       + 0.38 * np.log(22.3 * om * h * h) * (ob / om) ** 2)
        self._omhh = om * h * h
        self._theta2 = theta * theta
        self._h = h
        # normalize at z=0 to sigma8
        self._amp = 1.0
        s = float(sigma_r(self._raw))
        self._amp = (cosmology.sigma8 / s) ** 2
        self._growth = float(cosmology.D1(1.0 / (1 + self.redshift)))

    def _transfer(self, k):
        # k in h/Mpc; EH98 eqs 28-31 (no-wiggle)
        k = jnp.asarray(k)
        ks = k * self._h * self._s / self._h  # s is in Mpc/h already
        gamma_eff = self._omhh / self._h * (
            self._alpha + (1 - self._alpha) / (1 + (0.43 * ks) ** 4))
        q = k * self._theta2 / gamma_eff
        L0 = jnp.log(2 * np.e + 1.8 * q)
        C0 = 14.2 + 731.0 / (1 + 62.5 * q)
        return L0 / (L0 + C0 * q * q)

    def _raw(self, k):
        k = jnp.asarray(k)
        kk = jnp.where(k == 0, 1e-8, k)
        p = self._amp * kk ** self.c.ns * self._transfer(kk) ** 2
        return jnp.where(k == 0, 0.0, p)

    def __call__(self, k):
        return self._raw(k) * self._growth ** 2


class PowerSpectrum(object):
    """Tabulated P(k), log-log interpolated (reference
    powerspectrum.py:1-50).

    Parameters
    ----------
    k, p : arrays, or filename via from_file.
    sigma8 : float or None
        renormalize to this sigma8.
    """

    def __init__(self, k, p, sigma8=None):
        k = np.asarray(k, dtype='f8')
        p = np.asarray(p, dtype='f8')
        mask = (k > 0) & (p > 0)
        self._lnk = jnp.asarray(np.log(k[mask]))
        self._lnp = jnp.asarray(np.log(p[mask]))
        self.amp = 1.0
        if sigma8 is not None:
            s = float(sigma_r(self))
            self.amp = (sigma8 / s) ** 2

    @classmethod
    def from_file(cls, filename, sigma8=None):
        data = np.loadtxt(filename)
        return cls(data[:, 0], data[:, 1], sigma8=sigma8)

    def __call__(self, k):
        k = jnp.asarray(k)
        kk = jnp.where(k <= 0, 1e-8, k)
        p = jnp.exp(jnp.interp(jnp.log(kk), self._lnk, self._lnp))
        return jnp.where(k <= 0, 0.0, self.amp * p)

    def PofK(self, k):
        return self(k)
