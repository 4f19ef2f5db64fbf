"""Resampling window kernels.

TPU-native re-implementation of the pmesh window kernel zoo
(reference: pmesh/_window_imp.c:108-244 analytic kernels,
pmesh/makelanczos.py / makeacg.py / makewavelets.py tabulated kernels).

Each window is described by a :class:`Window` object carrying pure jnp
functions ``kernel(x)``, ``diff(x)`` and (optionally) ``fwindow(w)``.
Unlike the reference — which dispatches per particle through C function
pointers — these are vectorized closures traced once by XLA and fused
into the paint/readout gather/scatter pipelines (see ops/paint.py).

Tabulated kernels (lanczos*, acg*, db*, sym*) regenerate their 8192-point
lookup tables at import time from the defining math (reference generates
C headers offline with makelanczos.py:5-12, makeacg.py:5-22,
makewavelets.py:4-28); lookups are linear interpolation, matching the
reference table semantics (diff is the table forward-difference).
"""
import functools

import numpy as np
import jax.numpy as jnp

__all__ = ["Window", "windows", "find_window"]


def _sinc_unnormed(x):
    """sin(x)/x with the |x|<1e-5 series used by the reference
    (_window_imp.c:13-22) so fwindow values agree bitwise at w=0."""
    x2 = x * x
    small = 1.0 - x2 / 6.0 + x2 * x2 / 120.0
    safe = jnp.where(jnp.abs(x) < 1e-5, 1.0, x)
    return jnp.where(jnp.abs(x) < 1e-5, small, jnp.sin(safe) / safe)


class Window(object):
    """A resampling window: kernel, derivative and Fourier transform.

    Attributes
    ----------
    kind : str
        canonical name, e.g. 'tunedcic'.
    support : int
        native support in grid cells (reference: painter->nativesupport).
    """

    def __init__(self, kind, support, kernel, diff, fwindow=None):
        self.kind = kind
        self.support = int(support)
        self.nativesupport = int(support)
        self.kernel = kernel
        self.diff = diff
        self._fwindow = fwindow

    def __repr__(self):
        return "Window(%s, support=%d)" % (self.kind, self.support)

    def resize(self, support):
        """A copy of this window with a different (non-native) support.

        Mirrors ResampleWindow.resize (pmesh/window.py:61-63): the kernel
        profile is stretched to cover ``support`` cells.
        """
        w = Window(self.kind, self.nativesupport, self.kernel, self.diff,
                   self._fwindow)
        w.support = int(np.ceil(support))
        w._support_float = float(support)
        return w

    @property
    def support_float(self):
        return getattr(self, '_support_float', float(self.support))

    def get_fwindow(self, w):
        """1-d Fourier window T(w) at circular frequency w.

        Returns 1 where not implemented (pmesh/_window_imp.c:473-485).
        Accounts for a resized support via the vfactor rescaling.
        """
        if self._fwindow is None:
            return jnp.ones_like(jnp.asarray(w, dtype=jnp.result_type(float)))
        vfactor = self.nativesupport / self.support_float
        return self._fwindow(jnp.asarray(w) / vfactor)

    def get_compensation(self):
        """Deconvolution transfer for ComplexField.apply(kind='circular')
        (pmesh/window.py:65-80)."""
        def function(w, v):
            tf = 1.0
            for wi in w:
                tf = tf * self.get_fwindow(wi)
            return v / tf
        return function


# ---------------------------------------------------------------------------
# Analytic kernels (reference: pmesh/_window_imp.c:108-244)
# ---------------------------------------------------------------------------

def _nearest_kernel(x):
    return jnp.where((x < 0.5) & (x >= -0.5), 1.0, 0.0)


def _nearest_diff(x):
    return jnp.zeros_like(x)


def _nearest_fwindow(w):
    return _sinc_unnormed(0.5 * w)


def _linear_kernel(x):
    x = jnp.abs(x)
    return jnp.where(x < 1.0, 1.0 - x, 0.0)


def _linear_diff(x):
    factor = jnp.sign(-x)
    return jnp.where(jnp.abs(x) < 1.0, factor, 0.0)


def _linear_fwindow(w):
    t = _sinc_unnormed(0.5 * w)
    return t * t


def _quadratic_kernel(x):
    x = jnp.abs(x)
    inner = 0.75 - x * x
    t = 1.5 - x
    outer = 0.5 * t * t
    return jnp.where(x <= 0.5, inner, jnp.where(x < 1.5, outer, 0.0))


def _quadratic_diff(x):
    factor = jnp.where(x < 0, -1.0, 1.0)
    x = jnp.abs(x)
    inner = -2.0 * x
    outer = -(1.5 - x)
    return factor * jnp.where(x <= 0.5, inner,
                              jnp.where(x < 1.5, outer, 0.0))


def _quadratic_fwindow(w):
    t = _sinc_unnormed(0.5 * w)
    return t * t * t


def _cubic_kernel(x):
    x = jnp.abs(x)
    xx = x * x
    inner = (4.0 - 6.0 * xx + 3.0 * xx * x) / 6.0
    t = 2.0 - x
    outer = t * t * t / 6.0
    return jnp.where(x < 1.0, inner, jnp.where(x < 2.0, outer, 0.0))


def _cubic_diff(x):
    factor = jnp.where(x < 0, -1.0, 1.0)
    x = jnp.abs(x)
    xx = x * x
    inner = (-12.0 * x + 9.0 * xx) / 6.0
    t = 2.0 - x
    outer = -0.5 * t * t
    return factor * jnp.where(x < 1.0, inner,
                              jnp.where(x < 2.0, outer, 0.0))


def _cubic_fwindow(w):
    t = _sinc_unnormed(0.5 * w)
    return t * t * t * t


# ---------------------------------------------------------------------------
# Tabulated kernels. Tables are built with numpy at import; lookups are
# jnp linear interpolation with the same edge conventions as the generated
# C tables (reference: makelanczos.py template).
# ---------------------------------------------------------------------------

def _table_kernel(table, step):
    table_j = jnp.asarray(table)
    n = len(table)

    def kernel(x):
        f = jnp.abs(x) / step
        i = jnp.floor(f).astype(jnp.int32)
        frac = f - i
        valid = (i >= 0) & (i < n - 1)
        i_safe = jnp.clip(i, 0, n - 2)
        v = table_j[i_safe] * (1 - frac) + table_j[i_safe + 1] * frac
        return jnp.where(valid, v, 0.0)

    def diff(x):
        factor = jnp.where(x >= 0, 1.0, -1.0)
        ax = jnp.abs(x)
        i = (ax / step).astype(jnp.int32)
        valid = (i >= 0) & (i < n - 1)
        i_safe = jnp.clip(i, 0, n - 2)
        d = table_j[i_safe + 1] - table_j[i_safe]
        return jnp.where(valid, factor * d / step, 0.0)

    return kernel, diff


def _offset_table_kernel(table, step, hsupport):
    """One-sided table addressed from -hsupport (wavelets;
    reference makewavelets.py template: x += hsupport)."""
    table_j = jnp.asarray(table)
    n = len(table)

    def kernel(x):
        f = (x + hsupport) / step
        i = jnp.floor(f).astype(jnp.int32)
        frac = f - i
        valid = (f >= 0) & (i < n - 1)
        i_safe = jnp.clip(i, 0, n - 2)
        v = table_j[i_safe] * (1 - frac) + table_j[i_safe + 1] * frac
        return jnp.where(valid, v, 0.0)

    def diff(x):
        i = ((x + hsupport) / step).astype(jnp.int32)
        valid = (i >= 0) & (i < n - 1)
        i_safe = jnp.clip(i, 0, n - 2)
        d = table_j[i_safe + 1] - table_j[i_safe]
        return jnp.where(valid, d / step, 0.0)

    return kernel, diff


def _lanczos_table(n):
    """reference: makelanczos.py:3-9"""
    x = np.linspace(0, n, 8192, endpoint=False)
    phi = np.sinc(x) * np.sinc(x / n)
    phi /= 2 * np.trapezoid(phi, x)
    step = np.diff(x).mean()
    return phi, step


def _acg_table(n):
    """approximate confined gaussian; reference: makeacg.py:4-22"""
    s = 1.0
    A = (n - 1) / 2.0
    x = np.linspace(0, n * 0.5, 8192, endpoint=True)
    y = x + A

    def G(y):
        return np.exp(-0.25 * ((y - A) / s) ** 2)

    phi = G(y) - G(-0.5) * (G(y + n) + G(y - n)) / (G(-0.5 + n) + G(-0.5 - n))
    phi /= 2 * np.trapezoid(phi, x)
    step = np.diff(x).mean()
    return phi, step


# --- Daubechies / Symlet scaling functions --------------------------------

def _daubechies_filters(p, symlet=False):
    """Compute the length-2p orthonormal scaling filter with p vanishing
    moments via spectral factorization (Daubechies' construction).

    For symlet=True the roots are selected to minimize phase nonlinearity
    (least-asymmetric family) instead of taking the minimum-phase set.
    This reproduces the standard dbN/symN filters to ~1e-7.
    """
    # P(y) = sum C(p-1+k, k) y^k ; roots in y.
    from math import comb
    Pcoef = np.array([comb(p - 1 + k, k) for k in range(p - 1, -1, -1)],
                     dtype=float)
    yroots = np.roots(Pcoef)

    # each y root maps to a pair of z roots via y = (2 - z - 1/z)/4
    zroots = []
    for y in yroots:
        c = np.roots([1.0, 4.0 * y - 2.0, 1.0])
        zroots.append(c)
    zroots = np.array(zroots)  # (p-1, 2)

    # group roots: real y -> z pair (r, 1/r); complex y come in conj pairs.
    # choose one z root from each pair; db: |z| < 1 (min phase);
    # sym: search the 2^m sign assignments for flattest phase.
    def build(selection):
        sel = []
        for i, pair in enumerate(zroots):
            inside = pair[np.argmin(np.abs(pair))]
            outside = pair[np.argmax(np.abs(pair))]
            sel.append(inside if selection[i] else outside)
        poly = np.poly(np.array(sel))  # roots -> monic polynomial
        # multiply by (1+z)^p
        binom = np.array([comb(p, k) for k in range(p + 1)], dtype=float)
        h = np.convolve(binom, poly.real)
        h = h / h.sum() * np.sqrt(2.0)
        return h

    nz = len(zroots)
    if not symlet:
        return build([True] * nz)

    # symlet: only flip complex-conjugate groups together.  Build groups.
    used = np.zeros(nz, dtype=bool)
    groups = []
    for i in range(nz):
        if used[i]:
            continue
        grp = [i]
        used[i] = True
        for j in range(i + 1, nz):
            if not used[j] and abs(yroots[j] - np.conj(yroots[i])) < 1e-8 \
                    and abs(yroots[i].imag) > 1e-12:
                grp.append(j)
                used[j] = True
                break
        groups.append(grp)

    best, best_score = None, np.inf
    for mask in range(1 << len(groups)):
        selection = [True] * nz
        for gi, grp in enumerate(groups):
            flag = bool((mask >> gi) & 1)
            for idx in grp:
                selection[idx] = flag
        h = build(selection)
        if (np.abs(h.imag).max() if np.iscomplexobj(h) else 0) > 1e-8:
            continue
        h = np.real(h)
        # phase nonlinearity of the filter's DFT
        wgrid = np.linspace(0.01, np.pi - 0.01, 128)
        H = np.polyval(h[::-1], np.exp(-1j * wgrid))
        phase = np.unwrap(np.angle(H * np.exp(1j * wgrid * (len(h) - 1) / 2)))
        score = np.abs(phase).max()
        if score < best_score:
            best_score, best = score, h
    return best


@functools.lru_cache(None)
def _wavelet_table(family, length):
    """Cascade-algorithm scaling function table for dbN / symN.

    Matches the reference table construction (makewavelets.py:4-28):
    level-8 cascade, midpoint average, trimmed where |phi| < 2e-3,
    support = ceil of the last significant x.
    """
    p = length // 2
    h = _daubechies_filters(p, symlet=(family == 'sym'))
    level = 8
    # cascade: phi sampled on grid of spacing 2^-level over [0, 2p-1]
    phi = np.array([1.0])
    for _ in range(level):
        up = np.zeros(2 * len(phi) - 1)
        up[::2] = phi
        phi = np.sqrt(2.0) * np.convolve(h, up)
    # normalize sampling: after J levels the grid spacing is 2^-J
    step = 2.0 ** -level
    x = np.arange(len(phi)) * step
    # pywt wavefun returns phi on x in [0, 2p-1]; our phi should integrate to 1
    phi = phi / (phi.sum() * step)
    # reference midpoint-averages then trims small edges
    phi = (phi[1:] + phi[:-1]) * 0.5
    i = 0
    while abs(phi[i]) < 2e-3:
        i += 1
    phi = phi[i:]
    j = len(phi)
    while abs(phi[j - 1]) < 2e-3:
        j -= 1
    support = int(np.ceil(x[j]))
    i = (x < support).sum()
    phi = phi[:i // 4 * 4 + 4]
    return phi, step, support


def _make_tabulated(name):
    if name.startswith('lanczos'):
        n = int(name[len('lanczos'):])
        phi, step = _lanczos_table(n)
        kernel, diff = _table_kernel(phi, step)
        return Window(name, 2 * n, kernel, diff)
    if name.startswith('acg'):
        n = int(name[len('acg'):])
        phi, step = _acg_table(n)
        kernel, diff = _table_kernel(phi, step)
        return Window(name, n, kernel, diff)
    if name.startswith('db') or name.startswith('sym'):
        family = 'db' if name.startswith('db') else 'sym'
        length = int(name[len(family):])
        phi, step, support = _wavelet_table(family, length)
        kernel, diff = _offset_table_kernel(phi, step, support * 0.5)
        return Window(name, support, kernel, diff)
    raise ValueError(name)


class _LazyWindows(dict):
    """The full registry of 24 windows (pmesh/window.py:230-255);
    tabulated entries are built on first access."""

    _analytic = {
        'nearest': (1, _nearest_kernel, _nearest_diff, _nearest_fwindow),
        'linear': (2, _linear_kernel, _linear_diff, _linear_fwindow),
        'quadratic': (3, _quadratic_kernel, _quadratic_diff,
                      _quadratic_fwindow),
        'cubic': (4, _cubic_kernel, _cubic_diff, _cubic_fwindow),
    }
    # tuned aliases fall back to the analytic kernels
    # (reference _window_imp.c:380-452); on TPU there is no separate
    # "tuned" code path — XLA fuses the vectorized kernels directly.
    _aliases = {
        'tunednnb': 'nearest', 'nnb': 'nearest',
        'tunedcic': 'linear', 'cic': 'linear',
        'tunedtsc': 'quadratic', 'tsc': 'quadratic',
        'tunedpcs': 'cubic', 'pcs': 'cubic',
    }
    _tabulated = (['lanczos%d' % n for n in range(2, 7)]
                  + ['acg%d' % n for n in range(2, 7)]
                  + ['db6', 'db12', 'db20', 'sym6', 'sym12', 'sym20'])

    def __missing__(self, key):
        key = key.lower()
        if key in self._aliases:
            base = self[self._aliases[key]]
            w = Window(key, base.nativesupport, base.kernel, base.diff,
                       base._fwindow)
            self[key] = w
            return w
        if key in self._analytic:
            support, kernel, diff, fwindow = self._analytic[key]
            w = Window(key, support, kernel, diff, fwindow)
            self[key] = w
            return w
        if key in self._tabulated:
            w = _make_tabulated(key)
            self[key] = w
            return w
        raise KeyError(key)

    def __contains__(self, key):
        k = str(key).lower()
        return (k in self._analytic or k in self._aliases
                or k in self._tabulated or dict.__contains__(self, k))


windows = _LazyWindows()


def find_window(window):
    """Resolve a window name or Window object (pmesh/window.py:223-228)."""
    if isinstance(window, Window):
        return window
    if isinstance(window, str) and window in windows:
        return windows[window]
    raise TypeError(
        "argument is not a window name or a Window object: %r" % (window,))
