"""Affine transforms and the resampling-window registry.

API-compatible with pmesh.window (reference pmesh/window.py): exposes
``Affine``, ``ResampleWindow``-style objects, ``FindResampler`` and the
``windows`` registry of 24 named kernels, but every kernel is a pure
jnp function evaluated vectorized (see ops/kernels.py, ops/paint.py).
"""
import numpy as np
import jax.numpy as jnp

from .ops.kernels import Window, windows as _kernel_registry, find_window
from .ops import paint as _paint_ops

__all__ = ["Affine", "ResampleWindow", "FindResampler", "windows"]


class Affine(object):
    """An affine transformation from positions to (fractional) mesh
    units (reference pmesh/window.py:18-55).

    Parameters
    ----------
    translate : array_like, integer mesh units.
    period : array_like, integer mesh units.
    scale : multiplies positions to obtain mesh units.
    """

    def __init__(self, ndim, scale=None, translate=None, period=None):
        if scale is None:
            scale = 1.0
        if translate is None:
            translate = 0
        if period is None:
            period = 0
        self.ndim = ndim
        self.scale = np.empty(ndim, dtype='f8')
        self.scale[:] = scale
        self.translate = np.empty(ndim, dtype='f8')
        self.translate[:] = translate
        self.period = np.empty(ndim, dtype='intp')
        self.period[:] = period

    def rescale(self, amount):
        """A new Affine with the scale multiplied by amount."""
        return Affine(self.ndim, self.scale * amount, self.translate,
                      self.period)

    def shift(self, amount):
        """A new Affine with translate shifted by amount (mesh units)."""
        return Affine(self.ndim, self.scale, self.translate + amount,
                      self.period)


class ResampleWindow(object):
    """A named resampling window bound to paint/readout entry points.

    Thin adaptor over ops.kernels.Window keeping the reference surface
    (pmesh/window.py:57-221): paint, readout, get_fwindow,
    get_compensation, resize, .support, .kind.
    """

    def __init__(self, kind, support=-1):
        self._w = find_window(kind)
        if support > 0 and support != self._w.nativesupport:
            self._w = self._w.resize(support)
        self.kind = self._w.kind

    @property
    def support(self):
        return self._w.support

    @property
    def window(self):
        return self._w

    def resize(self, support):
        return ResampleWindow(self.kind, support)

    def get_fwindow(self, w):
        return self._w.get_fwindow(w)

    def get_compensation(self):
        return self._w.get_compensation()

    def paint(self, real, pos, hsml=None, mass=None, diffdir=None,
              transform=None, hold=True):
        """Functional paint: returns a new mesh array (the reference
        mutates ``real`` in place; jax arrays are immutable)."""
        if transform is None:
            transform = Affine(np.ndim(real))
        if mass is None:
            mass = 1.0
        return _paint_ops.paint(real, pos, mass=mass, window=self._w,
                                scale=transform.scale,
                                translate=transform.translate,
                                period=transform.period,
                                diffdir=diffdir, hsml=hsml)

    def readout(self, real, pos, hsml=None, out=None, diffdir=None,
                transform=None):
        if transform is None:
            transform = Affine(np.ndim(real))
        r = _paint_ops.readout(real, pos, window=self._w,
                               scale=transform.scale,
                               translate=transform.translate,
                               period=transform.period,
                               diffdir=diffdir, hsml=hsml)
        if out is not None:
            raise TypeError("out= is not supported; jax arrays are "
                            "immutable — use the return value")
        return r


class _WindowNamespace(dict):
    def __missing__(self, key):
        k = key.lower()
        # canonical names from the reference registry
        names = {
            'nearest': 'nearest', 'linear': 'linear',
            'quadratic': 'quadratic', 'cubic': 'cubic',
            'nnb': 'tunednnb', 'cic': 'tunedcic', 'tsc': 'tunedtsc',
            'pcs': 'tunedpcs',
        }
        kind = names.get(k, k)
        if kind in _kernel_registry:
            w = ResampleWindow(kind)
            self[key] = w
            return w
        raise KeyError(key)

    def __contains__(self, key):
        try:
            self[key]
            return True
        except KeyError:
            return False

    # iteration/len enumerate every AVAILABLE window (the reference's
    # eager dict has 24 entries, window.py:230-255); construction
    # stays lazy
    def _names(self):
        return [n.lower() for n in _ALL_NAMES]

    def __iter__(self):
        return iter(self._names())

    def __len__(self):
        return len(self._names())

    def keys(self):
        return self._names()

    def items(self):
        return [(k, self[k]) for k in self._names()]

    def values(self):
        return [self[k] for k in self._names()]


windows = _WindowNamespace()

_ALL_NAMES = (['NEAREST', 'LINEAR', 'NNB', 'CIC', 'TSC', 'PCS', 'QUADRATIC',
               'CUBIC'] + ['LANCZOS%d' % i for i in range(2, 7)]
              + ['ACG%d' % i for i in range(2, 7)]
              + ['DB6', 'DB12', 'DB20', 'SYM6', 'SYM12', 'SYM20'])

methods = windows  # reference alias (pmesh/window.py:262)


def __getattr__(name):
    # lazy module attributes: window.CIC etc., built on first touch so
    # importing the module does not pay for the tabulated kernels.
    if name in _ALL_NAMES:
        return windows[name.lower()]
    raise AttributeError(name)


def FindResampler(window):
    """Resolve a name / ResampleWindow / Window to a ResampleWindow
    (reference pmesh/window.py:223-228)."""
    if isinstance(window, ResampleWindow):
        return window
    if isinstance(window, Window):
        r = ResampleWindow.__new__(ResampleWindow)
        r._w = window
        r.kind = window.kind
        return r
    if isinstance(window, str) and window in windows:
        return windows[window]
    raise TypeError(
        "argument is not a ResampleWindow name or object: %r" % (window,))
