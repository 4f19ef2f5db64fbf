"""Prototype arbitrary-callable-window painter (deprecated).

Parity with the reference's prototype module pmesh/lanczos.py
(reference lanczos.py:10-66: linear/cubic/lanczos/kaiser kernels with
``.support``/``.integral`` attributes, plus a normalized-coordinate
``paint``).  The supported path is :mod:`pmesh_tpu.window` /
:mod:`pmesh_tpu.ops.paint`, which cover the same kernels (and 20
more) with custom VJPs and sharding; this module exists so downstream
code experimenting with *ad-hoc Python kernels* has the same hook.

The TPU rebuild evaluates the callable kernel inside the traced
offset loop, so any jnp-composable function works under ``jit``.
Out-of-bounds handling: the reference raises or ignores
(lanczos.py:78-84); under jit we cannot raise data-dependently, so
``mode='raise'`` validates eagerly on concrete inputs and
``mode='ignore'`` drops outside contributions.
"""
import warnings

import numpy as np
import jax.numpy as jnp
from jax import core as jax_core

warnings.warn("pmesh_tpu.legacy.lanczos is a prototype; use "
              "pmesh_tpu.window instead", DeprecationWarning,
              stacklevel=2)

__all__ = ["linear", "cubic", "lanczos", "kaiser", "lanczos2",
           "lanczos3", "paint", "readout"]


def linear(dx):
    dx = jnp.abs(dx)
    return jnp.where(dx < 1.0, 1.0 - dx, 0.0)


linear.support = 1
linear.integral = 1.0


def cubic(dx, alpha=-0.5):
    """Catmull-Rom-family cubic (alpha=-0.5)."""
    dx = jnp.abs(dx)
    v1 = (alpha + 2) * dx ** 3 - (alpha + 3) * dx ** 2 + 1
    v2 = alpha * (dx ** 3 - 5 * dx ** 2 + 8 * dx - 4)
    return jnp.where(dx < 1.0, v1, jnp.where(dx < 2.0, v2, 0.0))


cubic.support = 2
cubic.integral = 1.0


def _measure_integral(fn, a):
    dx = np.linspace(-a, a, 10001)
    return float(np.trapezoid(np.asarray(fn(jnp.asarray(dx))), dx))


def lanczos(a):
    ainv = 1.0 / a

    def kernel(dx):
        v = jnp.sinc(dx) * jnp.sinc(dx * ainv)
        return jnp.where(jnp.abs(dx) <= a, v, 0.0)

    kernel.support = int(np.ceil(a))
    kernel.integral = _measure_integral(kernel, a)
    return kernel


lanczos2 = lanczos(2)
lanczos3 = lanczos(3)


def kaiser(a, alpha):
    beta = np.pi * alpha

    def kernel(dx):
        t = jnp.sqrt(jnp.clip(1.0 - (dx / a) ** 2, 0.0, None))
        v = jnp.i0(beta * t) / float(np.i0(beta))
        return jnp.where(jnp.abs(dx) <= a, v, 0.0)

    kernel.support = int(np.ceil(a))
    kernel.integral = _measure_integral(kernel, a)
    return kernel


def _prep(pos, mesh_shape, period, transform, mode, support):
    pos = jnp.asarray(pos)
    if transform is not None:
        pos = transform(pos)
    ndim = pos.shape[-1]
    if period is not None:
        period = np.broadcast_to(np.asarray(period), (ndim,))
    elif mode == "raise" and not isinstance(pos, jax_core.Tracer):
        lo = np.asarray(jnp.min(pos, axis=0))
        hi = np.asarray(jnp.max(pos, axis=0))
        if (lo < -support).any() or (hi >= np.asarray(mesh_shape)
                                     + support).any():
            raise ValueError("particle painted outside the mesh")
    return pos, period


def _offsets(support, ndim):
    S = 2 * support
    grids = np.meshgrid(*([np.arange(S) - (support - 1)] * ndim),
                        indexing='ij')
    return np.stack([g.ravel() for g in grids], axis=-1)


def paint(pos, mesh, weights=1.0, mode="raise", period=None,
          transform=None, window=linear):
    """Scatter ``weights`` onto ``mesh`` through a callable window.

    ``mesh`` is a jnp array (returned updated — fields are immutable
    here, unlike the reference's in-place canvas).
    """
    mesh = jnp.asarray(mesh)
    support = int(getattr(window, 'support', 1))
    pos, period = _prep(pos, mesh.shape, period, transform, mode, support)
    ndim = pos.shape[-1]
    w = jnp.broadcast_to(jnp.asarray(weights, dtype=mesh.dtype),
                         pos.shape[:1])
    base = jnp.floor(pos).astype(jnp.int32)
    flat = mesh.ravel()
    strides = np.cumprod((1,) + mesh.shape[::-1][:-1])[::-1].astype(np.int32)
    for off in _offsets(support, ndim):
        tgt = base + off
        k = jnp.ones(pos.shape[:1], dtype=mesh.dtype)
        for d in range(ndim):
            k = k * window(tgt[:, d] - pos[:, d]).astype(mesh.dtype)
        inside = jnp.ones(pos.shape[:1], dtype=bool)
        idx = jnp.zeros(pos.shape[:1], dtype=jnp.int32)
        for d in range(ndim):
            t = tgt[:, d]
            if period is not None:
                t = jnp.remainder(t, int(period[d]))
            else:
                inside = inside & (t >= 0) & (t < mesh.shape[d])
                t = jnp.clip(t, 0, mesh.shape[d] - 1)
            idx = idx + t * int(strides[d])
        flat = flat.at[idx].add(jnp.where(inside, k * w, 0.0))
    return flat.reshape(mesh.shape)


def readout(mesh, pos, mode="raise", period=None, transform=None,
            window=linear):
    """Gather ``mesh`` at ``pos`` through a callable window."""
    mesh = jnp.asarray(mesh)
    support = int(getattr(window, 'support', 1))
    pos, period = _prep(pos, mesh.shape, period, transform, mode, support)
    ndim = pos.shape[-1]
    base = jnp.floor(pos).astype(jnp.int32)
    flat = mesh.ravel()
    strides = np.cumprod((1,) + mesh.shape[::-1][:-1])[::-1].astype(np.int32)
    acc = jnp.zeros(pos.shape[:1], dtype=mesh.dtype)
    for off in _offsets(support, ndim):
        tgt = base + off
        k = jnp.ones(pos.shape[:1], dtype=mesh.dtype)
        for d in range(ndim):
            k = k * window(tgt[:, d] - pos[:, d]).astype(mesh.dtype)
        inside = jnp.ones(pos.shape[:1], dtype=bool)
        idx = jnp.zeros(pos.shape[:1], dtype=jnp.int32)
        for d in range(ndim):
            t = tgt[:, d]
            if period is not None:
                t = jnp.remainder(t, int(period[d]))
            else:
                inside = inside & (t >= 0) & (t < mesh.shape[d])
                t = jnp.clip(t, 0, mesh.shape[d] - 1)
            idx = idx + t * int(strides[d])
        acc = acc + jnp.where(inside, k * flat[idx], 0.0)
    return acc
