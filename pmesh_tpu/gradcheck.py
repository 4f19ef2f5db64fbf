"""Numerical gradient validation harness.

The reference's abopt tape engine (pmesh/abopt.py) exposed each PM op
as a differentiable statement and shipped a central-difference
``check_grad`` validator (abopt.py:288-386).  jax.grad replaces the
tape; this module keeps the validation harness: check any scalar
objective's jax gradient (which routes through the framework's custom
VJPs) against central differences, with the same rtol=1e-5 contract
as the reference test suite (test_gradient.py:101, test_abopt.py).
"""
import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["check_grad", "central_difference"]


def central_difference(objective, x, eps=1e-4, indices=None):
    """Central differences of a scalar objective at x (numpy array).

    ``indices``: optional list of flat indices to probe (all by
    default; use a subset for large x)."""
    x = np.array(x, dtype='f8')
    flat = x.reshape(-1)
    if indices is None:
        indices = range(flat.size)
    g = np.zeros(len(list(indices)))
    indices = list(indices)
    for j, i in enumerate(indices):
        xp = flat.copy()
        xp[i] += eps
        xm = flat.copy()
        xm[i] -= eps
        g[j] = (float(objective(xp.reshape(x.shape)))
                - float(objective(xm.reshape(x.shape)))) / (2 * eps)
    return np.asarray(indices), g


def check_grad(objective, x, eps=1e-4, rtol=1e-5, atol=1e-8,
               indices=None, verbose=False):
    """Assert jax.grad(objective)(x) matches central differences.

    Mirrors abopt.py:288-386 check_grad: raises AssertionError with a
    diagnostic table on mismatch; returns (analytic, numerical).
    """
    x = jnp.asarray(x, dtype=jnp.float64
                    if jax.config.x64_enabled else jnp.float32)
    ag = np.asarray(jax.grad(objective)(x)).reshape(-1)
    idx, ng = central_difference(objective, np.asarray(x), eps=eps,
                                 indices=indices)
    ag = ag[idx]
    if verbose:
        for i, (a, n) in enumerate(zip(ag, ng)):
            print("%6d  analytic=% .8e  numeric=% .8e" % (idx[i], a, n))
    np.testing.assert_allclose(ng, ag, rtol=rtol, atol=atol,
                               err_msg="gradient check failed")
    return ag, ng
