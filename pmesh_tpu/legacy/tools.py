"""Deprecated MPI-era tools (mirror of pmesh/tools.py): Rotator,
FromRoot, Timer/Timers.  In the SPMD jax model there is one logical
process, so the rank-serialization helpers are identities."""
import warnings
from functools import wraps

from ..utils.timers import Timer, Timers  # noqa: F401

warnings.warn("legacy.tools is deprecated", DeprecationWarning)

__all__ = ["Rotator", "FromRoot", "Timer", "Timers"]


class Rotator(object):
    """Serialize execution over ranks (reference tools.py:9-18);
    a no-op with a single logical process."""

    def __init__(self, comm=None):
        self.comm = comm

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def FromRoot(comm=None):
    """Run on 'root' and broadcast (reference tools.py:20-30); the
    function simply runs."""
    def decorator(func):
        @wraps(func)
        def wrapped(*args, **kwargs):
            return func(*args, **kwargs)
        return wrapped
    return decorator
