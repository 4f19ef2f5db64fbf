"""Phase timers and profiling helpers.

Replaces the reference's MPI.Wtime-based Timer/Timers
(pmesh/tools.py:32-51) with wall-clock phase timers that synchronize
the device queue, plus a hook into the jax profiler for real traces
(the reference has none; SURVEY.md section 5 'tracing').
"""
import time
from contextlib import contextmanager

import jax

__all__ = ["Timer", "Timers", "trace"]


def _sync():
    try:
        (jax.device_put(0.0) + 0).block_until_ready()
    except Exception:
        pass


class Timer(object):
    """Accumulating context-manager timer for one labeled phase."""

    def __init__(self, name):
        self.name = name
        self.total = 0.0
        self.count = 0

    def __enter__(self):
        _sync()
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        _sync()
        self.total += time.perf_counter() - self._t0
        self.count += 1
        return False

    def __repr__(self):
        return "<Timer %s: %.4fs / %d calls>" % (self.name, self.total,
                                                 self.count)


class Timers(object):
    """A named collection of Timers (reference tools.Timers)."""

    def __init__(self):
        self._timers = {}

    def __getitem__(self, name):
        if name not in self._timers:
            self._timers[name] = Timer(name)
        return self._timers[name]

    def __repr__(self):
        return "\n".join(repr(t) for t in self._timers.values())

    def report(self):
        return {name: (t.total, t.count)
                for name, t in self._timers.items()}


@contextmanager
def trace(logdir):
    """jax profiler trace of the enclosed block; view with
    tensorboard or xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
