"""Checkpoint / resume of simulation state.

The reference has no in-library checkpointing; its applications write
bigfile snapshots (gravpm.py:23-31) and the driver restarts from them
(SURVEY.md section 5 'checkpoint/resume').  Here checkpoints are
orbax/tensorstore array trees: sharded jax Arrays (particle state and
fields) are written and restored shard-by-shard without gathering to
a single host.
"""
import os

import numpy as np
import jax

__all__ = ["save_state", "restore_state", "save_npz", "load_npz"]


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_state(path, state, extra=None):
    """Write a pytree (e.g. models.fastpm.State) with orbax."""
    tree = {"Q": state.Q, "S": state.S, "V": state.V}
    if extra:
        tree.update(extra)
    _checkpointer().save(os.path.abspath(path), tree, force=True)


def restore_state(path, template=None):
    """Restore a state pytree written by :func:`save_state`."""
    from ..models.fastpm import State
    tree = _checkpointer().restore(os.path.abspath(path))
    extra = {k: v for k, v in tree.items() if k not in ('Q', 'S', 'V')}
    return State(tree['Q'], tree['S'], tree['V']), extra


def save_npz(path, state, a=None, **extra):
    """Single-host npz snapshot (the bigfile-snapshot analog)."""
    np.savez(path,
             Position=np.asarray(state.Q + state.S),
             Velocity=np.asarray(state.V),
             Q=np.asarray(state.Q),
             a=a if a is not None else np.nan,
             **extra)


def load_npz(path):
    from ..models.fastpm import State
    import jax.numpy as jnp
    d = np.load(path)
    Q = jnp.asarray(d['Q'])
    S = jnp.asarray(d['Position']) - Q
    V = jnp.asarray(d['Velocity'])
    return State(Q, S, V), float(d['a'])
