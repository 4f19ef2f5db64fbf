"""Differentiable forward-model demo: the abopt-engine replacement.

The reference ships a tape-based abopt Engine so downstream cosmology
inference (cosmo4d) can differentiate through the PM pipeline
(reference abopt.py:59-286).  Here the pipeline is natively
differentiable, so 'the engine' is just jax.grad — this test runs a
small end-to-end inverse problem to pin that story: recover initial
white-noise modes from an observed final density field by gradient
descent through whitenoise-shaping -> LPT -> paint.
"""
import numpy as np
import jax
import jax.numpy as jnp

from pmesh_tpu import ParticleMesh
from pmesh_tpu.gradcheck import check_grad


def _forward(pm, modes, Q):
    """modes (real mesh) -> shaped linear field -> Zel'dovich
    displacement -> painted density."""
    from pmesh_tpu.ops import transfer as tf
    dlin = pm.create(type='real', value=modes).r2c()

    def shape_k(k, v):
        kk = k.normp(2, zeromode=1.0)
        return v * kk ** -0.75 * (k.normp(2) > 0)

    dlink = dlin.apply(shape_k)
    S = jnp.stack([
        dlink.apply(tf.dx1_transfer(d)).c2r().readout(Q)
        for d in range(3)], axis=-1)
    rho = pm.paint(Q + 0.5 * S)
    return rho.value


def test_inverse_problem_recovers_density():
    n = 8
    # TSC: the CIC kernel derivative vanishes exactly at lattice
    # points, which would zero the gradient at the x=0 start
    pm = ParticleMesh(Nmesh=[n] * 3, BoxSize=float(n), dtype='f8',
                      resampler='tsc')
    Q = pm.generate_uniform_particle_grid(shift=0.0)
    rng = np.random.RandomState(0)
    true_modes = jnp.asarray(rng.normal(size=(n, n, n)))
    target = _forward(pm, true_modes, Q)

    def objective(modes):
        rho = _forward(pm, modes, Q)
        return jnp.mean((rho - target) ** 2)

    import optax
    vg = jax.jit(jax.value_and_grad(objective))
    x = jnp.asarray(0.01 * rng.normal(size=(n, n, n)))
    opt = optax.adam(0.2)
    state = opt.init(x)
    loss0 = float(objective(x))
    for _ in range(150):
        loss, g = vg(x)
        upd, state = opt.update(g, state)
        x = x + upd
    loss1 = float(loss)
    assert np.isfinite(loss1)
    # two orders of magnitude of data-fit improvement
    assert loss1 < 0.01 * loss0, (loss0, loss1)


def test_check_grad_through_full_pipeline():
    """The check_grad harness (abopt.py:288-386 analog) validates
    jax.grad against central differences through the whole pipeline."""
    n = 6
    pm = ParticleMesh(Nmesh=[n] * 3, BoxSize=float(n), dtype='f8',
                      resampler='tsc')
    Q = pm.generate_uniform_particle_grid(shift=0.0)
    rng = np.random.RandomState(1)
    modes = jnp.asarray(rng.normal(size=(n, n, n)))

    def objective(modes):
        return jnp.sum(_forward(pm, modes, Q) ** 2)

    idx = [0, 37, 111, 215]   # flat indices to probe
    check_grad(objective, modes, indices=idx, rtol=1e-4, eps=1e-4)
