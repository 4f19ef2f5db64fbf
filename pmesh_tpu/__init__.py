"""pmesh_tpu — a TPU-native massively parallel particle-mesh engine.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
MP-Gadget/pmesh: distributed Real/Complex fields on an FFT mesh,
particle<->mesh resampling through a 24-window kernel zoo,
Gadget-compatible resolution-invariant white noise, and analytic
VJP/JVP operators making the whole pipeline differentiable — designed
for jax.sharding device meshes with XLA collectives instead of MPI.
"""

__version__ = "0.1.0"

from .pm import (ParticleMesh, RealField, ComplexField,  # noqa: F401
                 TransposedComplexField, UntransposedComplexField, Field)
from .window import Affine, FindResampler, windows  # noqa: F401
