import os

# Tests run on CPU with a virtual 8-device mesh so the sharded code
# paths compile and execute without TPU hardware (the reference runs
# its suite under mpirun -n {1,2,4}; same idea, no MPI).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The ambient environment force-registers the TPU tunnel backend and
# overrides JAX_PLATFORMS; the config update below wins over both.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
