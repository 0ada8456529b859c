"""Test configuration: run on CPU with 8 virtual devices.

Mirrors the reference's ctest strategy of simulating the cluster with
multi-process MPI on one machine (/root/reference/tests/CMakeLists.txt:67-74):
here the "fake cluster" is XLA's host-platform device count, so sharding /
collective code paths compile and execute exactly as they would on an 8-chip
TPU slice. Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env pins JAX_PLATFORMS=axon (TPU)
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone is not enough: the session's sitecustomize pre-imports
# jax._src (capturing JAX_PLATFORMS=axon), so override through the config.
jax.config.update("jax_platforms", "cpu")

# Oracle tests compare against SciPy in double precision.
jax.config.update("jax_enable_x64", True)
