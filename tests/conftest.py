"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Multi-chip sharding tests run against this fake mesh (the standard JAX answer
to testing pod-slice code without TPUs); kernel parity tests use Pallas
interpret mode on CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and pins
# JAX_PLATFORMS=axon before conftest runs; override at config level.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compile cache: XLA compiles dominate the suite's wall time, and
# they are identical between runs — the warm-cache core gate
# (`pytest -m "not slow"`) is the <5 min dev loop documented in README.md.
from freegaussian_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
