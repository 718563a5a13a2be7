"""Test configuration: force a CPU backend with an 8-device virtual mesh.

The container's sitecustomize registers a remote-TPU ("axon") PJRT plugin at
interpreter startup and forces ``jax_platforms="axon,cpu"``.  Tests must run
on the host CPU (the real chip is reserved for benchmarks and is
single-client), so we override the platform selection *before* any backend is
initialized, and request 8 virtual CPU devices so sharding/collective paths
can be exercised without hardware (SURVEY.md §4 mock-fabric strategy).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# sitecustomize may already have called jax.config.update("jax_platforms", ...)
# during plugin registration; backends are not initialized yet at conftest
# import time, so this override still takes effect.
jax.config.update("jax_platforms", "cpu")
