"""Test configuration: force JAX onto a virtual 8-device CPU backend.

Multi-chip sharding logic is exercised on host CPU devices
(``xla_force_host_platform_device_count=8``), the TPU-world equivalent of a
fake backend (SURVEY.md section 4).  Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The container's sitecustomize registers the TPU (axon) plugin at
# interpreter startup, so the env var alone may be read too late --
# force the platform through the config as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent CPU compile cache: the suite's wall time on the single host
# core is dominated by XLA compiles; repeat runs hit the cache.  Keys
# include the backend, so this never collides with the TPU cache.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
