"""Test configuration: force an 8-device virtual CPU platform.

Tests exercise multi-chip sharding on a virtual mesh (SURVEY.md §4); the real
TPU is reserved for bench.py. NOTE: this environment's sitecustomize registers
a remote "axon" TPU backend and forcibly sets jax_platforms at interpreter
startup, so the JAX_PLATFORMS env var alone is NOT enough — we must override
via jax.config before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache makes repeated test runs cheap
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REFERENCE_DATA = "/root/reference/data"
