"""Test configuration: force an 8-device virtual CPU platform for JAX.

The container's sitecustomize registers the axon TPU plugin at interpreter start and
exports ``JAX_PLATFORMS=axon``; tests must run on the host CPU (with 8 virtual devices
for the multi-chip sharding tests), so both the env vars *and* the live jax config are
overridden here before any backend is resolved.
"""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compilation cache: the suite's dozens of jit/interpret variants
# compile once per machine instead of once per run (the full suite is CPU
#-compile-bound otherwise; VERDICT r2 weak item 8)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache_cpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
