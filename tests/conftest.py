"""Test configuration: force an 8-device virtual CPU platform for JAX.

Multi-chip sharding tests run on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``) so they need no TPU hardware; this must
be set before jax initializes, hence here in conftest.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
