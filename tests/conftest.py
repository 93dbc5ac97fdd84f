"""Test harness config: force CPU with 8 virtual devices.

Multi-chip sharding logic is validated on a virtual 8-device CPU mesh
(no pod needed); numerics tests run on XLA-CPU for determinism.

Note: the environment's sitecustomize imports jax and registers a TPU
backend at interpreter startup, so env vars alone are too late — but
backend *initialization* is lazy, so jax.config.update('jax_platforms')
plus XLA_FLAGS still take effect here as long as no test module touches
devices at import time.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
