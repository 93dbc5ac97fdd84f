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

# Persistent XLA compilation cache (works on CPU in this JAX): the
# interpret-mode Pallas decode tests unroll the kernel grid into huge
# graphs whose CPU compiles dominate suite wall time (~11 of 15 s on
# the flagship-ratio case). Warm runs skip those compiles entirely —
# the suite people actually re-run stays fast.
_cache = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir,
                                      ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
