"""Test harness config: 8 virtual CPU devices, x64 available.

Mirrors the reference's deterministic-CPU test strategy (SURVEY.md §4): unit
numerics run on CPU with float64 so golden tolerances are meaningful; the
multi-chip sharding paths run on a virtual 8-device mesh
(xla_force_host_platform_device_count), the "fake cluster" of SURVEY.md §4.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Force CPU: the session environment pins JAX_PLATFORMS=axon (the real TPU
# tunnel) and a sitecustomize imports jax at interpreter startup, so env
# vars alone are too late — override via jax.config, which wins any time
# before backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
