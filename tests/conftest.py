"""Test configuration: force the CPU backend with 8 virtual devices so
multi-device sharding is exercised without TPU hardware (SURVEY.md §7 phase 6),
and enable x64 so double-precision physics checks match the reference's
float64 kernels."""
import os

import jax

# must happen before the backend is initialized
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

os.environ.setdefault("LAMBDAPIC_LOG_LEVEL", "WARNING")
