"""Test environment: force an 8-device virtual CPU mesh before JAX imports.

Multi-chip sharding logic is validated on a host-platform device mesh
(``xla_force_host_platform_device_count``), per SURVEY.md §4's test strategy.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (env vars must be set first)

# this build's default matmul precision is reduced even for fp32-on-CPU;
# golden tests against torch need true fp32 matmuls.  The production bf16
# path is an explicit opt-in via Config.dtype and unaffected by this.
jax.config.update("jax_default_matmul_precision", "highest")
