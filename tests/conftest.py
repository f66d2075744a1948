"""Test environment: force an 8-device virtual CPU mesh before JAX imports.

Multi-chip sharding logic is validated on a host-platform device mesh
(``xla_force_host_platform_device_count``), per SURVEY.md §4's test strategy.
"""

import os

# NOTE: this image preloads jax._src at interpreter startup, so JAX_PLATFORMS
# set here is already captured; the config.update below is what actually
# forces the CPU platform.  XLA_FLAGS is still read lazily at backend init.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ["JAX_PLATFORMS"] = "cpu"  # keep the package env-honor shim aligned

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# this build's default matmul precision is reduced even for fp32-on-CPU;
# golden tests against torch need true fp32 matmuls.  The production bf16
# path is an explicit opt-in via Config.dtype and unaffected by this.
jax.config.update("jax_default_matmul_precision", "highest")
# Most of the fast tier's wall-clock is XLA compiles of tiny test graphs;
# the persistent cache (keyed by HLO hash — safe across edits) makes
# repeat runs compile-free.  Delete .jax_test_cache to force cold.
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_test_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
