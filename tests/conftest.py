"""Test configuration: force a CPU backend with 8 virtual devices so that
every distributed code path (DP/ZeRO/FSDP sharding, collectives) is exercised
without TPU hardware — the multi-device testing strategy SURVEY.md §4 calls
for (the reference has no distributed tests at all)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Must be set before jax initializes its backend.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# NOTE: the JAX_PLATFORMS env var is overridden by the axon TPU plugin in
# this environment; the config API wins over the plugin.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the heavyweight programs (DARTS supernet,
# transformer) compile once per machine instead of once per test run.
_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_compile_cache",
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
