"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

All tests run on CPU (the driver benches on real TPU separately).  The
8-device virtual mesh exercises the same pjit/shard_map code paths as a v5e
host; float64 lets parity tests compare against double-precision oracles
while the library itself stays dtype-parameterized (float32 on TPU).

NOTE: this environment's sitecustomize registers the axon TPU plugin in every
python process and calls ``jax.config.update("jax_platforms", "axon,cpu")``,
which overrides the JAX_PLATFORMS env var.  We must update the config back to
"cpu" *after* importing jax (backends are not yet initialized at conftest
time, so no TPU tunnel is ever dialed and process exit stays fast).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the fused-kernel equivalence tests compile
# large unrolled programs (minutes on CPU); cache across runs so only the
# first invocation pays.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


import pytest


def pytest_collection_modifyitems(items):
    """Auto-mark anything not slow/tier2 as fast, so ``-m fast`` selects
    the quick core subset literally (pytest.ini documents the tiers)."""
    for item in items:
        if not any(m in item.keywords for m in ("slow", "tier2")):
            item.add_marker(pytest.mark.fast)
