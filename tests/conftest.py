"""Test configuration: force an 8-device virtual CPU backend.

Multi-device sharding (psum / pjit / shard_map) is validated on a virtual
CPU mesh — the JAX-native fake backend — so the suite runs anywhere without
TPU hardware. The env var route is unreliable when a TPU plugin pre-sets
JAX_PLATFORMS, so we use jax.config directly (must happen before any
computation runs).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the heavy shard_map step compiles are paid
# once per machine, not once per pytest run
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
