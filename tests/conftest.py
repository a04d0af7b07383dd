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


# ---------------------------------------------------------------------------
# Fast tier: `pytest -m "not slow"` keeps a quick default loop (<5 min warm)
# by excluding the modules whose cost is dominated by CPU-mesh shard_map
# compiles, subprocess spawns, or CLI integration drives. Marking whole
# modules (rather than hand-picking tests) keeps the boundary auditable;
# per-test @pytest.mark.slow still works for individual heavyweights.
# ---------------------------------------------------------------------------
_SLOW_MODULES = {
    "test_cli_integration",        # spawns full training CLIs
    "test_multiprocess_distributed",  # 2-process jax.distributed inits
    "test_trainer_checkpoint",     # orbax round-trips + chaos SIGTERM resume
    "test_ssl",                    # multi-config shard_map step compiles
    "test_supervised",             # multi-config shard_map step compiles
    "test_simmim",                 # shard_map step compiles
    "test_parallel",               # sharded CosFace/PFC/ZeRO sweeps
    "test_sampler_and_mesh",       # sharded_batch_apply mesh sweeps
    "test_fused_mlp",              # pallas interpret-mode fwd/bwd checks
    "test_fused_attention",        # pallas interpret-mode checks
    "test_fused_ln_linear",        # pallas interpret-mode checks
    # measured ≥10s/test on the 1-core host (pytest --durations, r5):
    "test_more_models",            # 8-dev SyncBN forward == global (351s+312s)
    "test_models",                 # multi-variant model compiles (10-30s each)
    "test_eval_loading",           # orbax save/restore round-trips
    "test_checkpoint_utils",       # orbax + landmark-load sweeps
    "test_export",                 # StableHLO export CLI drives
    "test_export_torch",           # torch export CLI round-trips
    "test_visualize_cli",          # CLI end-to-end PNG renders
    "test_aux_components",         # global-token/GNN variant compiles
    "test_collectives_hlo",        # 8-dev lowerings (~10s per fixture)
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(_pytest.mark.slow)
