"""Test harness config: force CPU JAX with 8 virtual devices so sharding
tests run without TPU hardware; keep tests deterministic; reuse compiled
XLA executables across test processes via the persistent compilation cache."""
import os
import sys

import pytest

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Force CPU: the ambient environment pins JAX_PLATFORMS to the TPU tunnel
# (axon) via a sitecustomize hook that also sets the jax config directly, so
# both the env var AND the config must be overridden before first backend use.
# PLONKY2_TPU_TEST_PLATFORM=ambient keeps the real platform (for the
# tpu-gated kernel-parity tests).
if os.environ.get("PLONKY2_TPU_TEST_PLATFORM", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
else:
    import jax  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# Persistent compilation cache: prover pipelines recompile per (shape, config)
# and dominate CPU test time; cache them across processes.
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_collection_modifyitems(config, items):
    """Tests marked `heavy` (multi-minute end-to-end runs) only execute when
    RUN_HEAVY_TESTS=1; `slow` tests always run."""
    if os.environ.get("RUN_HEAVY_TESTS") == "1":
        return
    skip_heavy = pytest.mark.skip(reason="set RUN_HEAVY_TESTS=1 to run")
    for item in items:
        if "heavy" in item.keywords:
            item.add_marker(skip_heavy)
