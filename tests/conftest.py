"""Test harness config: force CPU JAX with 8 virtual devices so sharding
tests run without TPU hardware; keep tests deterministic."""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Force CPU: the ambient environment pins JAX_PLATFORMS to the TPU tunnel
# (axon) via a sitecustomize hook that also sets the jax config directly, so
# both the env var AND the config must be overridden before first backend use.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
