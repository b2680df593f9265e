"""Test harness: force CPU with 8 virtual devices so sharding/pjit tests run
without TPU hardware, and keep matmuls at full f32 precision for parity tests."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU platform via jax.config;
# override it after import so tests stay on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: repeated suite runs skip the (minutes of) CPU
# XLA compiles. Separate from the TPU cache to avoid key churn.
jax.config.update("jax_compilation_cache_dir", ".jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
