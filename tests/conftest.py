"""Test env: force JAX onto CPU with 8 virtual devices so GSPMD sharding
tests run without a real TPU slice (SURVEY.md §4).

NOTE: this image preloads jax at interpreter startup (axon TPU plugin), so
environment variables set here are too late — use jax.config.update, which
still works because backends are only initialized on first use.
"""

import os

# kept for subprocesses we spawn and for tooling that greps for it
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# XLA-CPU's default matmul path (oneDNN) runs fp32 matmuls at reduced
# precision (~1e-3 error); parity tests need true fp32.
jax.config.update("jax_default_matmul_precision", "highest")

# Single-core CPU compiles are slow; cache compiled executables across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/molly_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
