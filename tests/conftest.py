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
# The cache dir is SALTED with the host CPU-feature fingerprint: XLA:CPU
# AOT results compiled under different machine features (this VM's CPU
# flags change across sessions) SEGFAULT when deserialized — the
# cpu_aot_loader "could lead to SIGILL" warning is not hypothetical.
import hashlib  # noqa: E402


def _host_tag() -> str:
    # hash CPU flags + model name + jaxlib version: a same-flags host with
    # a different microarchitecture (or a jax upgrade) must not reuse AOT
    # entries either — one such stale entry segfaulted two suite runs
    # (cache READ crash in get_executable_and_time) before this widening
    try:
        with open("/proc/cpuinfo") as f:
            lines = f.readlines()
        sig = "".join(l for l in lines[:30]
                      if l.startswith(("flags", "model name")))
    except OSError:
        import platform
        sig = platform.processor() or "unknown"
    sig += jax.__version__
    return hashlib.sha1(sig.encode()).hexdigest()[:8]


jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/molly_jax_cache_{_host_tag()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
