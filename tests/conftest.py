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

# NO persistent compilation cache for the suite: XLA:CPU executable
# (de)serialization is intermittently FATAL on this host class — observed
# segfaults in BOTH directions on consecutive full runs (cache READ in
# get_executable_and_time during test_train_cli, then cache WRITE in
# put_executable_and_time during test_speculative), even after salting
# the cache dir with the CPU fingerprint. A green suite matters more
# than compile reuse; bench.py keeps its cache (TPU executables use a
# different, stable serialization path).


# A third full-run segfault (backend_compile_and_load while compiling
# test_speculative's sampled program, ~200 tests in; the same module
# passes in a fresh process) points at accumulated native state in
# XLA:CPU's in-process JIT. Bound it: drop every compiled executable
# between test MODULES. Costs some recompilation; buys run-to-run
# stability for the driver's single-process suite invocation.
import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
    gc.collect()
