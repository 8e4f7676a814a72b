"""Test configuration: run everything on CPU with 8 virtual devices so
sharding tests work without TPU hardware, and with x64 enabled.

NB: the surrounding environment may force-register a TPU plugin at
interpreter startup (sitecustomize), so setting JAX_PLATFORMS in the
environment is not sufficient — we must override the platform via
jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# Disable the persistent compilation cache for CPU test runs: the
# environment migrates between hosts with different CPU feature sets,
# and loading an XLA:CPU AOT executable compiled on another host
# segfaults (the cpu_aot_loader warns about exactly this).  The cache
# only pays off for the remote TPU backend anyway.
os.environ["JAX_COMPILATION_CACHE_DIR"] = ""

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", None)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    A full-suite run accumulates hundreds of live XLA:CPU executables
    (the sparse multifrontal ones are huge level-scheduled programs);
    late in the process the CPU compiler aborts (SIGABRT inside
    backend_compile_and_load) even with system memory free.  Modules
    barely share programs, so dropping the caches between them costs
    little and keeps the compiler healthy."""
    yield
    jax.clear_caches()
