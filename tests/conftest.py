"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via JAX's forced host
platform device count (SURVEY.md §4 item 5).  Note: this environment's TPU
plugin prepends itself to JAX_PLATFORMS, so the env var alone does not force
CPU — we also override the config before any backend initializes.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: XLA compiles of the fused pipelines dominate
# the suite wall-clock (measured: a 32 s test drops to 9 s warm).  The
# cache key includes the HLO and compile options, so edits invalidate
# exactly the entries they should.  The key does NOT include the host's
# CPU features, and XLA:CPU AOT executables compiled on a different
# machine SIGILL/segfault at load (observed: a VM migration mid-round
# crashed the suite inside compilation_cache.get_executable_and_time),
# so the directory is suffixed with a hash of the host's cpuinfo flags —
# each machine type gets its own cache.
if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
        suffix = hashlib.sha1(flags.encode()).hexdigest()[:8]
    except OSError:
        suffix = "nohost"
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(f"~/.jax_cache_cpu_{suffix}"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", "tests must run on CPU"
    assert jax.device_count() == 8, "expected 8 virtual CPU devices"
