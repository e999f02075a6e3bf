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
# so the directory is suffixed with a hash of the host CPU's identity —
# each machine type gets its own cache.  The hash covers the WHOLE first
# processor block of /proc/cpuinfo (model name, family, stepping, flags)
# plus the jaxlib version: hashing the flags line alone proved
# insufficient — two heterogeneous hosts shared identical cpuinfo flags
# while XLA's embedded machine features still differed
# (prefer-no-scatter/prefer-no-gather are model-derived heuristics, not
# cpuinfo flags), and the stale entries loaded with a "machine features
# mismatch" warning and then segfaulted mid-suite.
if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    import hashlib

    import jaxlib

    try:
        with open("/proc/cpuinfo") as f:
            block = f.read().split("\n\n", 1)[0]
        ident = block + "\n" + getattr(jaxlib, "__version__", "")
        suffix = hashlib.sha1(ident.encode()).hexdigest()[:8]
    except OSError:
        suffix = "nohost"
    cache_dir = os.path.expanduser(f"~/.jax_cache_cpu_{suffix}")

    # Exactly ONE live process may use the shared cache dir: every
    # observed mid-suite SIGABRT (inside compilation_cache
    # get/put_executable_and_time, always around the 8-device pjit
    # executables) coincided with a second CPU-JAX process reading/
    # writing the same directory.  Hold an exclusive flock for the
    # process lifetime; a second process falls back to a throwaway
    # per-PID dir (slower, but never racing).
    try:
        import fcntl

        os.makedirs(cache_dir, exist_ok=True)
        _lock_f = open(os.path.join(cache_dir, ".lock"), "w")  # noqa: SIM115
        fcntl.flock(_lock_f, fcntl.LOCK_EX | fcntl.LOCK_NB)
        # keep _lock_f referenced so the lock lives as long as the process
    except OSError:
        cache_dir = os.path.expanduser(f"~/.jax_cache_cpu_pid{os.getpid()}")
        os.makedirs(cache_dir, exist_ok=True)

    # Crash sentinel: a process that died MID-WRITE leaves a truncated
    # executable blob behind, and every later run then segfaults inside
    # compilation_cache.get_executable_and_time deserializing it
    # (observed: one run SIGABRTed in put_executable_and_time; all
    # subsequent runs SIGSEGVed reading the same tests' entries until
    # the directory was purged).  ``.dirty`` exists for exactly the
    # lifetime of a session — finding it at startup means the previous
    # session crashed, so the cache contents cannot be trusted.
    _dirty = os.path.join(cache_dir, ".dirty")
    if os.path.exists(_dirty):
        import shutil

        for entry in os.listdir(cache_dir):
            if entry in (".lock", ".dirty"):
                continue
            path = os.path.join(cache_dir, entry)
            shutil.rmtree(path, ignore_errors=True) if os.path.isdir(path) \
                else os.unlink(path)
    open(_dirty, "w").close()

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", "tests must run on CPU"
    assert jax.device_count() == 8, "expected 8 virtual CPU devices"


def pytest_sessionfinish(session, exitstatus):
    # clean exit: the cache was fully written, clear the crash sentinel
    d = jax.config.jax_compilation_cache_dir
    if d:
        try:
            os.unlink(os.path.join(d, ".dirty"))
        except OSError:
            pass
