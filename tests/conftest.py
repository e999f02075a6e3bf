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

# Persistent compile cache: DISABLED by default.  XLA compiles of the
# fused pipelines dominate suite wall-clock and a persistent cache
# halves repeat runs — but on this environment the XLA:CPU AOT
# serializer is UNRELIABLE late in a long session: three full-suite
# runs segfaulted/aborted inside compilation_cache
# put/get_executable_and_time (executable.serialize() or its
# deserialization), each after ~300+ tests, at DIFFERENT tests, on a
# cold cache, with single-process access enforced by flock, while the
# same tests pass in isolation with the same cache — i.e. the fault
# needs accumulated in-process compile state and cannot be scoped per
# entry.  (Cross-host staleness is a second, independent hazard: the
# VM migrates between heterogeneous hosts and foreign AOT entries
# SIGILL at load.)  With no cache, put/get are never called and the
# whole crash class is gone; the suite compiles cold (~25 min single
# core).  Developers iterating on one module can still opt in:
#
#   JAX_COMPILATION_CACHE_DIR=/tmp/myjaxcache python -m pytest tests/test_x.py
#
# — safe for short runs; do NOT enable it for the full suite.
if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", "tests must run on CPU"
    assert jax.device_count() == 8, "expected 8 virtual CPU devices"


# Release compiled executables between test MODULES.  Full-suite runs
# segfaulted at ~80-85% inside plain XLA:CPU compilation (and, when the
# persistent cache was on, inside its serialize/deserialize wrappers) —
# never at the same test, never in isolation, RAM free: the signature
# of accumulated loaded-executable state (hundreds of live AOT code
# objects in one process) breaking the compiler/loader late in the
# session.  Dropping the jit caches per module keeps the live count
# bounded by one module's compiles; cross-module recompiles of shared
# helpers cost a few % of wall-clock.
_LAST_MODULE = [None]


def pytest_runtest_setup(item):
    mod = item.module.__name__
    if _LAST_MODULE[0] is not None and _LAST_MODULE[0] != mod:
        jax.clear_caches()
    _LAST_MODULE[0] = mod
