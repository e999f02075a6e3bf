"""Tracing, timing, and throughput observability.

The reference's only instrumentation is wall-clock prints (main.py:104,178;
matdecomp.py:111-112 — SURVEY.md §5).  This module formalizes it:

* :class:`StageTimer` — per-stage wall-clock with device fencing,
* :func:`rays_per_second` — the headline throughput meter (BASELINE.md),
* :func:`trace` — context manager around ``jax.profiler`` for XLA-level
  traces viewable in TensorBoard/Perfetto,
* :func:`device_memory_stats` — HBM usage snapshot where the backend
  supports it.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import numpy as np

__all__ = ["StageTimer", "rays_per_second", "trace", "fence",
           "device_memory_stats"]


def fence(tree):
    """Force completion AND host visibility of a pytree of device arrays.

    ``block_until_ready`` alone is not trustworthy on every runtime (the
    tunneled backend used here returns early); fetching one element per
    leaf guarantees the computation ran.
    """
    import jax

    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "reshape")]
    for leaf in leaves:
        np.asarray(leaf.reshape(-1)[0] if leaf.size else leaf)
    return tree


@dataclasses.dataclass
class StageRecord:
    name: str
    seconds: float
    calls: int


class StageTimer:
    """Accumulating per-stage timer with device fencing.

    >>> timer = StageTimer()
    >>> with timer("forward"):
    ...     out = fence(projector(...))
    >>> timer.report()
    """

    def __init__(self):
        self.records: dict = {}

    @contextlib.contextmanager
    def __call__(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            rec = self.records.get(name)
            if rec is None:
                self.records[name] = StageRecord(name, dt, 1)
            else:
                rec.seconds += dt
                rec.calls += 1

    def report(self, printer=print):
        total = sum(r.seconds for r in self.records.values())
        for r in self.records.values():
            printer(f"{r.name:24s} {r.seconds:8.3f}s  x{r.calls}"
                    f"  ({100 * r.seconds / max(total, 1e-12):5.1f}%)")
        printer(f"{'total':24s} {total:8.3f}s")
        return total


def rays_per_second(n_proj, n_channels, seconds, n_spectra=1):
    """The headline throughput metric: traced rays per second."""
    return n_proj * n_channels * n_spectra / max(seconds, 1e-12)


@contextlib.contextmanager
def trace(log_dir="/tmp/dexct_trace"):
    """XLA profiler trace around a block (TensorBoard/Perfetto format).

    Silently degrades to a no-op where the backend lacks profiling.
    """
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass
    try:
        yield log_dir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def device_memory_stats():
    """Per-device memory stats dict (empty where unsupported)."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = {}
    return out
