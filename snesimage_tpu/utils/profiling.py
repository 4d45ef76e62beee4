"""Tracing / profiling hooks.

The reference's only observability is throttled error logging
(src/lib.rs:910-915). TPU-native equivalent (SURVEY.md §5): step timers,
objective history, and `jax.profiler` trace capture for Perfetto/XProf.
"""

from __future__ import annotations

import contextlib
import logging
import time
from dataclasses import dataclass, field

import jax

log = logging.getLogger("snesimage_tpu")


@dataclass
class StepTimer:
    """Accumulates per-phase wall-clock; report with `summary()`."""

    times: dict = field(default_factory=dict)
    counts: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def time(self, name: str, *, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for name, total in sorted(self.times.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: {total:.3f}s total, {n} calls, {total / n * 1e3:.2f}ms/call")
        return "\n".join(lines)

    def log_summary(self) -> None:
        for line in self.summary().splitlines():
            log.info("timing | %s", line)


@contextlib.contextmanager
def trace(trace_dir: str | None):
    """Capture a jax.profiler trace (viewable in XProf/Perfetto) when a
    directory is given; no-op otherwise."""
    if not trace_dir:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", trace_dir)
