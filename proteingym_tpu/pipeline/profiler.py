"""Profiling & throughput accounting.

The reference's observability is ad-hoc wall-clock prints and tqdm bars
(SURVEY.md §5). Here:

  - ``trace(logdir)``: context manager around ``jax.profiler`` — captures a
    TensorBoard-compatible device trace of whatever runs inside.
  - ``Throughput``: mutants/sec/chip accounting for scorer runs (the v5e
    north-star metric, SURVEY.md §6), emitted through the JSONL event log.
  - ``device_memory_stats``: per-device HBM usage snapshot.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Optional


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace for everything inside the block."""
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, Any]:
    import jax

    out = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out


class Throughput:
    """Mutants/sec accounting across assays; integrates with EventLog."""

    def __init__(self, event_log=None):
        self.event_log = event_log
        self.total_mutants = 0
        self.total_seconds = 0.0

    @contextlib.contextmanager
    def measure(self, n_mutants: int, label: str = ""):
        start = time.perf_counter()
        yield
        dt = time.perf_counter() - start
        self.total_mutants += n_mutants
        self.total_seconds += dt
        if self.event_log is not None:
            self.event_log.emit(
                "throughput",
                label=label,
                n_mutants=n_mutants,
                seconds=round(dt, 4),
                mutants_per_sec=round(n_mutants / max(dt, 1e-9), 2),
            )

    @property
    def mutants_per_sec(self) -> float:
        return self.total_mutants / max(self.total_seconds, 1e-9)

    def summary(self) -> Dict[str, float]:
        return {
            "total_mutants": self.total_mutants,
            "total_seconds": round(self.total_seconds, 3),
            "mutants_per_sec": round(self.mutants_per_sec, 2),
        }
