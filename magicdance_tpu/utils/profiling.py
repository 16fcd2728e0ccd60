"""Profiling & device-memory observability.

Green-field improvement over the reference's peak-CUDA-memory prints
(ref utils/utils.py:36 print_peak_memory; SURVEY.md §5 "Tracing"): proper
XLA traces via jax.profiler plus structured device memory stats.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


def device_memory_stats(device=None) -> dict:
    """{bytes_in_use, peak_bytes_in_use, bytes_limit} for a device (empty
    dict when the backend does not expose stats, e.g. CPU)."""
    d = device or jax.local_devices()[0]
    try:
        stats = d.memory_stats() or {}
    except Exception:
        stats = {}
    return {
        k: stats.get(k)
        for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
        if k in stats
    }


def log_peak_memory(tag: str, logger=None) -> dict:
    """Reference-style peak-memory line (train_tiktok.py:1010,1219)."""
    stats = device_memory_stats()
    gb = {k: v / 1e9 for k, v in stats.items() if v is not None}
    msg = f"[mem] {tag}: " + ", ".join(f"{k}={v:.2f}GB" for k, v in gb.items())
    print(msg, flush=True)
    if logger is not None and "peak_bytes_in_use" in stats:
        logger.log(0, {f"mem/{tag}": stats["peak_bytes_in_use"]})
    return stats


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """jax.profiler trace context writing a TensorBoard-loadable profile."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Rolling wall-clock step timer with images/sec accounting."""

    def __init__(self, window: int = 50):
        self.window = window
        self._t: list[float] = []

    def tick(self) -> None:
        self._t.append(time.time())
        if len(self._t) > self.window + 1:
            self._t.pop(0)

    @property
    def steps_per_sec(self) -> Optional[float]:
        if len(self._t) < 2:
            return None
        return (len(self._t) - 1) / (self._t[-1] - self._t[0])
