"""Profiling and step-time observability.

The reference has no tracing — only ad-hoc wall-clock logs and pynvml
memory snapshots (reference: src/ir/training/ddp_utils.py:30-40). TPU
equivalents: ``jax.profiler`` trace capture (viewable in XProf/
TensorBoard) and lightweight step-time/QPS counters for training and
serving loops.
"""
from __future__ import annotations

import contextlib
import logging
import time
from collections import deque
from typing import Deque, Dict, Optional

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


def device_memory_stats() -> Dict[str, int]:
    """Per-device live-bytes snapshot (TPU counterpart of the
    reference's pynvml log_cuda_usage)."""
    import jax

    stats = {}
    for d in jax.devices():
        try:
            m = d.memory_stats()
            stats[str(d)] = {
                "bytes_in_use": m.get("bytes_in_use", -1),
                "peak_bytes_in_use": m.get("peak_bytes_in_use", -1),
                "bytes_limit": m.get("bytes_limit", -1),
            }
        except Exception:
            stats[str(d)] = {}
    return stats


class StepTimer:
    """Rolling step-time / throughput counter.

    Usage::

        timer = StepTimer(window=100)
        for batch in data:
            with timer.step(items=len(batch)):
                run(batch)
        print(timer.summary())
    """

    def __init__(self, window: int = 100):
        self.window = window
        self.times: Deque[float] = deque(maxlen=window)
        self.items: Deque[int] = deque(maxlen=window)
        self.total_steps = 0
        self.total_items = 0
        self._t0: Optional[float] = None

    @contextlib.contextmanager
    def step(self, items: int = 1):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.times.append(dt)
        self.items.append(items)
        self.total_steps += 1
        self.total_items += items

    def summary(self) -> Dict[str, float]:
        # snapshot first: another thread (the serve dispatcher) appends
        # concurrently, and iterating a deque during mutation raises
        # RuntimeError — /stats would intermittently die under load
        for _ in range(8):
            try:
                times = list(self.times)
                items = list(self.items)
                break
            except RuntimeError:
                continue
        else:  # pragma: no cover - pathological contention
            return {}
        if not times:
            return {}
        ts = sorted(times)
        n = len(ts)
        total = sum(times)
        return {
            "steps": self.total_steps,
            "mean_s": total / n,
            "p50_s": ts[n // 2],
            "p99_s": ts[min(n - 1, int(n * 0.99))],
            "items_per_s": sum(items) / total if total else 0.0,
        }

    def log(self, prefix: str = "steps"):
        s = self.summary()
        if s:
            logger.info(
                "%s: mean=%.1f ms p50=%.1f ms p99=%.1f ms "
                "throughput=%.1f items/s", prefix, 1e3 * s["mean_s"],
                1e3 * s["p50_s"], 1e3 * s["p99_s"], s["items_per_s"])
