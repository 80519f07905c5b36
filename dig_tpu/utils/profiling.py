"""Profiling hooks.

The reference has no tracer (SURVEY.md §5.1 — only per-iteration timing
meters).  This module adds first-class `jax.profiler` capture: trace a
window of steps to TensorBoard-viewable protobufs, plus a simple step
timer with device-sync semantics equivalent to the reference's
`torch.cuda.synchronize()` timing."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing that blocks on a representative output."""

    def __init__(self):
        self.t0 = None
        self.times = []

    def start(self):
        self.t0 = time.perf_counter()

    def stop(self, block_on=None):
        import jax

        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - self.t0
        self.times.append(dt)
        return dt

    @property
    def avg(self):
        return sum(self.times) / max(len(self.times), 1)


def device_memory_stats() -> dict:
    """Best-effort per-device memory stats (≙ torch.cuda.max_memory_allocated
    in the log line, utils/utils.py:269)."""
    import jax

    stats = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
            }
        except Exception:
            pass
    return stats
