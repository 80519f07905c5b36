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


class StepTraceWindow:
    """CLI-wirable profiler window: trace steps [start, start+n).

    Call `tick()` once per training step; the window opens the
    `jax.profiler` trace when the step counter reaches `start` (default
    past the first compiles) and closes it `n` steps later.  `close()`
    is idempotent and must run on early exit so a short run never leaves
    a dangling trace.  Rank-0 only — one host's trace is representative
    and concurrent writers would collide on shared storage."""

    def __init__(self, log_dir: str, n: int, start: int = 10):
        import jax

        self.log_dir = log_dir
        self.start = start
        self.stop_at = start + n
        self.enabled = n > 0 and jax.process_index() == 0
        self.step = 0
        self.active = False
        if self.enabled:
            # runs that end (or sys.exit: NaN abort, preemption) before
            # the window fills must still flush the open trace
            import atexit

            atexit.register(self.close)

    def tick(self):
        import jax

        if not self.enabled:
            return
        if self.step == self.start:
            jax.profiler.start_trace(self.log_dir)
            self.active = True
        self.step += 1
        if self.active and self.step >= self.stop_at:
            self.close()
            print(f"[profile] trace of steps [{self.start}, {self.stop_at})"
                  f" written to {self.log_dir}")

    def close(self):
        import jax

        if self.active:
            jax.profiler.stop_trace()
            self.active = False


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
