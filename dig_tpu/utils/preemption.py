"""Preemption-safe training: catch SIGTERM/SIGINT, checkpoint, exit clean.

The reference's only failure story is restart + auto-resume from the last
periodic checkpoint (utils/utils.py:581-669) — on a preempted worker up
to ``save_ckpt_freq`` epochs of work are lost.  TPU pods (and GKE/GCE
spot capacity) deliver SIGTERM with a grace window before eviction, so a
production trainer should flush a checkpoint *at the next step boundary*
and exit cleanly; auto-resume then continues where the job stopped
instead of at the last epoch boundary.

Usage (both CLIs):

    guard = PreemptionGuard.install()
    for epoch ...:
        for step ...:
            ...
            if guard.should_stop:
                save_checkpoint(...); sys.exit(0)

The handler only sets a flag — all real work happens on the main thread
at a step boundary, so jitted steps are never interrupted mid-dispatch
and the saved state is always consistent.  A second signal while the
flush is in progress falls back to the previous handler (default: kill),
so a hung save cannot block eviction.
"""

from __future__ import annotations

import signal
import sys


class PreemptionGuard:
    """Latches termination signals into a poll-able flag."""

    _SIGNALS = (signal.SIGTERM, signal.SIGINT)

    def __init__(self):
        self._stop = False
        self._prev = {}

    @property
    def should_stop(self) -> bool:
        return self._stop

    def sync_should_stop(self, step: int = 0, every: int = 1) -> bool:
        """Cross-host stop decision: True iff ANY host caught a signal.

        A preemption SIGTERM may reach only some workers; if the signaled
        host checkpointed and exited alone, the rank-0 write gate could
        mean no checkpoint was written at all and the remaining hosts
        would hang at their next collective.  COLLECTIVE when
        process_count > 1 — every host must poll it at the same step
        boundary (both CLIs do).  Single-process reduces to the local
        flag with zero overhead.

        The allgather blocks the host thread, so a per-step poll would
        destroy the dispatch runahead that hides host latency on pods;
        `every=N` runs the collective only when ``step % N == 0`` and
        returns False otherwise.  The schedule must be DETERMINISTIC
        across hosts (never gate it on the local flag — one host polling
        off-schedule deadlocks the others), so stop latency is bounded by
        N steps: keep N·step_time well inside the eviction grace window
        (tens of seconds on TPU pods / GCE spot)."""
        import jax

        if jax.process_count() == 1:
            return self._stop
        if every > 1 and step % every:
            return False
        import numpy as np
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([self._stop], np.int32))
        return bool(np.max(np.asarray(flags)))

    def _handler(self, signum, frame):
        if self._stop:
            # second signal: restore default behavior and re-raise so a
            # stuck checkpoint flush can't outlive the grace window
            prev = self._prev.get(signum, signal.SIG_DFL)
            signal.signal(signum, prev)
            signal.raise_signal(signum)
            return
        self._stop = True
        name = signal.Signals(signum).name
        # bypass the rank-0 print gate (utils/logging.py): the catch must
        # be visible from WHICHEVER host received the signal
        sys.stderr.write(
            f"[preemption] caught {name}; will checkpoint at the next "
            "step boundary (send again to force-quit)\n")
        sys.stderr.flush()

    @classmethod
    def install(cls) -> "PreemptionGuard":
        """Install on the main thread; returns the guard.  Signals that
        cannot be installed (non-main thread, restricted env) are skipped
        — the guard then simply never fires."""
        guard = cls()
        for sig in cls._SIGNALS:
            try:
                guard._prev[sig] = signal.signal(sig, guard._handler)
            except (ValueError, OSError):  # non-main thread / unsupported
                pass
        return guard

    def uninstall(self):
        for sig, prev in self._prev.items():
            try:
                signal.signal(sig, prev)
            except (ValueError, OSError):
                pass
        self._prev = {}
