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
        print(f"[preemption] caught {name}; will checkpoint at the next "
              "step boundary (send again to force-quit)", file=sys.stderr)

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
