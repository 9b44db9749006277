"""Preemption guard: turn SIGTERM into a drain-and-checkpoint flag.

TPU VMs are preemptible and batch schedulers deliver SIGTERM before the
kill; a training driver that ignores it loses everything since the last
milestone (the reference checkpoints only at epoch 300 and the final
epoch, Train_Onet_on_simclutter_20250407.py:255-267). Drivers install
the guard around their epoch loop, poll ``triggered`` at step
boundaries, and on preemption write a checkpoint and return cleanly —
the resumed run redoes the interrupted epoch in full (exactness over
wall time).

Signal handlers are process-global and only installable from the main
thread; elsewhere (tests driving trainers from worker threads) the guard
degrades to an inert flag.
"""

from __future__ import annotations

import signal
import threading


class PreemptGuard:
    """install() -> poll .triggered -> restore(). Re-entrant safe: each
    install chains the previously-installed handler back on restore."""

    def __init__(self, enabled: bool = True):
        self.enabled = (enabled and threading.current_thread()
                        is threading.main_thread())
        self._event = threading.Event()
        self._old = None
        self._installed = False

    def install(self) -> "PreemptGuard":
        if self.enabled:
            self._old = signal.signal(
                signal.SIGTERM, lambda signum, frame: self._event.set())
            self._installed = True
        return self

    def restore(self) -> None:
        if self._installed:
            signal.signal(signal.SIGTERM, self._old)
            self._installed = False

    @property
    def triggered(self) -> bool:
        return self._event.is_set()
