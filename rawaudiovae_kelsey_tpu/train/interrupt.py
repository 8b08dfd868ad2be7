"""Graceful interruption: checkpoint-on-SIGTERM/SIGINT.

The reference had no failure handling at all (SURVEY.md §5.3 — errors were
unhandled, checkpoints never reloaded).  Preemptible TPU jobs get a SIGTERM
before eviction; this handler flips a flag the drivers poll each batch, so
they finish the in-flight step, write a checkpoint, and exit cleanly —
``--resume`` then continues bit-seamlessly (fold_in(step) RNG).
"""

from __future__ import annotations

import signal
from types import FrameType
from typing import Optional


class GracefulInterrupt:
    """``with GracefulInterrupt() as stop: ... if stop: checkpoint+break``."""

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self._signals = signals
        self._previous = {}
        self.requested = False
        self.signum: Optional[int] = None

    def _handler(self, signum: int, frame: Optional[FrameType]) -> None:
        self.requested = True
        self.signum = signum
        print(f"\nReceived signal {signum}: finishing step, then "
              "checkpointing and exiting...")

    def __enter__(self) -> "GracefulInterrupt":
        for sig in self._signals:
            try:
                self._previous[sig] = signal.signal(sig, self._handler)
            except ValueError:
                # not the main thread (e.g. under a test runner) — fall back
                # to never-interrupted behavior rather than crash
                self._previous.pop(sig, None)
        return self

    def __exit__(self, *exc) -> bool:
        for sig, prev in self._previous.items():
            signal.signal(sig, prev)
        return False

    def __bool__(self) -> bool:
        return self.requested
