"""Preemption detection for TPU-VM training.

The reference has no failure detection at all (SURVEY §5 — "no
resume-from-checkpoint, no preemption handling"); on Vertex a preempted
A100 job simply lost its partial epoch. TPU pods ARE preempted (spot
capacity, maintenance events), and the eviction grace window (~30 s on
GCE) can be shorter than one epoch at production dims — so the train loop
checks `PreemptionGuard.requested` after every optimizer step and, when
set, writes a full-state checkpoint (params + optimizer moments + step +
loop bookkeeping + position inside the epoch) and exits cleanly. Resume
is step-exact: the per-step dropout key folds in `state.step` and the
epoch shuffle is a pure function of (seed, epoch), so the restored run
replays the identical batch and RNG streams.

Two trigger paths:
  * SIGTERM (installed by the guard) — what GCE sends on eviction.
  * `request_preemption()` — for external watchers (e.g. a thread polling
    the GCE metadata server's maintenance-event endpoint) and for tests.

The flag is process-global and sticky: entering a guard does NOT clear a
pending request (a request racing the guard's installation must not be
lost). Call `clear_preemption()` explicitly to reset, e.g. between
back-to-back runs in one process.
"""

from __future__ import annotations

import signal
import threading
from typing import Optional, Tuple

_requested = threading.Event()


def request_preemption() -> None:
    """Ask the training loop to checkpoint and exit at the next step."""
    _requested.set()


def clear_preemption() -> None:
    """Reset a pending request (tests / multi-run processes)."""
    _requested.clear()


def preemption_requested() -> bool:
    return _requested.is_set()


class PreemptionGuard:
    """Context manager installing SIGTERM → `request_preemption()`.

    Signal handlers can only be installed from the main thread; elsewhere
    (e.g. an HP-sweep trial thread) the guard degrades to the programmatic
    trigger alone. Previous handlers are restored on exit.
    """

    def __init__(self, enabled: bool = True,
                 signals: Tuple[int, ...] = (signal.SIGTERM,)):
        self.enabled = enabled
        self.signals = signals
        self._previous: Optional[dict] = None

    def __enter__(self) -> "PreemptionGuard":
        if not self.enabled:
            return self
        try:
            previous = {}
            for sig in self.signals:
                previous[sig] = signal.signal(
                    sig, lambda signum, frame: request_preemption()
                )
            self._previous = previous
        except ValueError:
            # Not the main thread — keep the programmatic path only.
            self._previous = None
        return self

    def __exit__(self, *exc) -> None:
        if self._previous is not None:
            for sig, handler in self._previous.items():
                signal.signal(sig, handler)
            self._previous = None

    @property
    def requested(self) -> bool:
        return preemption_requested()
