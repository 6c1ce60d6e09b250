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


def _gce_maintenance_poll(timeout_s: float = 2.0) -> Optional[str]:
    """One poll of the GCE metadata maintenance-event endpoint. Returns the
    event string ("NONE" when idle), or None when the metadata server is
    unreachable (not on GCE)."""
    import urllib.request

    req = urllib.request.Request(
        "http://metadata.google.internal/computeMetadata/v1/instance/"
        "maintenance-event",
        headers={"Metadata-Flavor": "Google"},
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            return resp.read().decode("utf-8").strip()
    except Exception:
        return None


_default_watcher: Optional[threading.Thread] = None
_default_watcher_lock = threading.Lock()


def start_preemption_watcher(
    poll=None,
    interval_s: float = 5.0,
    max_failures: int = 3,
) -> threading.Thread:
    """Background watcher: SIGTERM is not the only eviction signal on GCE —
    host maintenance is announced ahead of time on the metadata server.
    Polls `poll()` (default: the GCE maintenance-event endpoint) every
    `interval_s`. Event policy: only TERMINATE-class events (the endpoint
    reports "TERMINATE_ON_HOST_MAINTENANCE" on instances whose maintenance
    policy is terminate — spot/preemptible TPU-VMs) trigger
    `request_preemption()`; "MIGRATE_ON_HOST_MAINTENANCE" is survivable
    (live migration) so the watcher logs it and KEEPS watching rather than
    aborting training. SIGTERM remains the authoritative eviction path
    either way. `max_failures` consecutive unreachable polls mean we are
    not on GCE — the daemon thread exits quietly.

    With the default poll, one watcher per process: repeat calls (e.g. an
    in-process HP sweep running train() per trial) return the live thread
    instead of stacking pollers against the metadata endpoint.

    Returns the (daemon) thread; callers may join it in tests."""
    if poll is None:
        global _default_watcher
        with _default_watcher_lock:
            if _default_watcher is not None and _default_watcher.is_alive():
                return _default_watcher
            _default_watcher = start_preemption_watcher(
                poll=_gce_maintenance_poll,
                interval_s=interval_s,
                max_failures=max_failures,
            )
            return _default_watcher
    poll = poll or _gce_maintenance_poll

    def watch():
        failures = 0
        warned_migrate = False
        while True:
            value = poll()
            if value is None:
                failures += 1
                if failures >= max_failures:
                    return  # not on GCE — stop polling
            else:
                failures = 0
                if value not in ("NONE", "") and "MIGRATE" not in value:
                    # TERMINATE-class (or unknown) event → checkpoint+exit.
                    request_preemption()
                    return
                if "MIGRATE" in value and not warned_migrate:
                    # Live migration: the instance survives — don't abort
                    # training, and keep watching for a later TERMINATE.
                    print(f"preemption-watcher: survivable maintenance "
                          f"event {value!r} — continuing")
                    warned_migrate = True
            if _requested.wait(interval_s):
                return  # preempted via another path — nothing left to watch

    thread = threading.Thread(
        target=watch, name="preemption-watcher", daemon=True
    )
    thread.start()
    return thread


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
