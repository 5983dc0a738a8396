"""Multi-host stall / straggler detection.

Parity target: the reference's `wenet_join` gloo monitored_barrier
(asr/wenet/utils/train_utils.py:569-595, bin/train.py:147-156) — every rank
checks into a barrier with a timeout so a stalled peer (dead host, hung
data pipeline) surfaces as a timeout error instead of an silent infinite
wait.

Under SPMD the failure mode is different: there is ONE compiled program and
the collectives live inside it, so a stalled peer leaves every other
process BLOCKED inside a device collective where no python exception can be
raised.  The TPU-native equivalent is therefore a host-side watchdog:

  - `StepWatchdog` — a daemon thread that fires when no training step has
    completed for `timeout_s` (the executor calls `beat()` after each
    step).  On stall it logs a loud diagnosis; with `exit_on_stall=True`
    (or env REVERB_STALL_EXIT=1) it hard-exits the process so an external
    supervisor (the multi-host launcher) can tear down and restart the job
    — exactly the recovery monitored_barrier's raise enables.  If the main
    thread is merely slow (not blocked), `check()` raises in-band on the
    next step.
  - `epoch_barrier(tag)` — `multihost_utils.sync_global_devices` at epoch
    boundaries when process_count > 1: the explicit cross-host sync point
    whose hang the watchdog converts into a diagnosed failure.
"""

from __future__ import annotations

import logging
import os
import threading
import time
from typing import Optional


class StepWatchdog:
    """Fires when `beat()` hasn't been called for `timeout_s` seconds."""

    def __init__(self, timeout_s: float = 1800.0,
                 exit_on_stall: Optional[bool] = None,
                 poll_s: Optional[float] = None):
        self.timeout_s = float(timeout_s)
        if exit_on_stall is None:
            exit_on_stall = os.environ.get('REVERB_STALL_EXIT', '0') == '1'
        self.exit_on_stall = exit_on_stall
        self._poll_s = poll_s if poll_s is not None else \
            min(max(self.timeout_s / 10.0, 1.0), 60.0)
        self._last = time.monotonic()
        self._last_step = -1
        self.stalled = False
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def beat(self, step: int = -1):
        """Call after every completed training step."""
        self._last = time.monotonic()
        self._last_step = step
        self.stalled = False

    def check(self):
        """In-band check for callers that CAN raise (the executor calls it
        at the top of each loop iteration)."""
        if self.stalled:
            raise RuntimeError(
                f'training stalled: no step completed in {self.timeout_s:.0f}'
                f' s (last step {self._last_step}) — a peer host or the data'
                ' pipeline is likely hung (wenet_join timeout equivalent)')

    def stop(self):
        self._stop.set()

    def _run(self):
        while not self._stop.wait(self._poll_s):
            age = time.monotonic() - self._last
            if age > self.timeout_s and not self.stalled:
                self.stalled = True
                logging.error(
                    'StepWatchdog: no training step for %.0f s (last step '
                    '%d). A peer host or this host\'s data pipeline is '
                    'stalled; processes blocked inside a device collective '
                    'cannot raise — %s',
                    age, self._last_step,
                    'hard-exiting for supervisor restart'
                    if self.exit_on_stall else
                    'set REVERB_STALL_EXIT=1 to hard-exit for supervisor '
                    'restart')
                if self.exit_on_stall:
                    os._exit(17)


def epoch_barrier(tag: str):
    """Cross-host sync at epoch boundaries (no-op single-process)."""
    import jax
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)
