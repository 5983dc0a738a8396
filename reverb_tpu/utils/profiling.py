"""Profiling window for training/serving (SURVEY.md §5 'tracing/profiling').

The reference has only commented-out tracemalloc/pympler remnants
(asr/wenet/bin/train.py:17,209-210, utils/executor.py:15,40-42); on TPU we
get a real profiler for free: `jax.profiler` emits an xplane trace viewable
in TensorBoard/Perfetto (device timelines, HLO ops, HBM usage).

Usage in a step loop:

    prof = ProfileWindow(logdir, start_step=10, num_steps=5)
    for ...:
        prof.maybe_start(step); ...; prof.maybe_stop(step)

or as a context: `with trace(logdir): ...`.
"""

from __future__ import annotations

import contextlib
import logging

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Trace a block into `logdir` (xplane / TensorBoard format)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ProfileWindow:
    """Start/stop a jax.profiler trace over a step window ([start, start+n))."""

    def __init__(self, logdir: str | None, start_step: int = 10,
                 num_steps: int = 5):
        self.logdir = logdir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False
        self.done = False

    def maybe_start(self, step: int):
        if (self.logdir and not self.done and not self._active
                and step >= self.start_step and step < self.stop_step):
            logging.info('profiler: starting trace at step %d → %s', step,
                         self.logdir)
            jax.profiler.start_trace(self.logdir)
            self._active = True

    def maybe_stop(self, step: int):
        if self._active and step + 1 >= self.stop_step:
            jax.profiler.stop_trace()
            logging.info('profiler: stopped trace at step %d', step)
            self._active = False
            self.done = True

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self.done = True


def device_memory_stats() -> dict:
    """Per-device live HBM usage (bytes) — the ZeRO memory-estimator
    counterpart (train_utils.py:375-385)."""
    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
        except Exception:      # CPU backend has none
            s = None
        if s:
            out[str(d)] = {'bytes_in_use': s.get('bytes_in_use', 0),
                           'peak_bytes_in_use': s.get('peak_bytes_in_use', 0),
                           'bytes_limit': s.get('bytes_limit', 0)}
    return out
