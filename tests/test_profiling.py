"""Profiler window tests: trace files appear, window opens/closes once."""

import os

import jax
import jax.numpy as jnp

from reverb_tpu.utils.profiling import ProfileWindow, device_memory_stats, trace


def test_profile_window_lifecycle(tmp_path):
    d = str(tmp_path / 'prof')
    pw = ProfileWindow(d, start_step=2, num_steps=2)
    x = jnp.ones((8, 8))
    for step in range(6):
        pw.maybe_start(step)
        x = (x @ x).block_until_ready()
        pw.maybe_stop(step)
    assert pw.done and not pw._active
    files = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
    assert any('xplane' in f or f.endswith('.pb') or 'trace' in f
               for f in files), files
    # idempotent close
    pw.close()


def test_trace_context(tmp_path):
    d = str(tmp_path / 'prof2')
    with trace(d):
        jnp.sum(jnp.arange(16.0)).block_until_ready()
    assert os.path.isdir(d)


def test_no_logdir_is_noop():
    pw = ProfileWindow(None)
    pw.maybe_start(10)
    pw.maybe_stop(10)
    assert not pw.done or True   # never raises, never activates
    assert not pw._active


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)   # empty on CPU backends
