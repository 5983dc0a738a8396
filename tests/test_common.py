import numpy as np
import jax.numpy as jnp

from reverb_tpu.utils.common import (add_sos_eos, log_add, make_pad_mask,
                                     remove_duplicates_and_blank,
                                     reverse_sequence, subsequent_chunk_mask,
                                     subsequent_mask, th_accuracy)


def test_make_pad_mask():
    m = np.asarray(make_pad_mask(jnp.array([2, 0, 3]), 4))
    expect = np.array([[0, 0, 1, 1], [1, 1, 1, 1], [0, 0, 0, 1]], dtype=bool)
    np.testing.assert_array_equal(m, expect)


def test_subsequent_mask():
    m = np.asarray(subsequent_mask(3))
    np.testing.assert_array_equal(
        m, np.array([[1, 0, 0], [1, 1, 0], [1, 1, 1]], dtype=bool))


def test_subsequent_chunk_mask():
    # matches docstring example at asr/wenet/utils/mask.py:62-97
    m = np.asarray(subsequent_chunk_mask(4, 2, -1))
    np.testing.assert_array_equal(
        m, np.array([[1, 1, 0, 0], [1, 1, 0, 0],
                     [1, 1, 1, 1], [1, 1, 1, 1]], dtype=bool))
    m = np.asarray(subsequent_chunk_mask(6, 2, 1))
    # row 4..5 (chunk 2) sees chunks 1 and 2 only
    assert not m[4, 0] and not m[4, 1] and m[4, 2] and m[4, 5]


def test_add_sos_eos_matches_reference_example():
    # example from asr/wenet/utils/common.py:113-160
    ys = jnp.array([[1, 2, 3, 4, 5], [4, 5, 6, -1, -1], [7, 8, 9, -1, -1]])
    lens = jnp.array([5, 3, 3])
    ys_in, ys_out = add_sos_eos(ys, lens, 10, 11, -1)
    np.testing.assert_array_equal(
        np.asarray(ys_in),
        [[10, 1, 2, 3, 4, 5], [10, 4, 5, 6, 11, 11], [10, 7, 8, 9, 11, 11]])
    np.testing.assert_array_equal(
        np.asarray(ys_out),
        [[1, 2, 3, 4, 5, 11], [4, 5, 6, 11, -1, -1], [7, 8, 9, 11, -1, -1]])


def test_reverse_sequence():
    ys = jnp.array([[1, 2, 3], [9, 8, -1], [2, -1, -1]])
    lens = jnp.array([3, 2, 1])
    r = np.asarray(reverse_sequence(ys, lens, -1))
    np.testing.assert_array_equal(r, [[3, 2, 1], [8, 9, -1], [2, -1, -1]])


def test_log_add():
    a = jnp.array([-1.0, -jnp.inf])
    b = jnp.array([-2.0, -jnp.inf])
    out = np.asarray(log_add(a, b))
    assert abs(out[0] - np.logaddexp(-1.0, -2.0)) < 1e-5
    assert out[1] == -np.inf


def test_remove_duplicates_and_blank():
    assert remove_duplicates_and_blank([0, 1, 1, 0, 1, 2, 2, 0]) == [1, 1, 2]
    assert remove_duplicates_and_blank([0, 0]) == []


def test_th_accuracy():
    pred = jnp.zeros((1, 3, 4)).at[0, 0, 1].set(5.0).at[0, 1, 2].set(5.0)
    gold = jnp.array([[1, 2, -1]])
    acc = float(th_accuracy(pred, gold, -1))
    assert abs(acc - 1.0) < 1e-6


def test_add_whisper_tokens():
    """Prompt construction parity (utils/common.py:158-237): ys_in gets
    [sot, lang, task, no_timestamps] prefix, ys_out shifts it off and
    appends eot; pads are eot / ignore_id."""
    from reverb_tpu.utils.common import WHISPER_LANGS, add_whisper_tokens
    sp = {'sot': 500, 'eot': 501, 'transcribe': 601, 'translate': 602,
          'no_speech': 603, 'no_timestamps': 604}
    ys = np.array([[7, 8, 9], [4, -1, -1]])
    ys_in, ys_out = add_whisper_tokens(sp, ys, -1,
                                       tasks=['transcribe', 'vad'],
                                       langs=['en', 'zh'])
    en_id = 500 + 1 + WHISPER_LANGS.index('en')
    zh_id = 500 + 1 + WHISPER_LANGS.index('zh')
    assert ys_in[0].tolist() == [500, en_id, 601, 604, 7, 8, 9]
    assert ys_out[0].tolist() == [en_id, 601, 604, 7, 8, 9, 501]
    assert ys_in[1].tolist() == [500, zh_id, 603, 4, 501, 501, 501]
    assert ys_out[1].tolist() == [zh_id, 603, 4, 501, -1, -1, -1]


def test_step_watchdog_semantics():
    """train/watchdog.py (wenet_join monitored_barrier equivalent):
    beat() keeps it quiet, a stall flips `stalled` and check() raises with
    a diagnosis; beat() after a stall recovers."""
    import time
    from reverb_tpu.train.watchdog import StepWatchdog, epoch_barrier
    wd = StepWatchdog(timeout_s=0.3, exit_on_stall=False, poll_s=0.05)
    try:
        for s in range(3):
            wd.beat(s)
            wd.check()             # no raise while beating
            time.sleep(0.05)
        time.sleep(0.6)            # stall
        assert wd.stalled
        try:
            wd.check()
            assert False, 'check() must raise on stall'
        except RuntimeError as e:
            assert 'stalled' in str(e)
        wd.beat(4)                 # recovery
        wd.check()
    finally:
        wd.stop()
    epoch_barrier('test')          # single-process no-op
