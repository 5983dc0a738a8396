"""CTC utility algorithms: forced alignment (viterbi) + peak timestamps.

Parity: asr/wenet/utils/ctc_utils.py —
  - force_align (:105-161): viterbi over the blank-interleaved label graph;
    here a vectorized lax.scan on device (batched) instead of a python DP.
  - gen_ctc_peak_time (:50-59), gen_timestamps_from_peak (:62-92)
  - get_blank_id (:164-178) lives in cli/reverb.py
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


@functools.partial(jax.jit, static_argnums=())
def force_align_device(ctc_probs, y, t_len, y_len, blank_id: int = 0):
    """Viterbi CTC alignment for one utterance.

    ctc_probs: (T, V) log-probs; y: (L,) labels (padded); t_len, y_len scalars.
    Returns state sequence (T,) over the 2L+1 interleaved graph, -1 past t_len.
    """
    T, V = ctc_probs.shape
    L = y.shape[0]
    S = 2 * L + 1
    # interleaved labels: blank, y0, blank, y1, ... blank
    y_ins = jnp.full((S,), blank_id, dtype=y.dtype)
    y_ins = y_ins.at[1::2].set(y)
    s_idx = jnp.arange(S)
    valid_state = s_idx < 2 * y_len + 1

    def step(carry, t):
        alpha, bp_prev = carry
        emit = ctc_probs[t, y_ins]                         # (S,)
        stay = alpha
        from1 = jnp.concatenate([jnp.full((1,), NEG_INF), alpha[:-1]])
        # skip transition allowed into non-blank states whose label differs
        # from the state two back
        from2 = jnp.concatenate([jnp.full((2,), NEG_INF), alpha[:-2]])
        same = jnp.concatenate(
            [jnp.ones((2,), bool), y_ins[2:] == y_ins[:-2]])
        is_blank = (s_idx % 2) == 0
        from2 = jnp.where(is_blank | same, NEG_INF, from2)
        stacked = jnp.stack([stay, from1, from2])          # (3, S)
        best = jnp.argmax(stacked, axis=0)
        new_alpha = jnp.max(stacked, axis=0) + emit
        new_alpha = jnp.where(valid_state, new_alpha, NEG_INF)
        backptr = s_idx - best                             # previous state
        return (new_alpha, backptr), backptr

    init_alpha = jnp.full((S,), NEG_INF)
    init_alpha = init_alpha.at[0].set(ctc_probs[0, blank_id])
    init_alpha = jnp.where(
        (s_idx == 1) & (y_len > 0), ctc_probs[0, y_ins[1]], init_alpha)
    (_, _), backptrs = jax.lax.scan(
        step, (init_alpha, s_idx), jnp.arange(1, T))

    # value-only pass honoring t_len to pick the end state
    def val_step(alpha, t):
        emit = ctc_probs[t, y_ins]
        from1 = jnp.concatenate([jnp.full((1,), NEG_INF), alpha[:-1]])
        from2 = jnp.concatenate([jnp.full((2,), NEG_INF), alpha[:-2]])
        same = jnp.concatenate(
            [jnp.ones((2,), bool), y_ins[2:] == y_ins[:-2]])
        is_blank = (s_idx % 2) == 0
        from2 = jnp.where(is_blank | same, NEG_INF, from2)
        new_alpha = jnp.maximum(jnp.maximum(alpha, from1), from2) + emit
        new_alpha = jnp.where(valid_state, new_alpha, NEG_INF)
        return jnp.where(t < t_len, new_alpha, alpha), None

    final_alpha, _ = jax.lax.scan(val_step, init_alpha, jnp.arange(1, T))
    end1 = 2 * y_len
    end2 = jnp.maximum(2 * y_len - 1, 0)
    end_state = jnp.where(final_alpha[end1] >= final_alpha[end2], end1, end2)

    # backtrace through backptrs (only steps < t_len active)
    def back(state, t):
        bp = backptrs[t]
        prev = bp[state]
        active = (t + 1) < t_len
        out_state = jnp.where(active, state, -1)
        return jnp.where(active, prev, state), out_state

    last, states_rev = jax.lax.scan(back, end_state,
                                    jnp.arange(T - 2, -1, -1))
    states = jnp.concatenate([last[None], states_rev[::-1]])
    states = jnp.where(jnp.arange(T) < t_len, states, -1)
    return states, y_ins


def force_align(ctc_probs, y, blank_id: int = 0) -> List[int]:
    """Host wrapper: returns the framewise label alignment (ctc_utils.py:105).
    ctc_probs (T,V) log-probs, y list of labels."""
    ctc_probs = jnp.asarray(ctc_probs)
    y_arr = jnp.asarray(np.asarray(y, dtype=np.int32))
    states, y_ins = force_align_device(
        ctc_probs, y_arr, jnp.asarray(ctc_probs.shape[0]),
        jnp.asarray(len(y)), blank_id)
    states = np.asarray(states)
    y_ins = np.asarray(y_ins)
    return [int(y_ins[s]) if s >= 0 else blank_id for s in states]


def gen_ctc_peak_time(alignment: List[int], blank_id: int = 0) -> List[int]:
    """Frame indices where a new non-blank token is emitted."""
    times = []
    prev = None
    for t, tok in enumerate(alignment):
        if tok != blank_id and tok != prev:
            times.append(t)
        prev = tok
    return times


def gen_timestamps_from_peak(peaks: List[int], max_duration: float,
                             frame_rate: float = 0.04,
                             max_token_duration: float = 1.0):
    """(begin, end) second pairs per token (ctc_utils.py:62-92)."""
    times = []
    half = max_token_duration / 2
    for i, peak in enumerate(peaks):
        if i == 0:
            start = max(0.0, peak * frame_rate - half)
        else:
            start = max((peaks[i - 1] + peaks[i]) / 2 * frame_rate,
                        peak * frame_rate - half)
        if i == len(peaks) - 1:
            end = min(max_duration, peak * frame_rate + half)
        else:
            end = min((peaks[i] + peaks[i + 1]) / 2 * frame_rate,
                      peak * frame_rate + half)
        times.append((round(start, 3), round(end, 3)))
    return times
