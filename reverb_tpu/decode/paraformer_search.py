"""Paraformer NAR decode: greedy / batch beam over the one-pass decoder
output, CIF-peak timestamps, and result beautify.

Parity: asr/wenet/paraformer/search.py —
  - paraformer_greedy_search (:138-176): per-position top-1 with token
    confidences and frame times read off the tp CIF peaks
  - paraformer_beam_search / _batch_beam_search (:179-260): beam over the
    position-wise distributions, reproducing the reference's exact finished
    masking (scores 0/-inf via mask_finished_scores, preds → eos) and its
    no-backpointer index emission + final fmod(vocab)
  - gen_timestamps_from_peak (:113-135): peak frames → [start, end] seconds
  - paraformer_beautify_result (:57-110): Chinese/alpha/mixed spacing and
    '@@' BPE joining

TPU design: argmax/top-k and the beam scan run on device (one program per
shape); only the small (B,U) winners are fetched for host packaging.
"""

from __future__ import annotations

import functools
import math
from typing import Any, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from reverb_tpu.decode.results import DecodeResult

# ------------------------------ text beautify ------------------------------


def _is_chinese(ch: str) -> bool:
    # search.py:10-13 — NOTE: applied to the WHOLE token string
    # (lexicographic compare), and counts digits and '@' as "chinese"
    return ('一' <= ch <= '鿿' or '0' <= ch <= '9'
            or ch == '@')


def _clean_tokens(word: Union[List[Any], str]) -> List[str]:
    word_lists = []
    for i in word:
        cur = i.replace(' ', '')
        cur = cur.replace('</s>', '')
        cur = cur.replace('<s>', '')
        cur = cur.replace('<unk>', '')
        cur = cur.replace('<OOV>', '')
        word_lists.append(cur)
    return word_lists


def _is_all_chinese(word: Union[List[Any], str]) -> bool:
    # search.py:16-32
    word_lists = _clean_tokens(word)
    if len(word_lists) == 0:
        return False
    for ch in word_lists:
        if _is_chinese(ch) is False:
            return False
    return True


def _is_all_alpha(word: Union[List[Any], str]) -> bool:
    # search.py:35-54
    word_lists = _clean_tokens(word)
    if len(word_lists) == 0:
        return False
    for ch in word_lists:
        if ch.isalpha() is False and ch != "'":
            return False
        elif ch.isalpha() is True and _is_chinese(ch) is True:
            return False
    return True


def paraformer_beautify_result(tokens: List[str]) -> str:
    """search.py:57-110 — join tokens with language-aware spacing."""
    middle_lists = []
    word_lists = []
    word_item = ''

    for token in tokens:
        if token in ['<sos>', '<eos>', '<blank>']:
            continue
        middle_lists.append(token)

    if _is_all_chinese(middle_lists):
        for ch in middle_lists:
            word_lists.append(ch.replace(' ', ''))
    elif _is_all_alpha(middle_lists):
        for ch in middle_lists:
            if '@@' in ch:
                word_item += ch.replace('@@', '')
            else:
                word_item += ch
                word_lists.append(word_item)
                word_lists.append(' ')
                word_item = ''
    else:
        alpha_blank = False
        for ch in middle_lists:
            if _is_all_chinese(ch):
                if alpha_blank is True:
                    word_lists.pop()
                word_lists.append(ch)
                alpha_blank = False
            elif '@@' in ch:
                word_item += ch.replace('@@', '')
                alpha_blank = False
            elif _is_all_alpha(ch):
                word_item += ch
                word_lists.append(word_item)
                word_lists.append(' ')
                word_item = ''
                alpha_blank = True
            else:
                word_lists.append(ch)
                alpha_blank = False
    return ''.join(word_lists).strip()


# ------------------------------ timestamps ------------------------------


def gen_timestamps_from_peak(cif_peaks: List[float], num_frames: int,
                             frame_rate: float = 0.02) -> List[List[float]]:
    """search.py:113-135 — fire frames → per-token [start, end] seconds."""
    START_END_THRESHOLD = 5
    MAX_TOKEN_DURATION = 14
    force_time_shift = -0.5
    fire_place = [peak + force_time_shift for peak in cif_peaks]
    times = []
    for i in range(len(fire_place) - 1):
        if MAX_TOKEN_DURATION < 0 or \
                fire_place[i + 1] - fire_place[i] <= MAX_TOKEN_DURATION:
            times.append([fire_place[i] * frame_rate,
                          fire_place[i + 1] * frame_rate])
        else:
            split = fire_place[i] + MAX_TOKEN_DURATION
            times.append([fire_place[i] * frame_rate, split * frame_rate])
    if num_frames - fire_place[-1] > START_END_THRESHOLD:
        end = (num_frames + fire_place[-1]) * 0.5
        times[-1][1] = end * frame_rate
        times.append([end * frame_rate, num_frames * frame_rate])
    else:
        times[-1][1] = num_frames * frame_rate
    return times


# ------------------------------ greedy ------------------------------


def paraformer_greedy_search(decoder_out, decoder_out_lens,
                             cif_peaks=None) -> List[DecodeResult]:
    """search.py:138-176 — per-position top-1; times = frame indices whose
    tp CIF peak crosses 1−1e-4 (one frame per fired token)."""
    lp = np.asarray(decoder_out, np.float32)
    lens = np.asarray(decoder_out_lens).astype(np.int64)
    topk_index = lp.argmax(-1)
    topk_prob = np.take_along_axis(lp, topk_index[..., None], axis=-1)[..., 0]
    results: List[DecodeResult] = []
    for b in range(lp.shape[0]):
        n = int(lens[b])
        hyp = topk_index[b, :n].tolist()
        tokens_confidence = [math.exp(float(x)) for x in topk_prob[b, :n]]
        confidence = float(np.sum(topk_prob[b, :n], dtype=np.float64))
        results.append(DecodeResult(
            tokens=hyp, tokens_confidence=tokens_confidence,
            confidence=math.exp(confidence / n) if n > 0 else 0.0))
    if cif_peaks is not None:
        peaks = np.asarray(cif_peaks)
        for b in range(peaks.shape[0]):
            result = results[b]
            times = []
            n_token = 0
            for i, peak in enumerate(peaks[b]):
                if n_token >= len(result.tokens):
                    break
                if peak > 1 - 1e-4:
                    times.append(i)
                    n_token += 1
            result.times = times
            assert len(result.times) == len(result.tokens), (
                len(result.times), len(result.tokens))
    return results


# ------------------------------ beam ------------------------------


def _mask_finished_scores(score, flag):
    """utils/mask.py:257-284 over the last dim: finished rows keep column 0
    at 0 and everything else at -inf."""
    k = score.shape[-1]
    first_col = (jnp.arange(k) == 0)[None, :]
    finished = flag & first_col
    unfinished = flag & ~first_col
    score = jnp.where(unfinished, -jnp.inf, score)
    return jnp.where(finished, 0.0, score)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _batch_beam_search_device(log_post, masks_pad, beam_size: int, eos: int):
    """search.py:199-260 `_batch_beam_search`, one lax.scan.

    log_post: (B, T, V) position-wise log-probs; masks_pad: (B, T) True on
    PADDED positions (the reference's inverted mask).  Returns
    (indices (B, K, T) int32, log_prob (B, K)) — including the reference's
    quirks: per-step indices are emitted without beam-history reordering,
    finished rows emit `eos` in place of the flattened k·V index, and the
    final ids are `fmod(vocab)`."""
    B, T, V = log_post.shape
    K = beam_size

    log_prob, indices0 = jax.lax.top_k(log_post[:, 0, :], K)      # (B,K)
    end_flag = masks_pad[:, 0:1]                                   # (B,1)
    log_prob = _mask_finished_scores(log_prob, end_flag)
    indices0 = jnp.where(end_flag, eos, indices0)

    def step(carry, t):
        log_prob, end_flag = carry
        scores = _mask_finished_scores(
            jnp.take(log_post, t, axis=1), end_flag)                 # (B,V)
        top_k_logp = log_prob[:, :, None] + scores[:, None, :]       # (B,K,V)
        log_prob, top_k_index = jax.lax.top_k(
            top_k_logp.reshape(B, K * V), K)
        index = jnp.where(end_flag, eos, top_k_index)                # (B,K)
        end_flag = jnp.take(masks_pad, t, axis=1)[:, None]
        return (log_prob, end_flag), index

    (log_prob, _), idx_rest = jax.lax.scan(
        step, (log_prob, end_flag), jnp.arange(1, T))
    indices = jnp.concatenate(
        [indices0[None], idx_rest], axis=0).transpose(1, 2, 0)       # (B,K,T)
    return jnp.mod(indices, V).astype(jnp.int32), log_prob


def paraformer_beam_search(decoder_out, decoder_out_lens,
                           beam_size: int = 10,
                           eos: int = -1) -> List[DecodeResult]:
    """search.py:179-196 — top beam per utterance, truncated to its length."""
    lens = jnp.asarray(decoder_out_lens, jnp.int32)
    T = decoder_out.shape[1]
    masks_pad = jnp.arange(T)[None, :] >= lens[:, None]          # (B,T)
    log_post = jax.nn.log_softmax(
        jnp.asarray(decoder_out, jnp.float32), axis=-1)
    indices, _ = _batch_beam_search_device(log_post, masks_pad, beam_size,
                                           eos)
    best_hyps = np.asarray(indices[:, 0, :])
    lens_np = np.asarray(lens)
    return [DecodeResult(best_hyps[b, :int(lens_np[b])].tolist())
            for b in range(best_hyps.shape[0])]
