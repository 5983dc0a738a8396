"""CTC greedy search — fully batched on device.

Parity: asr/wenet/transformer/search.py:106-121 (argmax + pad-mask to blank +
dedup/blank removal). The dedup itself runs on device as a vectorized compare
(no python loop); only the final ragged token extraction is host-side.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from reverb_tpu.decode.results import DecodeResult
from reverb_tpu.utils.common import make_pad_mask


def ctc_greedy_device(ctc_probs, ctc_lens, blank_id: int = 0):
    """Device part: returns (tokens (B,T), keep_mask (B,T), times (B,T)).

    keep_mask marks positions that survive collapse (first frame of each
    non-blank run inside the valid region); times are the frame indices.
    """
    B, T, V = ctc_probs.shape
    top1 = jnp.argmax(ctc_probs, axis=2)                      # (B,T)
    pad = make_pad_mask(ctc_lens, T)
    top1 = jnp.where(pad, blank_id, top1)
    prev = jnp.concatenate(
        [jnp.full((B, 1), -1, dtype=top1.dtype), top1[:, :-1]], axis=1)
    keep = (top1 != blank_id) & (top1 != prev)
    times = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    return top1, keep, times


def ctc_greedy_search(ctc_probs, ctc_lens, blank_id: int = 0
                      ) -> List[DecodeResult]:
    tokens, keep, times = jax.jit(
        ctc_greedy_device, static_argnums=2)(ctc_probs, ctc_lens, blank_id)
    from reverb_tpu.utils.common import fetch_np
    tokens, keep, times = fetch_np(tokens, keep, times)
    results = []
    for b in range(tokens.shape[0]):
        k = keep[b]
        results.append(DecodeResult(tokens=tokens[b][k].tolist(),
                                    times=times[b][k].tolist()))
    return results


def ctc_greedy_from_top1(top1, ctc_lens, blank_id: int = 0
                         ) -> List[DecodeResult]:
    """Greedy results from precomputed per-frame argmax indices (B, T) —
    the k=1 column of the deferred-normalization CTC top-k (api.py
    encode_and_ctc_topk); identical tie order to argmax of the log-probs."""
    def dev(top1, ctc_lens):
        B, T = top1.shape
        pad = make_pad_mask(ctc_lens, T)
        t1 = jnp.where(pad, blank_id, top1)
        prev = jnp.concatenate(
            [jnp.full((B, 1), -1, dtype=t1.dtype), t1[:, :-1]], axis=1)
        keep = (t1 != blank_id) & (t1 != prev)
        times = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
        return t1, keep, times
    tokens, keep, times = jax.jit(dev)(top1, ctc_lens)
    from reverb_tpu.utils.common import fetch_np
    tokens, keep, times = fetch_np(tokens, keep, times)
    results = []
    for b in range(tokens.shape[0]):
        k = keep[b]
        results.append(DecodeResult(tokens=tokens[b][k].tolist(),
                                    times=times[b][k].tolist()))
    return results
