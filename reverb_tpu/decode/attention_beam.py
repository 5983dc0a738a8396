"""Batched attention (decoder-only) beam search, fully on device.

Parity: asr/wenet/transformer/search.py:251-360 — beam over the decoder's
incremental forward with cache reindexing, finished-hypothesis masking, and
length-penalty final selection.

TPU design: the reference's per-step python loop with dynamic early-break
becomes a `lax.scan` over a static number of steps; finished beams are frozen
by score masking (identical math — ended rows contribute score 0 for their
first candidate and -inf for the rest, predictions forced to eos).  The
decoder activation cache is a static (n_layers, B·N, Lmax, D) buffer.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from reverb_tpu.decode.results import DecodeResult
from reverb_tpu.models.asr_model import ModelConfig
from reverb_tpu.models.decoder import decoder_forward_one_step

NEG_INF = jnp.float32(-1e30)


@functools.partial(jax.jit, static_argnums=(1, 4, 5))
def attention_beam_search_device(params, cfg: ModelConfig, encoder_out,
                                 encoder_lens, beam_size: int, max_steps: int,
                                 cat_embs=None, length_penalty: float = 0.0):
    """encoder_out (B,T,D), encoder_lens (B,). Returns (hyps (B,L), lens (B,),
    scores (B,))."""
    B, T, D = encoder_out.shape
    N = beam_size
    Lmax = max_steps + 1
    run = B * N

    enc = jnp.repeat(encoder_out, N, axis=0)                     # (B*N,T,D)
    enc_mask = (jnp.arange(T)[None, :] <
                jnp.repeat(encoder_lens, N)[:, None])[:, None, :]
    dec_cat = None
    if cat_embs is not None and cfg.lsl_dec:
        dec_cat = (jnp.broadcast_to(cat_embs, (run,) + cat_embs.shape)
                   if cat_embs.ndim == 1 else jnp.repeat(cat_embs, N, axis=0))

    buf = jnp.full((run, Lmax), cfg.eos, dtype=jnp.int32)
    buf = buf.at[:, 0].set(cfg.sos)
    scores = jnp.tile(jnp.array([0.0] + [float(NEG_INF)] * (N - 1),
                                jnp.float32), B)                 # (B*N,)
    end_flag = jnp.zeros((run,), bool)
    n_layers = cfg.decoder.num_blocks
    cache = jnp.zeros((n_layers, run, Lmax, D), dtype=encoder_out.dtype)

    def step(carry, i):
        buf, scores, end_flag, cache = carry
        logp, cache = decoder_forward_one_step(
            params['decoder'], enc, enc_mask, buf, i, cache, cfg.decoder,
            cat_embs=dec_cat)                                    # (B*N,V)
        top_logp, top_idx = jax.lax.top_k(logp, N)               # (B*N,N)
        # finished rows: first candidate score 0, rest -inf; preds → eos
        first = jnp.arange(N)[None, :] == 0
        top_logp = jnp.where(end_flag[:, None],
                             jnp.where(first, 0.0, NEG_INF), top_logp)
        top_idx = jnp.where(end_flag[:, None], cfg.eos, top_idx)

        cand = (scores[:, None] + top_logp).reshape(B, N * N)
        new_scores, off = jax.lax.top_k(cand, N)                 # (B,N)
        src_beam = off // N                                      # origin beam
        src_row = (src_beam + jnp.arange(B)[:, None] * N).reshape(-1)
        pred = jnp.take_along_axis(
            top_idx.reshape(B, N * N), off, axis=1).reshape(-1)

        buf = buf[src_row]
        buf = buf.at[:, i + 1].set(pred)
        cache = cache[:, src_row]
        end_flag = pred == cfg.eos
        return (buf, new_scores.reshape(-1), end_flag, cache), None

    (buf, scores, end_flag, cache), _ = jax.lax.scan(
        step, (buf, scores, end_flag, cache), jnp.arange(max_steps))

    scores = scores.reshape(B, N)
    lengths = jnp.sum(buf != cfg.eos, axis=1).reshape(B, N).astype(jnp.float32)
    # pow(len, 0) == 1 → plain scores when no penalty (search.py:346-348)
    final = scores / jnp.power(jnp.maximum(lengths, 1.0), length_penalty)
    best = jnp.argmax(final, axis=1)
    best_row = best + jnp.arange(B) * N
    best_hyps = buf[best_row][:, 1:]                             # drop sos
    best_scores = jnp.take_along_axis(final, best[:, None], axis=1)[:, 0]
    return best_hyps, best_scores


def attention_beam_search(params, cfg: ModelConfig, encoder_out, encoder_lens,
                          beam_size: int = 10, length_penalty: float = 0.0,
                          cat_embs=None, max_steps: int = 0
                          ) -> List[DecodeResult]:
    T = encoder_out.shape[1]
    max_steps = max_steps or min(T, 446)
    hyps, scores = attention_beam_search_device(
        params, cfg, encoder_out, encoder_lens, beam_size, max_steps,
        cat_embs, length_penalty)
    from reverb_tpu.utils.common import fetch_np
    hyps, scores = fetch_np(hyps, scores)
    results = []
    for b in range(hyps.shape[0]):
        toks = [int(t) for t in hyps[b] if int(t) != cfg.eos]
        results.append(DecodeResult(tokens=toks, score=float(scores[b])))
    return results
