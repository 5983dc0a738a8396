"""ONMT-style attention decoding with GNMT global scoring, on device.

Parity targets:
  - asr/wenet/onmt_translate/beam_search.py (BeamSearch.advance/update_finished)
  - asr/wenet/onmt_translate/penalties.py (PenaltyBuilder: length 'avg'/'wu',
    coverage 'wu'/'summary')
  - asr/wenet/transformer/asr_model.py:980-1071 (onmt_attention_decoding:
    alpha=1, beta=0, length_penalty='avg', coverage_penalty='none' defaults;
    cross-attention averaged over layers and heads feeds the coverage term).

TPU design: the reference's dynamic beam (finished hypotheses removed from
the alive set, python-side reordering) becomes a `lax.scan` with frozen
finished rows.  Each row records the step at which it emitted EOS, so the
final GNMT score normalizes every hypothesis at *its own* finish length —
the behavior ONMT gets by scoring at update_finished time.  Coverage is the
running sum of per-step cross-attention (mean over layers/heads), frozen on
finish, exactly the tensor ONMT accumulates via `self.alive_attn`.

Within a decode step all candidates share the same length, so ONMT's
stepwise `curr_scores = cum / length_penalty(step)` ranking is equivalent to
ranking by the raw cumulative log-prob; the normalization only reorders
hypotheses *across* lengths, which the final scoring here reproduces.
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


def gnmt_length_penalty(length, alpha: float, kind: str):
    """penalties.py:92-105. length may be a traced array."""
    length = jnp.asarray(length, jnp.float32)
    if kind == 'avg':
        return jnp.power(jnp.maximum(length, 1.0), alpha)
    if kind == 'wu':
        return jnp.power((5.0 + length) / 6.0, alpha)
    if kind in (None, 'none'):
        return jnp.ones_like(length)
    raise ValueError(f'unknown length penalty {kind!r}')


def gnmt_coverage_penalty(cov, beta: float, kind: str):
    """penalties.py:64-90. cov: (..., T) accumulated attention mass."""
    if kind in (None, 'none') or beta == 0.0:
        return jnp.zeros(cov.shape[:-1], jnp.float32)
    if kind == 'wu':
        pen = -jnp.sum(jnp.log(jnp.minimum(cov, 1.0) + 1e-20), axis=-1)
    elif kind == 'summary':
        pen = jnp.sum(jnp.maximum(cov, 1.0), axis=-1) - cov.shape[-1]
    else:
        raise ValueError(f'unknown coverage penalty {kind!r}')
    return beta * pen


@functools.partial(jax.jit, static_argnums=(1, 4, 5, 8, 9, 10, 11))
def onmt_beam_search_device(params, cfg: ModelConfig, encoder_out,
                            encoder_lens, beam_size: int, max_steps: int,
                            cat_embs=None, alpha: float = 1.0,
                            beta: float = 0.0,
                            length_penalty: str = 'avg',
                            coverage_penalty: str = 'none',
                            track_attn: bool = False):
    """Returns (hyps (B,Lmax), scores (B,)) — best hyp per utterance under
    the GNMT global score."""
    B, T, D = encoder_out.shape
    N = beam_size
    Lmax = max_steps + 1
    run = B * N
    need_attn = track_attn or (coverage_penalty not in (None, 'none')
                               and beta != 0.0)

    enc = jnp.repeat(encoder_out, N, axis=0)
    enc_mask = (jnp.arange(T)[None, :] <
                jnp.repeat(encoder_lens, N)[:, None])[:, None, :]
    dec_cat = None
    if cfg.lsl_dec:
        # asr_model.py:1026-1031: LSL decoder defaults to verbatim [1,0]
        ce = cat_embs if cat_embs is not None else jnp.array([1.0, 0.0])
        dec_cat = (jnp.broadcast_to(ce, (run,) + ce.shape)
                   if ce.ndim == 1 else jnp.repeat(ce, N, axis=0))

    buf = jnp.full((run, Lmax), cfg.eos, dtype=jnp.int32)
    buf = buf.at[:, 0].set(cfg.sos)
    scores = jnp.tile(jnp.array([0.0] + [float(NEG_INF)] * (N - 1),
                                jnp.float32), B)
    end_flag = jnp.zeros((run,), bool)
    fin_len = jnp.full((run,), max_steps, jnp.int32)  # tokens incl. eos
    cov = jnp.zeros((run, T), jnp.float32)
    cache = jnp.zeros((cfg.decoder.num_blocks, run, Lmax, D),
                      dtype=encoder_out.dtype)

    def step(carry, i):
        buf, scores, end_flag, fin_len, cov, cache = carry
        if need_attn:
            logp, cache, attn = decoder_forward_one_step(
                params['decoder'], enc, enc_mask, buf, i, cache, cfg.decoder,
                cat_embs=dec_cat, return_src_attn=True)
        else:
            logp, cache = decoder_forward_one_step(
                params['decoder'], enc, enc_mask, buf, i, cache, cfg.decoder,
                cat_embs=dec_cat)
            attn = None
        top_logp, top_idx = jax.lax.top_k(logp, N)
        first = jnp.arange(N)[None, :] == 0
        top_logp = jnp.where(end_flag[:, None],
                             jnp.where(first, 0.0, NEG_INF), top_logp)
        top_idx = jnp.where(end_flag[:, None], cfg.eos, top_idx)

        cand = (scores[:, None] + top_logp).reshape(B, N * N)
        new_scores, off = jax.lax.top_k(cand, N)
        src_beam = off // N
        src_row = (src_beam + jnp.arange(B)[:, None] * N).reshape(-1)
        pred = jnp.take_along_axis(
            top_idx.reshape(B, N * N), off, axis=1).reshape(-1)

        buf = buf[src_row]
        buf = buf.at[:, i + 1].set(pred)
        cache = cache[:, src_row]
        was_ended = end_flag[src_row]
        if attn is not None:
            # coverage accumulates only while the hypothesis is alive
            cov = cov[src_row] + jnp.where(was_ended[:, None], 0.0,
                                           attn[src_row])
        new_end = pred == cfg.eos
        # record finish length (generated tokens incl. eos) on first EOS
        fin_len = jnp.where(~was_ended & new_end, i + 1, fin_len[src_row])
        return (buf, new_scores.reshape(-1), new_end, fin_len, cov,
                cache), None

    (buf, scores, end_flag, fin_len, cov, cache), _ = jax.lax.scan(
        step, (buf, scores, end_flag, fin_len, cov, cache),
        jnp.arange(max_steps))

    lp = gnmt_length_penalty(fin_len, alpha, length_penalty)
    cp = gnmt_coverage_penalty(cov, beta, coverage_penalty)
    final = scores / lp - cp
    final = final.reshape(B, N)
    best = jnp.argmax(final, axis=1)
    best_row = best + jnp.arange(B) * N
    best_hyps = buf[best_row][:, 1:]
    best_scores = jnp.take_along_axis(final, best[:, None], axis=1)[:, 0]
    return best_hyps, best_scores


def onmt_attention_decoding(params, cfg: ModelConfig, encoder_out,
                            encoder_lens, beam_size: int = 5,
                            cat_embs=None, alpha: float = 1.0,
                            beta: float = 0.0,
                            length_penalty: str = 'avg',
                            coverage_penalty: str = 'none',
                            max_steps: int = 0) -> List[DecodeResult]:
    """asr_model.onmt_attention_decoding: max_length = encoder T."""
    T = encoder_out.shape[1]
    max_steps = max_steps or min(T, 446)
    hyps, scores = onmt_beam_search_device(
        params, cfg, encoder_out, encoder_lens, beam_size, max_steps,
        cat_embs, alpha, beta, length_penalty, coverage_penalty)
    hyps = np.asarray(hyps)
    scores = np.asarray(scores)
    out = []
    for b in range(hyps.shape[0]):
        toks = [int(t) for t in hyps[b] if int(t) != cfg.eos]
        out.append(DecodeResult(tokens=toks, score=float(scores[b])))
    return out
