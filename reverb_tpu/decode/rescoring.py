"""Attention rescoring of CTC prefix-beam nbest lists.

Parity: asr/wenet/transformer/search.py:363-448 — rescore each nbest hyp with
the (bi)decoder: score = att + reverse_weight·r_att + ctc_weight·ctc, token
confidences = exp(logp), result carries the CTC times of the winning hyp.

TPU design: the whole nbest of an utterance is ONE batched teacher-forced
decoder pass (already so in the reference); here additionally the per-token
score gathering is vectorized on device and only the final argmax/packaging
is host-side.
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from reverb_tpu.decode.results import DecodeResult
from reverb_tpu.models.asr_model import ModelConfig, forward_attention_decoder


def _bucket(n: int, step: int = 16) -> int:
    """Round up to the next multiple of `step` — bounds the number of
    distinct compiled shapes over a long-form run (each chunk's nbest has a
    different Lmax; without bucketing every new length recompiles)."""
    return max(step, -(-n // step) * step)


@functools.partial(jax.jit, static_argnums=(1, 5))
def _rescore_device(params, cfg: ModelConfig, hyps_pad, hyps_lens, encoder_out,
                    reverse_weight: float, cat_embs=None, enc_len=None):
    """hyps_pad (N,Lmax) WITHOUT sos; hyps_lens true lengths; encoder_out
    (1,T,D) with `enc_len` valid frames (full-T static shape).

    Returns (att_score (N,), r_att_score (N,), token_logp (N,Lmax)).
    """
    N, Lmax = hyps_pad.shape
    sos_col = jnp.full((N, 1), cfg.sos, dtype=hyps_pad.dtype)
    body = jnp.where(jnp.arange(Lmax)[None, :] < hyps_lens[:, None],
                     hyps_pad, cfg.eos)
    hyps_in = jnp.concatenate([sos_col, body], axis=1)        # (N, L+1)
    lens_in = hyps_lens + 1
    l_x, r_x = forward_attention_decoder(params, cfg, hyps_in, lens_in,
                                         encoder_out, reverse_weight, cat_embs,
                                         encoder_lens=enc_len)
    idx = jnp.arange(Lmax)
    valid = idx[None, :] < hyps_lens[:, None]                 # (N,Lmax)
    tok = jnp.where(valid, hyps_pad, 0)
    # forward decoder: position j predicts token j (input was sos-shifted)
    tok_logp = jnp.take_along_axis(l_x[:, :Lmax, :], tok[..., None],
                                   axis=-1)[..., 0]
    tok_logp = jnp.where(valid, tok_logp, 0.0)
    att = jnp.sum(tok_logp, axis=1)
    eos_logp = jnp.take_along_axis(
        l_x, hyps_lens[:, None, None] * jnp.ones((N, 1, 1), jnp.int32),
        axis=1)[:, 0, cfg.eos]
    att = att + eos_logp

    if reverse_weight > 0.0:
        # r_decoder scores the reversed sequence: token j of hyp is at
        # position len-1-j in the reversed stream (search.py:428-433)
        rpos = jnp.where(valid, hyps_lens[:, None] - 1 - idx[None, :], 0)
        r_tok_logp = jnp.take_along_axis(
            jnp.take_along_axis(r_x[:, :Lmax, :], rpos[..., None], axis=1),
            tok[..., None], axis=-1)[..., 0]
        r_tok_logp = jnp.where(valid, r_tok_logp, 0.0)
        r_att = jnp.sum(r_tok_logp, axis=1)
        r_eos = jnp.take_along_axis(
            r_x, hyps_lens[:, None, None] * jnp.ones((N, 1, 1), jnp.int32),
            axis=1)[:, 0, cfg.eos]
        r_att = r_att + r_eos
        tok_logp = jnp.where(valid,
                             jnp.log(jnp.maximum(
                                 (jnp.exp(tok_logp) + jnp.exp(r_tok_logp)) / 2,
                                 1e-30)),
                             0.0)
    else:
        r_att = jnp.zeros_like(att)
    return att, r_att, tok_logp


def score_hyps_with_decoder(params, cfg: ModelConfig, token_paths,
                            encoder_out, encoder_lens, cat_embs=None):
    """Teacher-forced decoder scores for arbitrary token paths (one utt).

    Returns (att (N,), r_att (N,)) numpy arrays — the building block for
    HLG rescoring (asr_model.py:555-595).  Empty paths score 0."""
    N = len(token_paths)
    if N == 0:
        return np.zeros((0,)), np.zeros((0,))
    Lmax = max((len(h) for h in token_paths), default=0)
    if Lmax == 0:
        return np.zeros((N,)), np.zeros((N,))
    hyps_pad = np.zeros((N, Lmax), dtype=np.int32)
    lens = np.zeros((N,), dtype=np.int32)
    for i, h in enumerate(token_paths):
        hyps_pad[i, :len(h)] = h
        lens[i] = len(h)
    Lb = _bucket(Lmax)
    if Lb != Lmax:
        hyps_pad = np.pad(hyps_pad, ((0, 0), (0, Lb - Lmax)))
    enc = jnp.asarray(np.asarray(encoder_out)[0:1])        # full T, static
    rw = 1.0 if cfg.decoder.r_num_blocks > 0 else 0.0
    att, r_att, _ = _rescore_device(
        params, cfg, jnp.asarray(hyps_pad), jnp.asarray(lens), enc, rw,
        jnp.asarray(cat_embs) if cat_embs is not None else None,
        jnp.asarray(int(encoder_lens[0]), jnp.int32))
    return np.asarray(att), np.asarray(r_att)


def attention_rescoring(params, cfg: ModelConfig,
                        ctc_prefix_results: List[DecodeResult],
                        encoder_outs, encoder_lens,
                        ctc_weight: float = 0.0,
                        reverse_weight: float = 0.0,
                        cat_embs=None) -> List[DecodeResult]:
    """Rescore each utterance's nbest with the attention decoder."""
    encoder_outs = np.asarray(encoder_outs)
    encoder_lens = np.asarray(encoder_lens)
    results = []
    for b, pre in enumerate(ctc_prefix_results):
        hyps = pre.nbest
        ctc_scores = pre.nbest_scores
        N = len(hyps)
        Lmax = max((len(h) for h in hyps), default=0)
        if Lmax == 0:
            results.append(DecodeResult(tokens=[], times=[],
                                        tokens_confidence=[]))
            continue
        Lb = _bucket(Lmax)   # static-shape bucket: bounded compile count
        hyps_pad = np.zeros((N, Lb), dtype=np.int32)
        lens = np.zeros((N,), dtype=np.int32)
        for i, h in enumerate(hyps):
            hyps_pad[i, :len(h)] = h
            lens[i] = len(h)
        enc = jnp.asarray(encoder_outs[b:b + 1])            # full T, static
        att, r_att, tok_logp = _rescore_device(
            params, cfg, jnp.asarray(hyps_pad), jnp.asarray(lens), enc,
            reverse_weight,
            jnp.asarray(cat_embs) if cat_embs is not None else None,
            jnp.asarray(int(encoder_lens[b]), jnp.int32))
        att = np.asarray(att)
        r_att = np.asarray(r_att)
        tok_logp = np.asarray(tok_logp)
        score = att * (1 - reverse_weight) + r_att * reverse_weight if \
            reverse_weight > 0 else att
        confidences = np.exp(score / (lens + 1))
        total = score + np.asarray(ctc_scores) * ctc_weight
        best = int(np.argmax(total))
        tc = [math.exp(float(x)) for x in tok_logp[best, :lens[best]]]
        results.append(DecodeResult(
            tokens=hyps[best], score=float(total[best]),
            confidence=float(confidences[best]),
            times=pre.nbest_times[best], tokens_confidence=tc))
    return results
