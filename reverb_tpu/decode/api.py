"""Decode orchestration: one encoder pass feeding all requested decode modes.

Parity: asr/wenet/transformer/asr_model.py:331-432 (`ASRModel.decode`) — runs
the encoder once, derives CTC log-probs (with optional blank penalty), then
dispatches to the requested search methods.  attention_rescoring reuses the
ctc_prefix_beam_search nbest when both are requested.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from reverb_tpu.decode.attention_beam import attention_beam_search
from reverb_tpu.decode.greedy import ctc_greedy_search
from reverb_tpu.decode.prefix_beam import (ctc_prefix_beam_search_raw,
                                            ctc_prefix_beam_search_topk_raw)
from reverb_tpu.decode.rescoring import attention_rescoring
from reverb_tpu.decode.results import DecodeResult
from reverb_tpu.models import ctc as ctc_mod
from reverb_tpu.models.asr_model import ModelConfig, forward_encoder

ALL_MODES = ('attention', 'ctc_greedy_search', 'ctc_prefix_beam_search',
             'attention_rescoring', 'joint_decoding',
             'onmt_attention_decoding', 'hlg_onebest', 'hlg_rescore')


@functools.partial(jax.jit, static_argnums=(1, 5, 6))
def encode_and_ctc(params, cfg: ModelConfig, feats, feats_lens, cat_embs,
                   blank_penalty: float = 0.0,
                   decoding_chunk_size: int = -1):
    """Single jitted program: encoder forward + CTC log-probs."""
    enc_cat = cat_embs if cfg.lsl_enc else None
    encoder_out, encoder_mask = forward_encoder(
        params, cfg, feats, feats_lens, cat_embs=enc_cat,
        decoding_chunk_size=decoding_chunk_size)
    encoder_lens = jnp.sum(encoder_mask[:, 0, :], axis=-1).astype(jnp.int32)
    ctc_probs = ctc_mod.ctc_logprobs(params['ctc'], encoder_out,
                                     blank_penalty, cfg.blank_id)
    return encoder_out, encoder_lens, ctc_probs


@functools.partial(jax.jit, static_argnums=(1, 5, 6, 7))
def encode_and_ctc_topk(params, cfg: ModelConfig, feats, feats_lens,
                        cat_embs, k: int, blank_penalty: float = 0.0,
                        decoding_chunk_size: int = -1):
    """Encoder + per-frame CTC top-k (deferred normalization).

    The (B,T,V) f32 log-prob table is never materialized — only each frame's
    k winners + p(blank) are normalized (models/ctc.py ctc_topk_logprobs).
    This is the serving path for greedy / prefix-beam / rescoring mode sets.
    """
    enc_cat = cat_embs if cfg.lsl_enc else None
    encoder_out, encoder_mask = forward_encoder(
        params, cfg, feats, feats_lens, cat_embs=enc_cat,
        decoding_chunk_size=decoding_chunk_size)
    encoder_lens = jnp.sum(encoder_mask[:, 0, :], axis=-1).astype(jnp.int32)
    topk_logp, topk_idx, blank_logp = ctc_mod.ctc_topk_logprobs(
        params['ctc'], encoder_out, k, blank_penalty, cfg.blank_id)
    return encoder_out, encoder_lens, topk_logp, topk_idx, blank_logp


def _beam_rescore_tail(params, cfg: ModelConfig, tk_logp, tk_idx, blank_lp,
                       encoder_out, encoder_lens, beam_size: int, ctc_weight,
                       reverse_weight: float, blank_skip_threshold: float,
                       max_hyp_len: int, cat_embs, ctx_tables):
    """Traced tail shared by both fused programs: blank-skip prefix beam →
    device-side length-bucketed whole-batch attention rescoring, nbest
    wired beam→rescorer on device."""
    from reverb_tpu.decode import prefix_beam as pb
    from reverb_tpu.decode import rescoring as rs
    keep_cap = (tk_logp.shape[1] // 2) if blank_skip_threshold > 0 else 0
    prefixes, plens, ctc_scores, times = \
        pb.ctc_prefix_beam_search_device_topk.__wrapped__(
            tk_logp, tk_idx, blank_lp, encoder_lens, beam_size, cfg.blank_id,
            max_hyp_len, blank_skip_threshold, keep_cap, ctx_tables)
    # the beam may emit a narrower prefix buffer than max_hyp_len (the scan
    # length bounds the prefix length under blank-skip)
    cap_L = prefixes.shape[2]
    lens_c = jnp.minimum(plens, cap_L).astype(jnp.int32)
    # device-side length bucketing: the rescorer's cost is proportional to
    # the PADDED hyp length, and real nbests are far shorter than the static
    # max_hyp_len cap.  lax.switch compiles one branch per bucket and runs
    # only the smallest bucket that fits this batch's longest hyp — single
    # dispatch, bucketed compute.
    buckets = [b for b in (32, 64, 128) if b < cap_L] + [cap_L]
    lmax = jnp.max(lens_c)
    branch_idx = sum((lmax > b).astype(jnp.int32) for b in buckets[:-1])

    def _branch(Lb):
        def br(_):
            att, r_att, tl = rs._rescore_device_all.__wrapped__(
                params, cfg, prefixes[:, :, :Lb], lens_c, encoder_out,
                reverse_weight, cat_embs, encoder_lens)
            pad = [(0, 0), (0, 0), (0, cap_L - Lb)]
            return att, r_att, jnp.pad(tl, pad)
        return br

    att, r_att, tok_logp = jax.lax.switch(
        branch_idx, [_branch(b) for b in buckets], 0)
    if reverse_weight > 0:
        score = att * (1 - reverse_weight) + r_att * reverse_weight
    else:
        score = att
    confidence = jnp.exp(score / (lens_c + 1).astype(jnp.float32))
    valid_row = ctc_scores > pb.NEG_INF / 2
    total = jnp.where(valid_row, score + ctc_scores * ctc_weight, -jnp.inf)
    best = jnp.argmax(total, axis=1).astype(jnp.int32)            # (B,)

    def take(x):
        idx = best[:, None] if x.ndim == 2 else best[:, None, None]
        return jnp.take_along_axis(x, idx, axis=1)[:, 0]
    return (prefixes, plens, ctc_scores, times, best, take(total),
            take(confidence), take(tok_logp), take(times))


@functools.partial(jax.jit, static_argnums=(1, 4, 6, 7, 8, 9, 10))
def _fused_rescoring_program(params, cfg: ModelConfig, feats, feats_lens,
                             beam_size: int, ctc_weight,
                             reverse_weight: float,
                             blank_skip_threshold: float, max_hyp_len: int,
                             decoding_chunk_size: int, blank_penalty,
                             cat_embs=None, ctx_tables=None):
    """ONE device program for the flagship serving mode set: encoder → CTC
    top-k → blank-skip prefix beam → whole-batch attention rescoring, with
    the nbest wired beam→rescorer on device.

    The unfused path costs three host round-trips per batch (encoder/beam
    fetch, host nbest packing, rescore dispatch+fetch); dispatch latency
    dominated the measured serving time (see PARITY.md).  Returns both the
    full beam outputs (for the ctc_prefix_beam_search mode) and the
    rescoring winners — one host fetch for everything."""
    enc_cat = cat_embs if cfg.lsl_enc else None
    encoder_out, encoder_mask = forward_encoder(
        params, cfg, feats, feats_lens, cat_embs=enc_cat,
        decoding_chunk_size=decoding_chunk_size)
    encoder_lens = jnp.sum(encoder_mask[:, 0, :], axis=-1).astype(jnp.int32)
    tk_logp, tk_idx, blank_lp = ctc_mod.ctc_topk_logprobs(
        params['ctc'], encoder_out, beam_size, blank_penalty, cfg.blank_id)
    return _beam_rescore_tail(params, cfg, tk_logp, tk_idx, blank_lp,
                              encoder_out, encoder_lens, beam_size,
                              ctc_weight, reverse_weight,
                              blank_skip_threshold, max_hyp_len, cat_embs,
                              ctx_tables)


@functools.partial(jax.jit, static_argnums=(1, 6, 8, 9, 10))
def _fused_post_program(params, cfg: ModelConfig, tk_logp, tk_idx, blank_lp,
                        encoder_out, beam_size: int, ctc_weight,
                        reverse_weight: float, blank_skip_threshold: float,
                        max_hyp_len: int, encoder_lens=None, cat_embs=None,
                        ctx_tables=None):
    """Beam + rescoring as ONE program fed by `encode_and_ctc_topk`'s
    outputs (fused='post').  Keeps the encoder its own program (XLA
    schedules it better standalone — the full fusion measured ~13% slower)
    while removing the pack-before-rescore serialization of the unfused
    path: the rescorer no longer waits for the host to fetch the beam
    buffers and choose a bucket (~2 tunnel round trips ≈ 50-90 ms of the
    measured 500 ms blocking path), and both modes arrive in one fetch
    wave."""
    return _beam_rescore_tail(params, cfg, tk_logp, tk_idx, blank_lp,
                              encoder_out, encoder_lens, beam_size,
                              ctc_weight, reverse_weight,
                              blank_skip_threshold, max_hyp_len, cat_embs,
                              ctx_tables)


def _decode_fused(params, cfg: ModelConfig, methods, feats, feats_lens,
                  beam_size, ctc_weight, reverse_weight,
                  blank_skip_threshold, max_hyp_len, decoding_chunk_size,
                  blank_penalty, cat, ctx_tables, post_only: bool = False):
    """Host wrapper over the fused programs: one (or two, post_only) device
    dispatches, one fetch wave, pack both modes."""
    import math as _math

    import numpy as np

    from reverb_tpu.decode import prefix_beam as pb
    if post_only:
        # encoder stays its own program; beam+rescore fuse (fused='post')
        encoder_out, encoder_lens, tk_logp, tk_idx, blank_lp = \
            encode_and_ctc_topk(
                params, cfg, jnp.asarray(feats), jnp.asarray(feats_lens),
                cat, beam_size, blank_penalty, decoding_chunk_size)
        out = _fused_post_program(
            params, cfg, tk_logp, tk_idx, blank_lp, encoder_out, beam_size,
            jnp.asarray(ctc_weight, jnp.float32), reverse_weight,
            blank_skip_threshold, max_hyp_len, encoder_lens, cat,
            ctx_tables)
    else:
        out = _fused_rescoring_program(
            params, cfg, jnp.asarray(feats), jnp.asarray(feats_lens),
            beam_size, jnp.asarray(ctc_weight, jnp.float32), reverse_weight,
            blank_skip_threshold, max_hyp_len, decoding_chunk_size,
            blank_penalty, cat, ctx_tables)
    from reverb_tpu.utils.common import fetch_np
    (prefixes, plens, ctc_scores, times, best, total, conf, tok_logp,
     best_times) = fetch_np(*out)
    if plens.max(initial=0) > max_hyp_len:
        return None          # hyp overflowed the static cap — caller falls back
    results: Dict[str, List[DecodeResult]] = {}
    if 'ctc_prefix_beam_search' in methods:
        results['ctc_prefix_beam_search'] = pb._pack_results(
            prefixes, plens, ctc_scores, times)
    resc = []
    B, K, L = prefixes.shape
    for b in range(B):
        k = int(best[b])
        n = int(plens[b, k])
        if not np.isfinite(total[b]) or plens[b].max() == 0:
            resc.append(DecodeResult(tokens=[], times=[],
                                     tokens_confidence=[]))
            continue
        resc.append(DecodeResult(
            tokens=prefixes[b, k, :n].tolist(), score=float(total[b]),
            confidence=float(conf[b]), times=best_times[b, :n].tolist(),
            tokens_confidence=[_math.exp(float(x))
                               for x in tok_logp[b, :n]]))
    results['attention_rescoring'] = resc
    return results


def decode(params, cfg: ModelConfig, methods: List[str], feats, feats_lens,
           beam_size: int = 10,
           decoding_chunk_size: int = -1,
           num_decoding_left_chunks: int = -1,
           ctc_weight: float = 0.0,
           reverse_weight: float = 0.0,
           blank_penalty: float = 0.0,
           length_penalty: float = 0.0,
           cat_embs=None,
           context_graph=None,
           blank_skip_threshold: float = 0.0,
           max_hyp_len: int = 256,
           fused='post',
           hlg_graph=None,
           hlg_lm_scale: float = 0.0,
           hlg_decoder_scale: float = 0.0,
           hlg_r_decoder_scale: float = 0.0) -> Dict[str, List[DecodeResult]]:
    """Decode a batch of feature chunks with the requested methods.

    fused=True routes the flagship mode set (methods ⊆
    {ctc_prefix_beam_search, attention_rescoring}) through ONE device
    program with the nbest wired beam→rescorer on device; fused='post'
    keeps the encoder its own program and fuses only beam+rescoring
    (removes the pack-before-rescore host serialization while letting XLA
    schedule the encoder standalone); max_hyp_len bounds the per-hyp token
    buffer (overflow falls back to the generic path).  fused='post' is the
    DEFAULT: measured 1721x vs 1644x unfused on v5e (+4.7%, and min/median
    run spread tightens 93%→98% — the unfused path serializes a ~65-97 ms
    host fetch between beam and rescore).  fused=True (encoder fused in
    too) measured ~10-15% SLOWER than multi-dispatch on v5e (PARITY.md),
    kept for dispatch-latency-bound deployments; fused=False forces the
    fully generic multi-dispatch path."""
    for m in methods:
        assert m in ALL_MODES, m
    cat = jnp.asarray(cat_embs) if cat_embs is not None else None
    need_prefix = ('ctc_prefix_beam_search' in methods
                   or 'attention_rescoring' in methods)
    if (fused and 'attention_rescoring' in methods
            and set(methods) <= {'ctc_prefix_beam_search',
                                 'attention_rescoring'}
            and not cfg.apply_non_blank_embedding):
        from reverb_tpu.decode.prefix_beam import _graph_tables
        fused = _decode_fused(
            params, cfg, methods, feats, feats_lens, beam_size, ctc_weight,
            reverse_weight, blank_skip_threshold, max_hyp_len,
            decoding_chunk_size, blank_penalty, cat,
            _graph_tables(context_graph, cfg.vocab_size),
            post_only=(fused == 'post'))
        if fused is not None:
            return fused
    # Modes that walk the full distribution (time-sync joint search, WFST
    # composition, non-blank-frame filtering) need the dense (B,T,V) table;
    # greedy/prefix/rescoring consume only per-frame top-k + p(blank), for
    # which the fused deferred-normalization path skips ~4 full-tensor HBM
    # passes at V=10k (encode_and_ctc_topk).
    need_full = (('joint_decoding' in methods) or ('hlg_onebest' in methods)
                 or ('hlg_rescore' in methods)
                 or cfg.apply_non_blank_embedding)
    ctc_probs = None
    if need_full:
        encoder_out, encoder_lens, ctc_probs = encode_and_ctc(
            params, cfg, jnp.asarray(feats), jnp.asarray(feats_lens), cat,
            blank_penalty, decoding_chunk_size)
    else:
        k = beam_size if need_prefix else 1
        encoder_out, encoder_lens, tk_logp, tk_idx, blank_lp = \
            encode_and_ctc_topk(
                params, cfg, jnp.asarray(feats), jnp.asarray(feats_lens),
                cat, k, blank_penalty, decoding_chunk_size)

    results: Dict[str, List[DecodeResult]] = {}
    if 'attention' in methods:
        results['attention'] = attention_beam_search(
            params, cfg, encoder_out, encoder_lens, beam_size, length_penalty,
            cat_embs=cat)
    if 'ctc_greedy_search' in methods:
        if ctc_probs is not None:
            results['ctc_greedy_search'] = ctc_greedy_search(
                ctc_probs, encoder_lens, cfg.blank_id)
        else:
            from reverb_tpu.decode.greedy import ctc_greedy_from_top1
            results['ctc_greedy_search'] = ctc_greedy_from_top1(
                tk_idx[:, :, 0], encoder_lens, cfg.blank_id)
    if need_prefix:
        # context biasing is IN-BEAM, as in the reference (search.py:169-218)
        if ctc_probs is not None:
            prefix_results, beam_raw = ctc_prefix_beam_search_raw(
                ctc_probs, encoder_lens, beam_size, cfg.blank_id,
                blank_skip_threshold=blank_skip_threshold,
                context_graph=context_graph)
        else:
            prefix_results, beam_raw = ctc_prefix_beam_search_topk_raw(
                tk_logp, tk_idx, blank_lp, encoder_lens, beam_size,
                cfg.blank_id, blank_skip_threshold=blank_skip_threshold,
                context_graph=context_graph, vocab_size=cfg.vocab_size)
        if 'ctc_prefix_beam_search' in methods:
            results['ctc_prefix_beam_search'] = prefix_results
    if 'attention_rescoring' in methods:
        resc_out, resc_lens = encoder_out, encoder_lens
        if cfg.apply_non_blank_embedding:
            # token-level embeddings for the rescorer (asr_model.py:415-417)
            from reverb_tpu.models.asr_model import filter_blank_embedding
            T = encoder_out.shape[1]
            mask = (jnp.arange(T)[None, :] < encoder_lens[:, None])[:, None, :]
            resc_out, resc_mask = filter_blank_embedding(
                cfg, ctc_probs, encoder_out, mask)
            resc_lens = jnp.sum(resc_mask[:, 0, :], axis=-1)
        results['attention_rescoring'] = attention_rescoring(
            params, cfg, prefix_results, resc_out, resc_lens,
            ctc_weight, reverse_weight, cat_embs=cat,
            device_nbest=beam_raw)
    if 'onmt_attention_decoding' in methods:
        from reverb_tpu.decode.onmt_beam import onmt_attention_decoding
        results['onmt_attention_decoding'] = onmt_attention_decoding(
            params, cfg, encoder_out, encoder_lens, beam_size, cat_embs=cat)
    if 'joint_decoding' in methods:
        from reverb_tpu.decode.joint import joint_decoding
        results['joint_decoding'] = joint_decoding(
            params, cfg, encoder_out, encoder_lens, ctc_probs,
            ctc_weight=ctc_weight if ctc_weight else 0.5,
            beam_size=beam_size, length_bonus=length_penalty, cat_embs=cat)
    if 'hlg_onebest' in methods or 'hlg_rescore' in methods:
        assert hlg_graph is not None, 'hlg modes need hlg_graph (decode/hlg.Fst)'
        from reverb_tpu.decode.hlg import hlg_onebest, hlg_rescore
        if 'hlg_onebest' in methods:
            results['hlg_onebest'] = hlg_onebest(
                ctc_probs, encoder_lens, hlg_graph, cfg.blank_id)
        if 'hlg_rescore' in methods:
            results['hlg_rescore'] = hlg_rescore(
                params, cfg, ctc_probs, encoder_lens, encoder_out,
                encoder_lens, hlg_graph, cfg.blank_id,
                lm_scale=hlg_lm_scale, decoder_scale=hlg_decoder_scale,
                r_decoder_scale=hlg_r_decoder_scale, cat_embs=cat)
    return results
