"""Device-side joint time-synchronous CTC+attention one-pass decoding.

Parity: asr/wenet/espnet/beam_search_timesync.py (arXiv 2210.05200) via
asr/wenet/transformer/search.py:450-496 — the same per-frame semantics as
decode/joint.py's host implementation (blank-threshold frame skip, pre-beam
candidate pruning, per-prefix CTC (p_nb, p_b) DP with pruned-prefix
resurrection, joint score = ctc·ctc_weight + att·(1−ctc_weight) +
length_bonus·len, per-token (start, end) frames and (ctc, att) confidences),
but as ONE `lax.scan` over frames, vmapped over the batch.

TPU design:
 1. The attention memo (beam_search_timesync.py:184-227) becomes carried
    state: each beam slot holds its decoder activation cache, its cumulative
    attention log-prob, AND the (V,) next-token distribution after its
    prefix.  Scoring an extension is then a gather — no decoder call — and
    ONE batched incremental decoder step per frame refreshes the K selected
    beams (idempotent for survivors, fresh for extensions).
 2. Cross-attention K/V over the T-frame encoder memory are precomputed once
    per utterance (attention.cross_kv) and shared by every step/beam.
 3. Frames are pre-filtered with the exact blank-threshold skip rule (the
    reference's `continue` is a full no-op for such frames), so the
    sequential scan only walks frames that can change the beam.
 4. Resurrection (`lk in ctc_dp`, search-time dp of a prefix pruned LAST
    frame) reads a carried (M = K·(P+1)) hash→dp table of the previous
    frame's merged expansion set — exactly the dict the reference consults.

Beam contents and scores are bit-matched to the host loop (f32 vs f64
accumulation aside).  One documented divergence: the reference snapshots a
new prefix's time list at FIRST proposal and keeps per-prefix time entries
forever; here a token's end time reads the parent's CURRENT row at
selection, and a prefix that leaves the beam loses per-child history older
than its parent's tenure — timestamps of resurrected prefixes can differ by
a few frames (scores cannot).

The lexicon constraint (beam_search_timesync.py:386-423) is host-side
string logic; `decode/joint.py` keeps the host path for lexicon runs and
routes everything else here.
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from reverb_tpu.decode.prefix_beam import (NEG_INF, _MULT1, _MULT2, _SEED1,
                                           _SEED2, _log_add)
from reverb_tpu.decode.results import DecodeResult
from reverb_tpu.models import attention as att
from reverb_tpu.models import embedding as emb
from reverb_tpu.models.asr_model import ModelConfig
from reverb_tpu.models.decoder import _layer_is_lsl, _lsl_mix
from reverb_tpu.models.modules import ACTIVATIONS, embedding, layer_norm, linear


def _decoder_rows(p_dec, dcfg, n_blocks, mem_kv, mem_mask, buf, steps, cache,
                  cat_embs):
    """Incremental decoder step with a PER-ROW query position and per-layer
    self-attention K/V caches.

    buf (K, Lb) tokens incl. sos at 0; steps (K,) query positions;
    cache (n_layers, K, Lb, 2·D): each position's self-attention (k‖v)
    row, written when that position was the query.  Rows are write-once
    (the prefix below `steps` never changes), so the survivors'
    idempotent refresh rewrites identical values.  v2 round 5: the
    previous formulation carried per-layer OUTPUT buffers and re-projected
    K/V over the WHOLE buffer every frame (2·Lb·D² per layer per step,
    plus an Lb-wide LN and embedding) — caching K/V computes ONE row per
    layer per step (measured: the flagship joint_decoding scan went
    44 → ~10 ms/frame).  Same math as models.decoder.decoder_forward_one_
    step; cross-attention K/V are shared (attention.mha_shared_kv).
    Returns (logp (K, V) f32, new_cache).
    """
    from reverb_tpu.models.attention import (_MASK_VALUE, _merge_heads,
                                             _split_heads)
    K, Lb = buf.shape
    H = dcfg.attention_heads
    hi = jax.lax.Precision.HIGHEST
    tok = jnp.take_along_axis(buf, steps[:, None], axis=1)       # (K,1)
    x = embedding(p_dec['embed']['0'], tok)                      # (K,1,D)
    D = x.shape[-1]
    pe = jnp.asarray(emb.pe_table(D))[steps][:, None]            # (K,1,D)
    x = x * math.sqrt(D) + pe.astype(x.dtype)
    if dcfg.compute_dtype is not None:
        x = x.astype(dcfg.compute_dtype)
    pos = jnp.arange(Lb)
    keep = (pos[None, :] <= steps[:, None])[:, None, None, :]    # (K,1,1,Lb)
    kk = jnp.arange(K)
    new_cache = []
    for i, lp in enumerate(p_dec['decoders']):
        is_lsl = _layer_is_lsl(dcfg, i, n_blocks)
        eps = 1e-12 if is_lsl else 1e-5
        xn = layer_norm(lp['norm1'], x, eps)                     # (K,1,D)
        q = _split_heads(linear(lp['self_attn']['linear_q'], xn), H)
        k_new = linear(lp['self_attn']['linear_k'], xn)[:, 0]    # (K,D)
        v_new = linear(lp['self_attn']['linear_v'], xn)[:, 0]
        kv = cache[i].at[kk, steps].set(
            jnp.concatenate([k_new, v_new], -1).astype(cache.dtype))
        k_all = _split_heads(kv[..., :D].astype(x.dtype), H)     # (K,H,Lb,dk)
        v_all = _split_heads(kv[..., D:].astype(x.dtype), H)
        d_k = q.shape[-1]
        scores = jnp.matmul(q, k_all.transpose(0, 1, 3, 2),
                            precision=hi) / math.sqrt(d_k)
        scores32 = jnp.where(keep, scores.astype(jnp.float32), _MASK_VALUE)
        attn = jax.nn.softmax(scores32, axis=-1)
        attn = jnp.where(keep, attn, 0.0).astype(x.dtype)
        ctx = _merge_heads(jnp.matmul(attn, v_all, precision=hi))
        sa = linear(lp['self_attn']['linear_out'], ctx)          # (K,1,D)
        h = x + sa
        xn2 = layer_norm(lp['norm2'], h, eps)
        ca = att.mha_shared_kv(lp['src_attn'], xn2, mem_kv[i], mem_mask,
                               dcfg.attention_heads)
        h = h + ca
        xn3 = layer_norm(lp['norm3'], h, eps)
        actf = ACTIVATIONS[dcfg.activation_type]
        ff_in = _lsl_mix(lp['language_layers'], xn3, cat_embs) if is_lsl \
            else xn3
        ff = linear(lp['feed_forward']['w_2'],
                    actf(linear(lp['feed_forward']['w_1'], ff_in)))
        x = h + ff                                               # (K,1,D)
        new_cache.append(kv)
    y = x[:, 0]
    if dcfg.normalize_before:
        y = layer_norm(p_dec['after_norm'], y)
    if dcfg.use_output_layer:
        y = linear(p_dec['output_layer'], y)
    return jax.nn.log_softmax(y.astype(jnp.float32), axis=-1), \
        jnp.stack(new_cache)


def _joint_search_one(params, cfg: ModelConfig, enc, enc_len, probs,
                      K: int, P: int, ctc_w: float, penalty: float,
                      log_thr: float, skip_enabled: bool, Lc: int,
                      cat_embs):
    """One utterance. enc (T,D); probs (T,V) f32 log-probs.

    Returns (tokens (K,Lc), lens (K,), scores (K,), times_s/e (K,Lc),
    conf_c/conf_a (K,Lc)) sorted best-first."""
    dcfg = cfg.decoder
    dp_ = params['decoder']
    p_dec = dp_['left_decoder'] if dcfg.decoder_type == 'bitransformer' \
        else dp_
    n_blocks = dcfg.num_blocks
    blank = cfg.blank_id
    sos = cfg.sos
    dec_w = 1.0 - ctc_w
    T, V = probs.shape
    D = enc.shape[-1]
    Lb = Lc + 2
    dec_cat = cat_embs if cfg.lsl_dec else None

    mem_kv = [att.cross_kv(lp['src_attn'], enc, dcfg.attention_heads)
              for lp in p_dec['decoders']]
    mem_mask = (jnp.arange(T) < enc_len)[None, None, :]          # (1,1,T)

    # ---- frame pre-filter: the reference's skip rule is a full no-op ----
    in_range = jnp.arange(T) < enc_len
    if skip_enabled:
        is_best_blank = jnp.argmax(probs, axis=-1) == blank
        skip = is_best_blank & (probs[:, blank] >= log_thr)
    else:
        skip = jnp.zeros((T,), bool)
    keep = in_range & ~skip
    order = jnp.argsort(~keep, stable=True)                       # kept first
    ts = order.astype(jnp.int32)                                  # (T,)
    n_valid = jnp.sum(keep)

    # ---- initial beam: the single [sos] prefix ----
    beam_ix = jnp.arange(K, dtype=jnp.int32)
    alive0 = beam_ix == 0
    buf0 = jnp.zeros((K, Lb), jnp.int32).at[:, 0].set(sos)
    cache0 = jnp.zeros((n_blocks, K, Lb, 2 * D), enc.dtype)
    nsc0, cache0 = _decoder_rows(p_dec, dcfg, n_blocks, mem_kv, mem_mask,
                                 buf0, jnp.zeros((K,), jnp.int32), cache0,
                                 dec_cat)
    M = K + K * P
    carry = dict(
        lens=jnp.zeros((K,), jnp.int32),
        buf=buf0,
        h1=jnp.where(alive0, _SEED1, beam_ix.astype(jnp.uint32) + 7),
        h2=jnp.where(alive0, _SEED2, beam_ix.astype(jnp.uint32) + 13),
        dp=jnp.stack([jnp.full((K,), NEG_INF),
                      jnp.where(alive0, 0.0, NEG_INF)], axis=1),  # (nb, b)
        att_sum=jnp.zeros((K,), jnp.float32),
        nsc=nsc0,
        cache=cache0,
        times_s=jnp.zeros((K, Lc), jnp.int32),
        times_e=jnp.zeros((K, Lc), jnp.int32),
        conf_c=jnp.full((K, Lc), NEG_INF),
        conf_a=jnp.full((K, Lc), NEG_INF),
        child_start=jnp.full((K, V), -1, jnp.int32),
        child_cmax=jnp.full((K, V), NEG_INF),
        prev_h1=jnp.zeros((M,), jnp.uint32),
        prev_h2=jnp.zeros((M,), jnp.uint32),
        prev_dp=jnp.full((M, 2), NEG_INF),
        prev_valid=jnp.zeros((M,), bool),
        alive=alive0,
        scores=jnp.where(alive0, 0.0, -jnp.inf),
    )

    def step(c, tt):
        p = probs[tt]                                             # (V,)
        valid = tt >= 0
        lens, buf, h1, h2 = c['lens'], c['buf'], c['h1'], c['h2']
        dp, att_sum, nsc, alive = c['dp'], c['att_sum'], c['nsc'], c['alive']
        pblank = p[blank]
        cv, ci = jax.lax.top_k(p, P)                              # (P,)
        blank_in = jnp.any(ci == blank)
        last = jnp.take_along_axis(buf, lens[:, None], axis=1)[:, 0]  # (K,)
        p_last = jnp.take(p, last)
        p_prev = _log_add(dp[:, 0], dp[:, 1])                     # (K,)

        # ---- stay entries (the hyp itself) ----
        last_in = jnp.any(ci[None, :] == last[:, None], axis=1)   # (K,)
        stay_pb = jnp.where(blank_in, pblank + p_prev, NEG_INF)
        stay_nb_self = jnp.where(last_in, p_last + dp[:, 0], NEG_INF)
        stay_has_rep = last_in & alive

        # ---- extension entries (K, P) ----
        is_blank_c = ci == blank                                  # (P,)
        is_rep = ci[None, :] == last[:, None]                     # (K,P)
        ext_nb = jnp.where(is_rep, dp[:, 1:2], p_prev[:, None]) + cv[None, :]
        uu = ci.astype(jnp.uint32) + jnp.uint32(1)
        ch1 = h1[:, None] * _MULT1 + uu[None, :]                  # (K,P)
        ch2 = h2[:, None] * _MULT2 + uu[None, :]
        # already a beam member?  (l_plus in hyps)
        eqb = ((ch1[:, :, None] == h1[None, None, :])
               & (ch2[:, :, None] == h2[None, None, :])
               & alive[None, None, :])                            # (K,P,K)
        in_beam = jnp.any(eqb, axis=-1)
        # resurrection from last frame's expansion table
        eqp = ((ch1[:, :, None] == c['prev_h1'][None, None, :])
               & (ch2[:, :, None] == c['prev_h2'][None, None, :])
               & c['prev_valid'][None, None, :])                  # (K,P,M)
        in_prev = jnp.any(eqp, axis=-1)
        prev_nb = jnp.sum(jnp.where(eqp, c['prev_dp'][None, None, :, 0],
                                    NEG_INF * 0), axis=-1) \
            + jnp.where(in_prev, 0.0, NEG_INF)
        prev_pb = jnp.sum(jnp.where(eqp, c['prev_dp'][None, None, :, 1],
                                    NEG_INF * 0), axis=-1) \
            + jnp.where(in_prev, 0.0, NEG_INF)
        resurrect = (~in_beam) & in_prev
        ext_nb = jnp.where(resurrect,
                           _log_add(ext_nb, cv[None, :] + prev_nb), ext_nb)
        ext_pb = jnp.where(resurrect,
                           pblank + _log_add(prev_nb, prev_pb),
                           NEG_INF)
        ext_live = alive[:, None] & ~is_blank_c[None, :]

        # ---- merge extensions that equal a CURRENT beam member ----
        # eqb: ext (k,u) == beam j  →  fold its nb into stay j, kill the ext
        contrib = jnp.where((eqb & ext_live[:, :, None]),
                            ext_nb[:, :, None], NEG_INF)          # (K,P,K)
        stay_ext_nb = jnp.max(contrib, axis=(0, 1))               # (K,)
        stay_has_ext = stay_ext_nb > NEG_INF / 2
        # pc of the merging ext (for the beam-row conf/time mutation)
        pc_of_ext = jnp.max(jnp.where(eqb & ext_live[:, :, None],
                                      cv[None, :, None], NEG_INF),
                            axis=(0, 1))
        stay_nb = _log_add(stay_nb_self, stay_ext_nb)
        stay_in_dict = (blank_in | stay_has_rep | stay_has_ext) & alive
        stay_in_newhyps = (blank_in | stay_has_ext) & alive
        ext_live = ext_live & ~in_beam

        # ---- per-beam time/conf mutations this frame ----
        lpos = jnp.maximum(lens - 1, 0)
        mut_rep = stay_has_rep & (lens > 0)
        mut_ext = stay_has_ext & (lens > 0)
        te = c['times_e']
        te = te.at[beam_ix, lpos].set(
            jnp.where(mut_rep | mut_ext, tt + 1,
                      te[beam_ix, lpos]))
        cc = c['conf_c']
        new_cmax = jnp.maximum(
            cc[beam_ix, lpos],
            jnp.maximum(jnp.where(mut_rep, p_last, NEG_INF),
                        jnp.where(mut_ext, pc_of_ext, NEG_INF)))
        cc = cc.at[beam_ix, lpos].set(
            jnp.where(mut_rep | mut_ext, new_cmax, cc[beam_ix, lpos]))

        # ---- child history tables (proposal-time, selection-independent) --
        write_child = ext_live                                     # (K,P)
        kk = jnp.broadcast_to(beam_ix[:, None], (K, P))
        cidx = jnp.broadcast_to(ci[None, :], (K, P))
        cs, cm = c['child_start'], c['child_cmax']
        old_start = cs[kk, cidx]
        cs = cs.at[kk, cidx].set(
            jnp.where(write_child,
                      jnp.where(old_start >= 0, old_start, tt), old_start))
        old_cm = cm[kk, cidx]
        cm = cm.at[kk, cidx].set(
            jnp.where(write_child, jnp.maximum(old_cm, cv[None, :]), old_cm))

        # ---- scoring ----
        nsc_c = jnp.take_along_axis(nsc, jnp.broadcast_to(ci[None, :],
                                                          (K, P)), axis=1)
        stay_score = (ctc_w * _log_add(stay_nb, stay_pb)
                      + jnp.where(lens > 0, dec_w * att_sum, 0.0)
                      + penalty * lens)
        stay_score = jnp.where(stay_in_newhyps, stay_score, -jnp.inf)
        ext_att = att_sum[:, None] + nsc_c
        ext_score = (ctc_w * _log_add(ext_nb, ext_pb)
                     + dec_w * ext_att + penalty * (lens[:, None] + 1))
        ext_score = jnp.where(ext_live, ext_score, -jnp.inf)

        all_scores = jnp.concatenate([stay_score, ext_score.reshape(-1)])
        sel_score, sel = jax.lax.top_k(all_scores, K)
        is_ext = sel >= K
        par = jnp.where(is_ext, (sel - K) // P, sel)              # (K,)
        cpos = jnp.where(is_ext, (sel - K) % P, 0)
        ctok = jnp.take(ci, cpos)
        cval = jnp.take(cv, cpos)

        def g(x):
            return jnp.take(x, par, axis=0)

        new_alive = sel_score > -jnp.inf
        new_lens = g(lens) + is_ext.astype(jnp.int32)
        new_buf = g(buf)
        new_buf = new_buf.at[beam_ix, jnp.minimum(new_lens, Lb - 1)].set(
            jnp.where(is_ext, ctok, new_buf[beam_ix,
                                            jnp.minimum(new_lens, Lb - 1)]))
        new_h1 = jnp.where(is_ext, g(h1) * _MULT1
                           + (ctok.astype(jnp.uint32) + 1), g(h1))
        new_h2 = jnp.where(is_ext, g(h2) * _MULT2
                           + (ctok.astype(jnp.uint32) + 1), g(h2))
        # keep dead slots' sentinel hashes distinct so they never merge
        new_h1 = jnp.where(new_alive, new_h1,
                           beam_ix.astype(jnp.uint32) + 7)
        new_h2 = jnp.where(new_alive, new_h2,
                           beam_ix.astype(jnp.uint32) + 13)
        sel_nb = jnp.where(is_ext,
                           ext_nb[par, cpos], jnp.take(stay_nb, par))
        sel_pb = jnp.where(is_ext,
                           ext_pb[par, cpos], jnp.take(stay_pb, par))
        new_dp = jnp.stack([sel_nb, sel_pb], axis=1)
        new_att = g(att_sum) + jnp.where(is_ext, nsc_c[par, cpos], 0.0)

        wpos = jnp.minimum(jnp.maximum(new_lens - 1, 0), Lc - 1)
        child_s = cs[par, ctok]
        new_ts = g(c['times_s'])
        new_ts = new_ts.at[beam_ix, wpos].set(
            jnp.where(is_ext, jnp.where(child_s >= 0, child_s, tt),
                      new_ts[beam_ix, wpos]))
        new_te = g(te)
        new_te = new_te.at[beam_ix, wpos].set(
            jnp.where(is_ext, tt + 1, new_te[beam_ix, wpos]))
        new_cc = g(cc)
        new_cc = new_cc.at[beam_ix, wpos].set(
            jnp.where(is_ext, jnp.maximum(cm[par, ctok], cval),
                      new_cc[beam_ix, wpos]))
        new_ca = g(c['conf_a'])
        new_ca = new_ca.at[beam_ix, wpos].set(
            jnp.where(is_ext, nsc_c[par, cpos], new_ca[beam_ix, wpos]))

        # extensions start with a fresh (childless) history row
        new_cs = jnp.where(is_ext[:, None], -1, g(cs))
        new_cm = jnp.where(is_ext[:, None], NEG_INF, g(cm))

        new_cache = jnp.take(c['cache'], par, axis=1)
        new_nsc, new_cache = _decoder_rows(
            p_dec, dcfg, n_blocks, mem_kv, mem_mask, new_buf, new_lens,
            new_cache, dec_cat)
        new_nsc = jnp.where(new_alive[:, None], new_nsc, g(nsc))

        # ---- previous-expansion table for next frame's resurrection ----
        prev_h1 = jnp.concatenate([h1, ch1.reshape(-1)])
        prev_h2 = jnp.concatenate([h2, ch2.reshape(-1)])
        prev_dp = jnp.concatenate(
            [jnp.stack([stay_nb, stay_pb], 1),
             jnp.stack([ext_nb.reshape(-1), ext_pb.reshape(-1)], 1)])
        prev_valid = jnp.concatenate([stay_in_dict, ext_live.reshape(-1)])

        new_c = dict(lens=new_lens, buf=new_buf, h1=new_h1, h2=new_h2,
                     dp=new_dp, att_sum=new_att, nsc=new_nsc,
                     cache=new_cache, times_s=new_ts, times_e=new_te,
                     conf_c=new_cc, conf_a=new_ca, child_start=new_cs,
                     child_cmax=new_cm, prev_h1=prev_h1, prev_h2=prev_h2,
                     prev_dp=prev_dp, prev_valid=prev_valid,
                     alive=new_alive, scores=sel_score)
        out = jax.tree.map(lambda n, o: jnp.where(
            jnp.reshape(valid, (1,) * n.ndim), n, o), new_c, c)
        return out, None

    tt_seq = jnp.where(jnp.arange(T) < n_valid, ts, -1)
    carry, _ = jax.lax.scan(step, carry, tt_seq)
    return (carry['buf'][:, 1:Lc + 1], carry['lens'], carry['scores'],
            carry['times_s'], carry['times_e'], carry['conf_c'],
            carry['conf_a'])


@functools.partial(jax.jit, static_argnums=(1, 5, 6, 7, 8, 9, 10, 11))
def _joint_search_batch(params, cfg: ModelConfig, encoder_outs, encoder_lens,
                        ctc_probs, K: int, P: int, ctc_w: float,
                        penalty: float, log_thr: float, skip_enabled: bool,
                        Lc: int, cat_embs=None):
    fn = lambda enc, el, pr: _joint_search_one(
        params, cfg, enc, el, pr, K, P, ctc_w, penalty, log_thr,
        skip_enabled, Lc, cat_embs)
    return jax.vmap(fn)(encoder_outs, encoder_lens, ctc_probs)


def joint_decoding_device(params, cfg: ModelConfig, encoder_outs,
                          encoder_lens, ctc_probs, ctc_weight: float = 0.5,
                          beam_size: int = 4, pre_beam_ratio: float = 1.5,
                          length_bonus: float = 0.5,
                          blank_threshold: float = 1.0,
                          cat_embs=None,
                          max_tokens: int = 0) -> List[DecodeResult]:
    """search.py:450-496 entry, device scan: per-utterance time-sync search
    in one batched program."""
    V = np.asarray(ctc_probs).shape[-1]
    P = min(int(pre_beam_ratio * beam_size), V)   # host caps at vocab size
    log_thr = math.log(blank_threshold) if blank_threshold < 1.0 else 0.0
    skip_enabled = log_thr < 0.0
    T = np.asarray(ctc_probs).shape[1]
    Lc = max_tokens or T
    cat = jnp.asarray(cat_embs) if cat_embs is not None else None
    toks, lens, scores, ts, te, cc, ca = _joint_search_batch(
        params, cfg, jnp.asarray(encoder_outs),
        jnp.asarray(encoder_lens, jnp.int32),
        jnp.asarray(ctc_probs, jnp.float32), beam_size, P,
        float(ctc_weight), float(length_bonus), log_thr, skip_enabled, Lc,
        cat)
    from reverb_tpu.utils.common import fetch_np
    toks, lens, scores, ts, te, cc, ca = fetch_np(
        toks, lens, scores, ts, te, cc, ca)
    conf = np.maximum(cc, ca)
    results = []
    for b in range(toks.shape[0]):
        n = int(lens[b, 0])
        results.append(DecodeResult(
            tokens=toks[b, 0, :n].tolist(), score=float(scores[b, 0]),
            times=ts[b, 0, :n].tolist(),
            tokens_confidence=[math.exp(c) if c > float(NEG_INF) / 2 else 0.0
                               for c in conf[b, 0, :n]]))
    return results
