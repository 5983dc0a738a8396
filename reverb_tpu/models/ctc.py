"""CTC head: projection + loss (optax CTC forward-backward) + activations.

Parity: asr/wenet/transformer/ctc.py:22-124 (sum-reduced loss / batch size,
optional focal-CTC α·(1-p)^γ scaling at ctc.py:56-99).
On TPU the α-β recursions inside optax.ctc_loss lower to lax.scan over time —
one fused XLA while-loop, no host round-trips.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import optax

from reverb_tpu.models.modules import dropout, linear


def ctc_logits(params, encoder_out, dropout_rate: float = 0.0, rng=None):
    return linear(params['ctc_lo'], dropout(encoder_out, dropout_rate, rng))


def ctc_log_softmax(params, encoder_out):
    """ctc.py:106-114."""
    return jax.nn.log_softmax(
        ctc_logits(params, encoder_out).astype(jnp.float32), axis=-1)


def ctc_topk_logprobs(params, encoder_out, k: int,
                      blank_penalty: float = 0.0, blank_id: int = 0):
    """Top-k CTC log-probs with deferred normalization.

    The device prefix-beam (and greedy = k:1) consume only each frame's
    top-k candidates plus p(blank); materializing the full (B,T,V) f32
    log-softmax costs ~4 full-tensor HBM passes at V=10k.  Here top-k runs
    on the bf16 logits (order-preserving) and only the k winners + blank
    are normalized by a one-pass f32 logsumexp.

    Returns (topk_logp f32 (B,T,k), topk_idx i32 (B,T,k),
    blank_logp f32 (B,T)) — identical values/indices to topk of
    `ctc_logprobs` (same bf16 logits, same tie order).
    """
    from reverb_tpu.ops.topk import topk_lastdim
    logits = ctc_logits(params, encoder_out)
    if blank_penalty > 0.0:
        logits = logits.at[:, :, blank_id].add(
            jnp.asarray(-blank_penalty, logits.dtype))
    m = jnp.max(logits, axis=-1).astype(jnp.float32)
    se = jnp.sum(jnp.exp(logits.astype(jnp.float32) - m[..., None]), axis=-1)
    lse = m + jnp.log(se)
    tv, ti = topk_lastdim(logits, k)
    topk_logp = tv.astype(jnp.float32) - lse[..., None]
    blank_logp = logits[:, :, blank_id].astype(jnp.float32) - lse
    return topk_logp, ti.astype(jnp.int32), blank_logp


def ctc_logprobs(params, encoder_out, blank_penalty: float = 0.0,
                 blank_id: int = 0):
    """asr_model.py:317-329: optional blank-logit penalty before log_softmax."""
    logits = ctc_logits(params, encoder_out).astype(jnp.float32)
    if blank_penalty > 0.0:
        logits = logits.at[:, :, blank_id].add(-blank_penalty)
    return jax.nn.log_softmax(logits, axis=-1)


def ctc_loss(params, encoder_out, encoder_lens, ys_pad, ys_lens,
             blank_id: int = 0, dropout_rate: float = 0.0, rng=None,
             focal: bool = False, focal_alpha: float = 0.5,
             focal_gamma: float = 2.0):
    """Sum-reduced CTC loss / batch (ctc.py:82-102). ys_pad padded with 0s OK
    (label_paddings mask them)."""
    logits = ctc_logits(params, encoder_out, dropout_rate, rng)
    logits = logits.astype(jnp.float32)
    B, T, V = logits.shape
    L = ys_pad.shape[1]
    logit_paddings = (jnp.arange(T)[None, :] >= encoder_lens[:, None]
                      ).astype(jnp.float32)
    label_paddings = (jnp.arange(L)[None, :] >= ys_lens[:, None]
                      ).astype(jnp.float32)
    labels = jnp.where(label_paddings > 0, 0, ys_pad).astype(jnp.int32)
    per_seq = optax.ctc_loss(logits, logit_paddings, labels, label_paddings,
                             blank_id=blank_id)          # (B,)
    if focal:
        p = jnp.exp(-per_seq)
        per_seq = focal_alpha * (1 - p) ** focal_gamma * per_seq
        return jnp.mean(per_seq)
    return jnp.sum(per_seq) / B


def label_smoothing_loss(logits, target, lens, smoothing: float,
                         vocab_size: int, ignore_id: int = -1,
                         normalize_length: bool = False):
    """KLDiv label smoothing with padding masking
    (asr/wenet/transformer/label_smoothing_loss.py:21-98).

    logits: (B, L, V); target: (B, L) with ignore_id padding.
    Denominator = batch size (or token count when normalize_length).
    """
    B, L, V = logits.shape
    confidence = 1.0 - smoothing
    low = smoothing / (V - 1)
    mask = target != ignore_id
    tgt = jnp.where(mask, target, 0)
    # Closed form of Σ_v p_v·(log p_v − logp_v) for the smoothed one-hot p:
    # the cross term needs only logp_tgt and Σ_v logp_v = Σ_v logits − V·lse,
    # so no (B,L,V) f32 tensor is ever materialized (the explicit
    # true_dist/logp/kl_terms formulation carried three of them — ~164 MB
    # each at flagship B=64, the allocs that blocked larger train batches;
    # reduces fuse the f32 cast of the bf16 logits).  torch.nn.KLDivLoss
    # 0·log 0 = 0 convention: the entropy/low terms drop at smoothing=0
    # (smoothing is a static python float, so this branches at trace time).
    lf = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(lf, axis=-1)                  # (B,L)
    logit_tgt = jnp.take_along_axis(lf, tgt[..., None], axis=-1)[..., 0]
    logp_tgt = logit_tgt - lse
    ent = confidence * math.log(confidence) if confidence > 0 else 0.0
    if low > 0:
        ent += (V - 1) * low * math.log(low)
        sum_logp = jnp.sum(lf, axis=-1) - V * lse
        cross = confidence * logp_tgt + low * (sum_logp - logp_tgt)
    else:
        cross = confidence * logp_tgt
    kl = jnp.where(mask, ent - cross, 0.0)                          # (B,L)
    denom = jnp.sum(mask) if normalize_length else B
    return jnp.sum(kl) / denom


def ctc_activation_more(params, encoder_out,
                        missing_blank_from_top2_threshold: float,
                        non_blank_prob_threshold: float,
                        top_blank_prob_penalty: float,
                        blank_id: int = 0):
    """Blank-suppression activation with instrumentation counters.

    Parity: asr_model.py:736-840 (`ctc_activation_more`, the streaming
    "hack"): when the fraction of frames whose top-2 tokens are both
    non-blank is below `missing_blank_from_top2_threshold`, every frame whose
    best token is blank but whose runner-up beats `non_blank_prob_threshold`
    has its blank log-prob penalized by `top_blank_prob_penalty`.  Fully
    vectorized (the reference loops frames in python).

    encoder_out: (1, T, D).  Returns (ctc_probs (1,T,V), maxlen,
    n_only_nonblank_top2, ratio, applied_hack (bool array), n_changes).
    """
    ctc_probs = ctc_log_softmax(params, encoder_out)[0]        # (T, V)
    T = ctc_probs.shape[0]
    from reverb_tpu.ops.topk import topk_lastdim
    top2_vals, top2_idx = topk_lastdim(ctc_probs, 2)
    only_nonblank = jnp.all(top2_idx != blank_id, axis=1)
    n_only_nonblank = jnp.sum(only_nonblank)
    ratio = n_only_nonblank / T
    apply_hack = ratio < missing_blank_from_top2_threshold

    best_is_blank = top2_idx[:, 0] == blank_id
    runner_good = top2_vals[:, 1] > non_blank_prob_threshold
    change = apply_hack & best_is_blank & runner_good          # (T,)
    penalized = ctc_probs.at[:, blank_id].add(
        jnp.where(change, -top_blank_prob_penalty, 0.0))
    return (penalized[None], T, n_only_nonblank, ratio, apply_hack,
            jnp.sum(change))
