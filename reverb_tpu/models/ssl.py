"""Self-supervised pretraining objectives: BestRQ and wav2vec2-style
contrastive.

Capability parity with asr/wenet/ssl/ (Wav2vec2Model, BestRQModel,
W2VBERTModel — SURVEY.md §2.4), TPU-first:
  - BestRQ (arXiv 2202.01855): a FROZEN random projection + random codebook
    quantizes masked fbank frames; the encoder predicts the code ids at
    masked positions (pure CE — no EMA codebook updates, ideal for SPMD).
  - wav2vec2-style contrastive loss over masked positions with in-batch
    negatives.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from reverb_tpu.models.modules import init_linear, linear


@dataclasses.dataclass(frozen=True)
class BestRQConfig:
    input_dim: int = 80
    encoder_output_size: int = 256
    num_codebooks: int = 1
    codebook_size: int = 8192
    codebook_dim: int = 16
    mask_prob: float = 0.01          # per-frame mask-start probability
    mask_length: int = 10
    stack_frames: int = 4            # frames quantized per encoder output


def init_bestrq(rng, cfg: BestRQConfig):
    k1, k2, k3 = jax.random.split(rng, 3)
    d_in = cfg.input_dim * cfg.stack_frames
    return {
        # frozen random quantizer (never trained)
        'projection': jax.random.normal(k1, (d_in, cfg.codebook_dim)),
        'codebook': jax.random.normal(
            k2, (cfg.num_codebooks, cfg.codebook_size, cfg.codebook_dim)),
        # trained prediction head
        'head': init_linear(k3, cfg.encoder_output_size,
                            cfg.num_codebooks * cfg.codebook_size),
    }


def bestrq_targets(params, feats, cfg: BestRQConfig):
    """Quantize stacked fbank frames with the frozen random codebook →
    (B, T', num_codebooks) code ids."""
    B, T, F = feats.shape
    Ts = T // cfg.stack_frames
    x = feats[:, :Ts * cfg.stack_frames].reshape(B, Ts,
                                                 cfg.stack_frames * F)
    x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)
    proj = jax.lax.stop_gradient(x @ params['projection'])   # (B,Ts,Dc)
    proj = proj / (jnp.linalg.norm(proj, axis=-1, keepdims=True) + 1e-8)
    cb = params['codebook']
    cb = cb / (jnp.linalg.norm(cb, axis=-1, keepdims=True) + 1e-8)
    sims = jnp.einsum('btd,kcd->btkc', proj, cb)
    return jax.lax.stop_gradient(jnp.argmax(sims, axis=-1))  # (B,Ts,K)


def make_mask(rng, B: int, T: int, cfg: BestRQConfig):
    """Span masking: starts ~Bernoulli(mask_prob), span mask_length."""
    starts = jax.random.bernoulli(rng, cfg.mask_prob, (B, T))
    idx = jnp.arange(T)
    span = (idx[None, None, :] >= idx[None, :, None]) & \
           (idx[None, None, :] < idx[None, :, None] + cfg.mask_length)
    return jnp.einsum('bt,xtu->bu', starts.astype(jnp.float32),
                      span[0][None].astype(jnp.float32)) > 0


def bestrq_loss(params, encoder_apply, feats, feats_lens, rng,
                cfg: BestRQConfig):
    """Mask → encode → predict code ids at masked positions (CE)."""
    B, T, F = feats.shape
    k1, k2 = jax.random.split(rng)
    targets = bestrq_targets(params, feats, cfg)             # (B,Ts,K)
    Ts = targets.shape[1]
    mask = make_mask(k1, B, T, cfg)                          # (B,T)
    noise = jax.random.normal(k2, feats.shape) * 0.1
    masked_feats = jnp.where(mask[..., None], noise, feats)
    enc_out, enc_mask = encoder_apply(masked_feats, feats_lens)
    # align encoder frames to stacked-target frames
    Tq = min(enc_out.shape[1], Ts)
    logits = linear(params['head'], enc_out[:, :Tq])
    logits = logits.reshape(B, Tq, cfg.num_codebooks, cfg.codebook_size)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = targets[:, :Tq]
    tok_lp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    # only masked (and valid) positions contribute
    m_sub = mask[:, :Tq * cfg.stack_frames:cfg.stack_frames][:, :Tq]
    valid = enc_mask[:, 0, :Tq] & m_sub
    denom = jnp.maximum(jnp.sum(valid), 1)
    loss = -jnp.sum(jnp.where(valid[..., None], tok_lp, 0.0)) / denom
    acc = jnp.sum(jnp.where(valid[..., None],
                            (jnp.argmax(logp, -1) == tgt), 0)) / denom
    return {'loss': loss, 'code_accuracy': acc, 'num_masked': jnp.sum(valid)}


def contrastive_loss(anchor, positive, mask, temperature: float = 0.1,
                     num_negatives: int = 50, rng=None):
    """wav2vec2-style InfoNCE over masked positions with in-utterance
    negatives (ssl/wav2vec2 capability)."""
    B, T, D = anchor.shape
    a = anchor / (jnp.linalg.norm(anchor, axis=-1, keepdims=True) + 1e-8)
    p = positive / (jnp.linalg.norm(positive, axis=-1, keepdims=True) + 1e-8)
    sims = jnp.einsum('btd,bsd->bts', a, p) / temperature    # (B,T,T)
    labels = jnp.arange(T)
    logp = jax.nn.log_softmax(sims, axis=-1)
    pos_lp = jnp.take_along_axis(
        logp, jnp.broadcast_to(labels[None, :, None], (B, T, 1)),
        axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(mask), 1)
    return -jnp.sum(jnp.where(mask, pos_lp, 0.0)) / denom
