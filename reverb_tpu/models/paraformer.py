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
    """Cif / Predictor hyper-parameters (cif.py:24-54, paraformer.py:37-66).

    Defaults follow the reference classes (residual=True, cnn_groups=0 ⇒
    depthwise conv); converted Ali-Paraformer configs always pass
    cnn_groups=1, residual=False explicitly
    (convert_paraformer_to_wenet_config_and_ckpt.py:111-112)."""
    idim: int = 256
    l_order: int = 1
    r_order: int = 1
    threshold: float = 1.0
    smooth_factor: float = 1.0
    noise_threshold: float = 0.0
    tail_threshold: float = 0.45
    residual: bool = True
    cnn_groups: int = 0
    # accurate-timestamp (tp) branch — Predictor, paraformer.py:60-102
    smooth_factor2: float = 0.25
    noise_threshold2: float = 0.01
    upsample_times: int = 3


def _cif_groups(cfg: CifConfig) -> int:
    return cfg.idim if cfg.cnn_groups == 0 else cfg.cnn_groups


def init_cif(rng, cfg: CifConfig):
    k1, k2 = jax.random.split(rng)
    k = cfg.l_order + cfg.r_order + 1
    return {'cif_conv1d': init_conv1d(k1, cfg.idim, cfg.idim, k,
                                      groups=_cif_groups(cfg)),
            'cif_output': init_linear(k2, cfg.idim, 1)}


def init_predictor_tp(rng, cfg: CifConfig):
    """The V3 timestamp branch: ConvTranspose1d upsample ×u → BiLSTM →
    linear (paraformer.py:64-74).  Checkpoint keys: predictor.tp_*."""
    from reverb_tpu.diar.models import init_lstm
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    u = cfg.upsample_times
    bound = 1.0 / (cfg.idim * u) ** 0.5
    return {
        # torch ConvTranspose1d weight layout: (in, out, k)
        'tp_upsample_cnn': {
            'weight': jax.random.uniform(k1, (cfg.idim, cfg.idim, u),
                                         jnp.float32, -bound, bound),
            'bias': jnp.zeros((cfg.idim,), jnp.float32)},
        'tp_blstm': {'fwd': init_lstm(k2, cfg.idim, cfg.idim),
                     'bwd': init_lstm(k3, cfg.idim, cfg.idim)},
        'tp_output': init_linear(k4, cfg.idim * 2, 1),
    }


def cif_alphas(params, encoder_out, encoder_mask, cfg: CifConfig):
    """Per-frame firing weights α (B, T) — Cif.forward head (cif.py:55-86):
    pad(l,r) → conv1d(groups) → [+residual] → relu → linear → sigmoid →
    relu(α·smooth − noise) → mask."""
    x = encoder_out.transpose(0, 2, 1)                      # (B, D, T)
    q = jnp.pad(x, ((0, 0), (0, 0), (cfg.l_order, cfg.r_order)))
    y = conv1d(params['cif_conv1d'], q, groups=_cif_groups(cfg))
    if cfg.residual:
        y = y + x
    y = jax.nn.relu(y).transpose(0, 2, 1)
    alphas = jax.nn.sigmoid(linear(params['cif_output'], y))[..., 0]
    alphas = jax.nn.relu(alphas * cfg.smooth_factor - cfg.noise_threshold)
    return jnp.where(encoder_mask[:, 0, :], alphas, 0.0)


def cif_tail_process(hidden, alphas, mask, tail_threshold: float):
    """Inference tail handling (cif.py:110-142): append one column carrying
    `tail_threshold` at each row's first padded position (or the appended
    column when unpadded), extend hidden with a zero frame, token count =
    floor(Σα).  Returns (hidden (B,T+1,D), alphas (B,T+1), token_num (B,))."""
    B, T, D = hidden.shape
    m = mask.astype(alphas.dtype)                           # (B, T)
    zeros_c = jnp.zeros((B, 1), alphas.dtype)
    mask_1 = jnp.concatenate([m, zeros_c], axis=1)
    mask_2 = jnp.concatenate([jnp.ones((B, 1), alphas.dtype), m], axis=1)
    tail = (mask_2 - mask_1) * tail_threshold
    alphas = jnp.concatenate([alphas, zeros_c], axis=1) + tail
    hidden = jnp.concatenate(
        [hidden, jnp.zeros((B, 1, D), hidden.dtype)], axis=1)
    token_num = jnp.floor(jnp.sum(alphas, axis=-1))
    return hidden, alphas, token_num


def cif_fires(alphas, threshold: float):
    """`cif_without_hidden` (cif.py:225-247): the running integration value
    per frame, with a reset of −threshold after each fire.  (B,T) → (B,T)."""
    B = alphas.shape[0]

    def step(integ, a):
        integ = integ + a
        out = integ
        integ = jnp.where(integ >= threshold, integ - threshold, integ)
        return integ, out

    _, fires = jax.lax.scan(step, jnp.zeros((B,), alphas.dtype),
                            alphas.transpose(1, 0))
    return fires.transpose(1, 0)


def cif_peaks_from_tp(tp_alphas, token_nums, threshold: float = 1.0):
    """`forward_cif_peaks` (paraformer.py:319-326): scale the tp α so each
    row sums to the main head's token count, then integrate-and-fire."""
    total = jnp.sum(tp_alphas, axis=-1)
    scale = tp_alphas / (total / jnp.maximum(
        token_nums.astype(tp_alphas.dtype), 1e-6))[:, None]
    return cif_fires(scale, threshold - 1e-4)


def _conv_transpose1d_samek(p, x):
    """ConvTranspose1d with stride == kernel (the tp upsampler): strides
    don't overlap, so the transpose conv is one einsum + interleave.
    x (B, T, Din) → (B, T·k, Dout); torch weight layout (Din, Dout, k)."""
    w = p['weight'].astype(x.dtype)
    y = jnp.einsum('btc,cok->btko', x, w)                   # (B,T,k,Dout)
    B, T, k, Dout = y.shape
    y = y.reshape(B, T * k, Dout)
    if p.get('bias') is not None:
        y = y + p['bias'].astype(x.dtype)
    return y


def tp_alphas_forward(params, hidden, encoder_mask, cfg: CifConfig):
    """Timestamp-branch α at ×upsample_times the encoder frame rate
    (paraformer.py:86-101)."""
    from reverb_tpu.diar.models import bilstm_forward
    x = _conv_transpose1d_samek(params['tp_upsample_cnn'], hidden)
    h = bilstm_forward(params['tp_blstm'], x)
    tp = jax.nn.sigmoid(linear(params['tp_output'], h))[..., 0]
    tp = jax.nn.relu(tp * cfg.smooth_factor2 - cfg.noise_threshold2)
    m = jnp.repeat(encoder_mask[:, 0, :], cfg.upsample_times, axis=1)
    return tp * m.astype(tp.dtype)


def cif_fire(encoder_out, alphas, max_tokens: int, threshold: float = 1.0):
    """Integrate-and-fire: (B,T,D) frames + (B,T) α → (B, U, D) fired
    embeddings + (B,) token counts.  One lax.scan over frames; each fire
    writes into a static (B, max_tokens, D) buffer."""
    B, T, D = encoder_out.shape

    def step(carry, t):
        integ, frac_emb, out, n_fired = carry
        a = alphas[:, t]                                   # (B,)
        h = encoder_out[:, t]                              # (B, D)
        # reference cif() arithmetic (cif.py:250-280): the fired frame is
        # topped up with `distribution_completion = 1 − integrate_old` and
        # the integrator resets by −1.0 (the compare uses `threshold`, the
        # subtraction is hard-coded 1.0 — reproduced exactly)
        completion = 1.0 - integ
        new_integ = integ + a
        fire = new_integ >= threshold
        used = jnp.where(fire, completion, a)
        remain = a - used
        emb_fired = frac_emb + used[:, None] * h
        write = (jnp.arange(max_tokens)[None, :] ==
                 jnp.clip(n_fired, 0, max_tokens - 1)[:, None])
        out = jnp.where((fire[:, None] & write)[..., None], emb_fired[:, None],
                        out)
        frac_emb = jnp.where(fire[:, None], remain[:, None] * h,
                             frac_emb + a[:, None] * h)
        integ = jnp.where(fire, new_integ - 1.0, new_integ)
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
