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
    stack_frames: int = 4            # quantizer window (right_context+1)
    stride: int = 4                  # encoder subsampling rate
    norm_epsilon: float = 1e-5
    features_regularization_weight: float = 0.01


def init_bestrq(rng, cfg: BestRQConfig):
    k1, k2, k3 = jax.random.split(rng, 3)
    d_in = cfg.input_dim * cfg.stack_frames
    return {
        # frozen random quantizer (never trained)
        'projection': jax.random.normal(
            k1, (d_in, cfg.num_codebooks * cfg.codebook_dim)),
        'codebook': jax.random.normal(
            k2, (cfg.num_codebooks, cfg.codebook_size, cfg.codebook_dim)),
        # trained prediction head (≡ reference per-codebook
        # encoder_top_n_out (G, D, C) flattened to one (D, G·C) linear)
        'head': init_linear(k3, cfg.encoder_output_size,
                            cfg.num_codebooks * cfg.codebook_size),
    }


def stack_features(feats, size: int, step: int):
    """Sliding-window frame stacking, matching torch
    `unfold(1, size, step).transpose(-1,-2).reshape(B, T', size·F)`
    (ssl/bestrq/bestrq_model.py _stack_features): window frames contiguous,
    each frame's F features inside. With size=right_context+1 and
    step=subsampling_rate, T' equals the encoder's output length."""
    B, T, F = feats.shape
    Tp = max((T - size) // step + 1, 0)
    idx = jnp.arange(Tp)[:, None] * step + jnp.arange(size)[None]  # (T',size)
    return feats[:, idx].reshape(B, Tp, size * F)


def subsampled_mask(mask, size: int, step: int):
    """A subsampled target position counts as masked only when ALL frames in
    its receptive window are masked (bestrq_model.py forward step 1:
    `torch.min` over the unfolded mask)."""
    B, T = mask.shape
    Tp = max((T - size) // step + 1, 0)
    idx = jnp.arange(Tp)[:, None] * step + jnp.arange(size)[None]
    return jnp.all(mask[:, idx], axis=-1)                     # (B, T')


def bestrq_targets(params, feats, cfg: BestRQConfig):
    """Quantize stacked (CMVN'd) fbank windows with the frozen random
    projection + codebook → (B, T', num_codebooks) code ids.

    Reference semantics (bestrq_model.py _nearest_embedding_idx):
    affine-free LayerNorm over the stacked window (when stack_frames>1),
    random projection, then EUCLIDEAN nearest code per codebook group."""
    x = stack_features(feats, cfg.stack_frames, cfg.stride)
    if cfg.stack_frames > 1:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        x = (x - mu) * jax.lax.rsqrt(var + cfg.norm_epsilon)
    proj = x @ params['projection']                          # (B,T',G·Dc)
    B, Tp, _ = proj.shape
    proj = proj.reshape(B, Tp, cfg.num_codebooks, cfg.codebook_dim)
    cb = params['codebook']                                  # (G,C,Dc)
    # ‖l−c‖² argmin ≡ argmin(‖l‖² − 2·l·c + ‖c‖²); ‖l‖² is constant in c
    dist = (jnp.sum(cb ** 2, -1)[None, None]                 # (1,1,G,C)
            - 2.0 * jnp.einsum('btgd,gcd->btgc', proj, cb))
    return jax.lax.stop_gradient(jnp.argmin(dist, axis=-1))  # (B,T',G)


def make_mask(rng, B: int, T: int, cfg: BestRQConfig):
    """Span masking: starts ~Bernoulli(mask_prob), span mask_length.

    Statically-shaped redesign of compute_mask_indices_v2 (which draws an
    exact span count then randperms positions — data-dependent shapes)."""
    starts = jax.random.bernoulli(rng, cfg.mask_prob, (B, T))
    idx = jnp.arange(T)
    span = (idx[None, None, :] >= idx[None, :, None]) & \
           (idx[None, None, :] < idx[None, :, None] + cfg.mask_length)
    return jnp.einsum('bt,xtu->bu', starts.astype(jnp.float32),
                      span[0][None].astype(jnp.float32)) > 0


def bestrq_loss(params, encoder_apply, feats, feats_lens, rng,
                cfg: BestRQConfig):
    """Mask → encode → predict code ids at masked positions (CE).

    `feats` must already be CMVN-normalized (the reference applies the
    signal mean/istd itself and disables the encoder's CMVN —
    bestrq_model.py forward); `encoder_apply` must therefore not re-apply
    CMVN. Loss = masked CE / (Σmask · G) + λ·mean(feats²)
    (features_regularization)."""
    B, T, F = feats.shape
    k1, k2 = jax.random.split(rng)
    targets = bestrq_targets(params, feats, cfg)             # (B,T',G)
    Ts = targets.shape[1]
    mask = make_mask(k1, B, T, cfg)                          # (B,T)
    # one shared gaussian mask vector per call (bestrq_model.py mask_emb)
    noise = jax.random.normal(k2, (1, 1, F)) * 0.1
    masked_feats = jnp.where(mask[..., None], noise, feats)
    enc_out, enc_mask = encoder_apply(masked_feats, feats_lens)
    Tq = min(enc_out.shape[1], Ts)
    logits = linear(params['head'], enc_out[:, :Tq])
    logits = logits.reshape(B, Tq, cfg.num_codebooks, cfg.codebook_size)
    tgt = targets[:, :Tq]
    # only positions whose whole window was masked (and valid) contribute
    m_sub = subsampled_mask(mask, cfg.stack_frames, cfg.stride)[:, :Tq]
    valid = enc_mask[:, 0, :Tq] & m_sub
    loss, logp = bestrq_ce(logits, tgt, valid, cfg.num_codebooks)
    if cfg.features_regularization_weight:
        loss = loss + (cfg.features_regularization_weight
                       * jnp.mean(feats.astype(jnp.float32) ** 2))
    num_codes = jnp.maximum(jnp.sum(valid) * cfg.num_codebooks, 1)
    acc = jnp.sum(jnp.where(valid[..., None],
                            (jnp.argmax(logp, -1) == tgt), 0)) / num_codes
    return {'loss': loss, 'code_accuracy': acc, 'num_masked': jnp.sum(valid)}


def bestrq_ce(logits, targets, valid, num_codebooks: int):
    """Masked CE over code ids: Σ −log p[target] over valid positions,
    normalized by (Σvalid + 1e-5)·G (bestrq_model.py _compute_loss).
    logits (B,T',G,C), targets (B,T',G), valid (B,T')."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tok_lp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    denom = (jnp.sum(valid) + 1e-5) * num_codebooks
    loss = -jnp.sum(jnp.where(valid[..., None], tok_lp, 0.0)) / denom
    return loss, logp


# ------------------------------ wav2vec 2.0 ------------------------------

@dataclasses.dataclass(frozen=True)
class Wav2vec2Config:
    """Wav2vec2Model (ssl/wav2vec2/wav2vec2_model.py): masked contrastive
    prediction of gumbel-VQ quantized features + codebook diversity loss."""
    input_dim: int = 80
    encoder_output_size: int = 256
    num_codebooks: int = 2           # product quantizer groups
    codebook_size: int = 320
    codebook_dim: int = 128          # per-group code dim
    final_dim: int = 256             # contrastive projection dim
    mask_prob: float = 0.065
    mask_length: int = 10
    stack_frames: int = 4
    num_negatives: int = 25
    contrastive_temperature: float = 0.1
    diversity_weight: float = 0.1
    gumbel_temperature: float = 2.0


def init_wav2vec2(rng, cfg: Wav2vec2Config):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    d_in = cfg.input_dim * cfg.stack_frames
    qdim = cfg.num_codebooks * cfg.codebook_dim
    return {
        # trainable gumbel vector quantizer over stacked raw features
        'vq_proj': init_linear(k1, d_in,
                               cfg.num_codebooks * cfg.codebook_size),
        'vq_codebook': jax.random.normal(
            k2, (cfg.num_codebooks, cfg.codebook_size, cfg.codebook_dim))
        * 0.1,
        'proj_q': init_linear(k3, qdim, cfg.final_dim),
        'proj_c': init_linear(k4, cfg.encoder_output_size, cfg.final_dim),
    }


def _gumbel_quantize(params, x, rng, cfg: Wav2vec2Config, hard: bool = True):
    """x (B,T,d_in) → (quantized (B,T,K*Dc), avg code probs (K,C))."""
    logits = linear(params['vq_proj'], x).reshape(
        x.shape[0], x.shape[1], cfg.num_codebooks, cfg.codebook_size)
    g = -jnp.log(-jnp.log(
        jax.random.uniform(rng, logits.shape, minval=1e-6, maxval=1 - 1e-6)))
    y = jax.nn.softmax((logits + g) / cfg.gumbel_temperature, axis=-1)
    if hard:
        idx = jnp.argmax(y, axis=-1)
        onehot = jax.nn.one_hot(idx, cfg.codebook_size, dtype=y.dtype)
        y = onehot + y - jax.lax.stop_gradient(y)   # straight-through
    q = jnp.einsum('btkc,kcd->btkd', y, params['vq_codebook'])
    q = q.reshape(x.shape[0], x.shape[1], -1)
    probs = jnp.mean(jax.nn.softmax(logits, axis=-1), axis=(0, 1))  # (K,C)
    return q, probs


def wav2vec2_loss(params, encoder_apply, feats, feats_lens, rng,
                  cfg: Wav2vec2Config):
    """Mask spans → encode noised features → InfoNCE against the quantized
    targets of the masked positions (negatives sampled from the same
    utterance) + diversity loss pushing codebook usage to uniform."""
    B, T, F = feats.shape
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    Ts = T // cfg.stack_frames
    stacked = feats[:, :Ts * cfg.stack_frames].reshape(
        B, Ts, cfg.stack_frames * F)
    bcfg = BestRQConfig(mask_prob=cfg.mask_prob,
                        mask_length=cfg.mask_length,
                        stack_frames=cfg.stack_frames)
    mask = make_mask(k1, B, T, bcfg)                      # (B,T)
    noise = jax.random.normal(k2, feats.shape) * 0.1
    enc_out, enc_mask = encoder_apply(
        jnp.where(mask[..., None], noise, feats), feats_lens)
    Tq = min(enc_out.shape[1], Ts)

    q, code_probs = _gumbel_quantize(params, stacked[:, :Tq], k3, cfg)
    targets = linear(params['proj_q'], q)                  # (B,Tq,Df)
    context = linear(params['proj_c'], enc_out[:, :Tq])    # (B,Tq,Df)

    m_sub = mask[:, :Tq * cfg.stack_frames:cfg.stack_frames][:, :Tq]
    valid = enc_mask[:, 0, :Tq] & m_sub                    # (B,Tq)

    # Sample cfg.num_negatives distractor positions per anchor from the same
    # utterance, excluding the positive (wav2vec2_model.py sampled-negative
    # semantics; negatives whose quantized target equals the positive's are
    # masked out of the softmax, as in the reference).
    N = max(int(cfg.num_negatives), 1)
    neg_idx = jax.random.randint(k4, (B, Tq, N), 0, max(Tq - 1, 1))
    neg_idx = jnp.where(neg_idx >= jnp.arange(Tq)[None, :, None],
                        neg_idx + 1, neg_idx) % Tq           # skip positive
    negs = jax.vmap(lambda tg, idx: tg[idx])(targets, neg_idx)  # (B,Tq,N,Df)

    def unit(v):
        return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-8)

    cn, tn, nn = unit(context), unit(targets), unit(negs)
    pos_sim = jnp.einsum('btd,btd->bt', cn, tn)
    neg_sim = jnp.einsum('btd,btnd->btn', cn, nn)
    neg_is_pos = jnp.all(
        jnp.abs(negs - targets[:, :, None]) < 1e-6, axis=-1)  # (B,Tq,N)
    neg_invalid = ~jax.vmap(lambda v, idx: v[idx])(valid, neg_idx)
    neg_sim = jnp.where(neg_is_pos | neg_invalid, -jnp.inf, neg_sim)
    logits = jnp.concatenate([pos_sim[..., None], neg_sim],
                             axis=-1) / cfg.contrastive_temperature
    logp = jax.nn.log_softmax(logits, axis=-1)
    pos_lp = logp[..., 0]
    denom = jnp.maximum(jnp.sum(valid), 1)
    contrastive = -jnp.sum(jnp.where(valid, pos_lp, 0.0)) / denom
    # diversity: maximize softmax-prob entropy per codebook
    K, C = code_probs.shape
    entropy = -jnp.sum(code_probs * jnp.log(code_probs + 1e-9), axis=-1)
    diversity = jnp.sum((jnp.log(C) - entropy) / jnp.log(C))
    loss = contrastive + cfg.diversity_weight * diversity
    return {'loss': loss, 'loss_contrastive': contrastive,
            'loss_diversity': diversity, 'num_masked': jnp.sum(valid)}


def w2vbert_loss(params, encoder_apply, feats, feats_lens, rng,
                 w2v_cfg: Wav2vec2Config, mlm_cfg: BestRQConfig,
                 mlm_weight: float = 1.0, contrastive_weight: float = 1.0):
    """W2VBERTModel: contrastive (wav2vec2) + masked-prediction (bestrq)
    objectives over one shared encoder pass's mask."""
    k1, k2 = jax.random.split(rng)
    c = wav2vec2_loss(params, encoder_apply, feats, feats_lens, k1, w2v_cfg)
    m = bestrq_loss(params, encoder_apply, feats, feats_lens, k2, mlm_cfg)
    return {'loss': contrastive_weight * c['loss'] + mlm_weight * m['loss'],
            'loss_contrastive': c['loss_contrastive'],
            'loss_mlm': m['loss'], 'code_accuracy': m['code_accuracy']}
