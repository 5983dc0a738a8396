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
    """Wav2vec2Model (ssl/wav2vec2/wav2vec2_model.py:105-324): masked
    contrastive prediction of gumbel-VQ quantized subsampled features.
    Field names follow the reference constructor (num_embeddings →
    codebook_size; embedding_dim is the TOTAL codevector dim and must equal
    the encoder output size for the cosine similarity)."""
    encoder_output_size: int = 256
    num_codebooks: int = 1
    codebook_size: int = 320          # num_embeddings per codebook
    embedding_dim: int = 256          # total codevector dim (= G · per-group)
    mask_prob: float = 0.065
    mask_length: int = 10
    min_masks: int = 2
    num_negatives: int = 100
    features_regularization_weight: float = 0.01
    max_gumbel_temperature: float = 2.0
    min_gumbel_temperature: float = 0.1
    gumbel_temperature_decay: float = 0.999995
    contrastive_temperature: float = 0.1
    diversity_weight: float = 0.0


@dataclasses.dataclass(frozen=True)
class W2VBertConfig:
    """W2VBERTModel extras (ssl/w2vbert/w2vbert_model.py:16-120): the block
    split (contrastive branch taps the stack mid-way), branch weights, and
    the mlm warmup schedule."""
    contrastive_blocks: int = 6
    masked_blocks: int = 6
    contrastive_weight: float = 1.0
    mlm_weight: float = 1.0
    warmup_steps: int = 25000
    bias: bool = True


def init_wav2vec2(rng, cfg: Wav2vec2Config):
    from reverb_tpu.models.modules import init_linear as _init_linear
    k1, k2, k3 = jax.random.split(rng, 3)
    G, C = cfg.num_codebooks, cfg.codebook_size
    d = cfg.embedding_dim // G
    return {
        # Wav2vecGumbelVectorQuantizer (quantizer.py:26-52): embeddings
        # uniform_[0,1), weight_proj default Linear init
        'vq_proj': _init_linear(k1, cfg.encoder_output_size, G * C),
        'vq_codebook': jax.random.uniform(k2, (G, C, d)),
        # trained span-mask embedding (wav2vec2_model.py:174-177)
        'mask_emb': jax.random.uniform(k3, (cfg.encoder_output_size,)),
    }


def init_w2vbert(rng, cfg: Wav2vec2Config, bcfg: W2VBertConfig):
    from reverb_tpu.models.modules import init_linear as _init_linear
    k1, k2, k3 = jax.random.split(rng, 3)
    G, C = cfg.num_codebooks, cfg.codebook_size
    d = cfg.embedding_dim // G
    D = cfg.encoder_output_size
    params = {
        'vq_proj': _init_linear(k1, D, G * C),
        'vq_codebook': jax.random.uniform(k2, (G, C, d)),
        # per-codebook mlm head (w2vbert_model.py:112-120)
        'top_n_out': 0.02 * jax.random.truncated_normal(
            k3, -2.0, 2.0, (G, D, C)),
    }
    if bcfg.bias:
        params['top_n_out_bias'] = jnp.zeros((G, C))
    return params


def ssl_subsample(enc_params, feats, feats_lens, ecfg, cmvn=None):
    """_forward_subsampling (wav2vec2_model.py:302-310): global CMVN +
    the encoder's subsampling embed. → (xs (B,T',D), pos_emb, masks)."""
    from reverb_tpu.models.encoder import SUBSAMPLE_FNS
    from reverb_tpu.utils.common import make_pad_mask
    B, T, _ = feats.shape
    masks = (~make_pad_mask(feats_lens, T))[:, None, :]
    if cmvn is not None:
        mean, istd = cmvn
        feats = (feats - mean.astype(feats.dtype)) * istd.astype(feats.dtype)
    sub_fn = SUBSAMPLE_FNS[ecfg.input_layer]
    xs, pos_emb, masks = sub_fn(enc_params['embed'], feats, masks, ecfg, 0,
                                None)
    return xs, pos_emb, masks


def ssl_encoder_blocks(enc_params, xs, masks, pos_emb, ecfg, split=None):
    """_forward_encoder_blocks (wav2vec2_model.py:312-324 /
    w2vbert_model.py:296-318): plain-pad-mask block stack (no chunk mask).
    Returns (mid_out_after_`split`_blocks, final_out_after_norm); without a
    split both are the final output."""
    from reverb_tpu.models.encoder import conformer_layer, transformer_layer
    from reverb_tpu.models.modules import layer_norm
    layer_fn = (conformer_layer if ecfg.encoder_type == 'conformer'
                else transformer_layer)
    mid = None
    for i, lp in enumerate(enc_params['encoders']):
        xs, _, _ = layer_fn(lp, xs, masks, pos_emb, masks, ecfg)
        if split is not None and i == split - 1:
            mid = xs
    if ecfg.normalize_before:
        xs = layer_norm(enc_params['after_norm'], xs)
    return (xs if mid is None else mid), xs


def gumbel_quantize(params, x, valid_mask, rng, temperature,
                    cfg: Wav2vec2Config, gumbels=None):
    """Wav2vecGumbelVectorQuantizer.forward, hard=False (quantizer.py:70-113).

    x: (B,T,D) UNMASKED subsampled features; valid_mask: (B,T) pad mask.
    Returns (codevectors (B,T,embedding_dim) — the gumbel-softmax-weighted
    codebook mix, differentiable, no straight-through —, perplexity over
    valid frames, targets_idx (B,T,G))."""
    from reverb_tpu.models.modules import linear as _linear
    B, T, _ = x.shape
    G, C = cfg.num_codebooks, cfg.codebook_size
    logits = _linear(params['vq_proj'], x).reshape(B, T, G, C)
    logits = logits.astype(jnp.float32)
    if gumbels is None:
        u = jax.random.uniform(rng, logits.shape,
                               minval=jnp.finfo(jnp.float32).tiny, maxval=1.0)
        gumbels = -jnp.log(-jnp.log(u))
    probs = jax.nn.softmax((logits + gumbels) / temperature, axis=-1)
    soft = jax.nn.softmax(logits, axis=-1)
    vm = valid_mask[..., None, None]
    marginal = (jnp.sum(jnp.where(vm, soft, 0.0), axis=(0, 1))
                / jnp.maximum(jnp.sum(valid_mask), 1))          # (G,C)
    perplexity = jnp.sum(jnp.exp(-jnp.sum(
        marginal * jnp.log(marginal + 1e-7), axis=-1)))
    targets_idx = jnp.argmax(probs, axis=-1)                    # (B,T,G)
    cv = jnp.einsum('btgc,gcd->btgd', probs,
                    params['vq_codebook'].astype(probs.dtype))
    return cv.reshape(B, T, -1), perplexity, targets_idx


def sample_negative_indices(rng, span_mask, num_negatives: int,
                            neg_pos=None):
    """Per-anchor negatives drawn from the MASKED positions of the same
    utterance (wav2vec2_model.py:15-55): ordinal i ~ U[0, n_masked-1) with
    the fairseq collision shift vs the anchor's own masked ordinal, then
    remapped to frame positions.  Returns (B, T, N) frame positions
    (garbage at unmasked anchors — their CE rows are masked out).
    Static-shape redesign of the reference's per-utterance python loop."""
    B, T = span_mask.shape
    if neg_pos is not None:
        return neg_pos
    pos = jnp.arange(T)
    # masked positions compacted to the front, stable
    order = jnp.argsort(jnp.where(span_mask, pos, pos + T), axis=1)
    rank = jnp.cumsum(span_mask, axis=1) - 1                    # (B,T)
    cnt = jnp.sum(span_mask, axis=1)                            # (B,)
    high = jnp.maximum(cnt - 1, 1)[:, None, None]
    i = jax.random.randint(rng, (B, T, num_negatives), 0, high)
    i = jnp.where(i >= rank[..., None], i + 1, i)
    i = jnp.minimum(i, jnp.maximum(cnt, 1)[:, None, None] - 1)
    return jnp.take_along_axis(order, i.reshape(B, -1),
                               axis=1).reshape(B, T, num_negatives)


def contrastive_loss(quantized, context, neg_pos, span_mask,
                     temperature: float):
    """_compute_contrastive_loss (wav2vec2_model.py:58-102): cosine
    similarity of the context vector against [positive ; negatives] at
    `temperature`, value-collision negatives squashed to -1e9, CE toward
    the positive SUM-reduced over masked anchors."""
    B, T, D = quantized.shape
    N = neg_pos.shape[-1]
    negs = jnp.take_along_axis(
        quantized, neg_pos.reshape(B, -1)[:, :, None], axis=1)
    negs = negs.reshape(B, T, N, D).transpose(2, 0, 1, 3)       # (N,B,T,D)
    targets = jnp.concatenate([quantized[None], negs], axis=0)  # (N+1,B,T,D)
    cf = context[None].astype(jnp.float32)
    tf = targets.astype(jnp.float32)
    num = jnp.sum(cf * tf, axis=-1)
    den = jnp.maximum(jnp.linalg.norm(cf, axis=-1)
                      * jnp.linalg.norm(tf, axis=-1), 1e-8)
    logits = (num / den) / temperature                          # (N+1,B,T)
    neg_is_pos = jnp.all(quantized[None] == negs, axis=-1)      # (N,B,T)
    logits = jnp.concatenate(
        [logits[:1], jnp.where(neg_is_pos, -1e9, logits[1:])], axis=0)
    ce = -jax.nn.log_softmax(logits, axis=0)[0]                 # (B,T)
    return jnp.sum(jnp.where(span_mask, ce, 0.0))


def _gumbel_temperature(cfg: Wav2vec2Config, steps):
    return jnp.maximum(
        cfg.max_gumbel_temperature
        * cfg.gumbel_temperature_decay ** steps,
        cfg.min_gumbel_temperature)


def wav2vec2_loss(params, enc_params, feats, feats_lens, rng,
                  cfg: Wav2vec2Config, ecfg, steps=0, cmvn=None,
                  span_mask=None, neg_pos=None, gumbels=None):
    """Wav2vec2Model.forward (wav2vec2_model.py:220-283): subsample →
    replace masked spans with the TRAINED mask_emb → encoder blocks →
    InfoNCE against gumbel-quantized unmasked features (negatives from
    masked positions), + perplexity diversity + features L2.

    span_mask/neg_pos/gumbels inject fixed draws (oracle tests)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    xs, pos_emb, masks = ssl_subsample(enc_params, feats, feats_lens, ecfg,
                                       cmvn=cmvn)
    unmasked_xs = xs
    B, Tz, _ = xs.shape
    valid = masks[:, 0, :]
    if span_mask is None:
        bcfg = BestRQConfig(mask_prob=cfg.mask_prob,
                            mask_length=cfg.mask_length)
        span_mask = make_mask(k1, B, Tz, bcfg) & valid
    masked_xs = jnp.where(span_mask[..., None],
                          params['mask_emb'].astype(xs.dtype), xs)
    _, out = ssl_encoder_blocks(enc_params, masked_xs, masks, pos_emb, ecfg)

    temp = _gumbel_temperature(cfg, steps)
    quantized, perplexity, _ = gumbel_quantize(params, unmasked_xs, valid,
                                               k2, temp, cfg,
                                               gumbels=gumbels)
    neg_pos = sample_negative_indices(k3, span_mask, cfg.num_negatives,
                                      neg_pos=neg_pos)
    closs = contrastive_loss(quantized, out, neg_pos, span_mask,
                             cfg.contrastive_temperature)
    sample_size = jnp.maximum(jnp.sum(span_mask), 1)
    loss = closs
    G, C = cfg.num_codebooks, cfg.codebook_size
    diversity = (G * C - perplexity) / (C * G)
    if cfg.diversity_weight != 0.0:
        loss = loss + cfg.diversity_weight * diversity * sample_size
    loss = loss / sample_size
    features_pen = jnp.mean(unmasked_xs.astype(jnp.float32) ** 2)
    if cfg.features_regularization_weight != 0.0:
        loss = loss + cfg.features_regularization_weight * features_pen
    # reference reports the sample_size-scaled diversity term
    # (wav2vec2_model.py:262-268)
    return {'loss': loss, 'loss_contrastive': closs / sample_size,
            'loss_diversity': diversity * sample_size,
            'code_ppl': perplexity, 'features_l2': features_pen,
            'num_masked': jnp.sum(span_mask)}


def w2vbert_loss(params, enc_params, feats, feats_lens, rng,
                 cfg: Wav2vec2Config, bcfg: W2VBertConfig, ecfg, steps=0,
                 cmvn=None, span_mask=None, neg_pos=None, gumbels=None,
                 mask_noise=None):
    """W2VBERTModel.forward (w2vbert_model.py:161-251): ONE encoder pass,
    contrastive branch tapped after `contrastive_blocks`, mlm branch on the
    final output; masked spans replaced with random N(0, 0.1) (not a
    trained mask_emb); mlm targets are the gumbel quantizer's ids; mlm
    weight warms up 0.1→mlm_weight over warmup_steps."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    xs, pos_emb, masks = ssl_subsample(enc_params, feats, feats_lens, ecfg,
                                       cmvn=cmvn)
    unmasked_xs = xs
    B, Tz, _ = xs.shape
    valid = masks[:, 0, :]
    if span_mask is None:
        mcfg = BestRQConfig(mask_prob=cfg.mask_prob,
                            mask_length=cfg.mask_length)
        span_mask = make_mask(k1, B, Tz, mcfg) & valid
    if mask_noise is None:
        mask_noise = jax.random.normal(k2, xs.shape, jnp.float32) * 0.1
    masked_xs = jnp.where(span_mask[..., None], mask_noise.astype(xs.dtype),
                          xs)
    cvec, mvec = ssl_encoder_blocks(enc_params, masked_xs, masks, pos_emb,
                                    ecfg, split=bcfg.contrastive_blocks)

    temp = _gumbel_temperature(cfg, steps)
    quantized, perplexity, targets_idx = gumbel_quantize(
        params, unmasked_xs, valid, k3, temp, cfg, gumbels=gumbels)
    neg_pos = sample_negative_indices(k4, span_mask, cfg.num_negatives,
                                      neg_pos=neg_pos)
    closs = contrastive_loss(quantized, cvec, neg_pos, span_mask,
                             cfg.contrastive_temperature)
    sample_size = jnp.maximum(jnp.sum(span_mask), 1)
    loss_c = closs
    G, C = cfg.num_codebooks, cfg.codebook_size
    diversity = (G * C - perplexity) / (C * G)
    if cfg.diversity_weight != 0.0:
        loss_c = loss_c + cfg.diversity_weight * diversity * sample_size
    loss_c = loss_c / sample_size
    features_pen = jnp.mean(unmasked_xs.astype(jnp.float32) ** 2)
    if cfg.features_regularization_weight != 0.0:
        loss_c = loss_c + cfg.features_regularization_weight * features_pen

    # mlm branch (w2vbert_model.py:220-235): per-codebook linear heads on
    # the final output, CE toward the quantizer ids at masked positions
    logits = jnp.einsum('btd,gdc->bgtc', mvec.astype(jnp.float32),
                        params['top_n_out'].astype(jnp.float32))
    if 'top_n_out_bias' in params:
        logits = logits + params['top_n_out_bias'][None, :, None, :]
    logp = jax.nn.log_softmax(logits, axis=-1).transpose(0, 2, 1, 3)
    tok_lp = jnp.take_along_axis(logp, targets_idx[..., None],
                                 axis=-1)[..., 0]               # (B,T,G)
    mlm_mask = (valid & span_mask).astype(jnp.float32)
    loss_mlm = (-jnp.sum(tok_lp * mlm_mask[..., None])
                / ((jnp.sum(mlm_mask) + 1e-5) * G))
    num_codes = jnp.maximum(jnp.sum(span_mask) * G, 1)
    pred = jnp.argmax(logits, axis=-1).transpose(0, 2, 1)       # (B,T,G)
    codes_acc = jnp.sum((pred == targets_idx)
                        * span_mask[..., None]) / num_codes

    steps = jnp.asarray(steps, jnp.float32)
    mlm_w = jnp.where(steps >= bcfg.warmup_steps, bcfg.mlm_weight,
                      0.1 + 0.9 * steps / bcfg.warmup_steps)
    loss = bcfg.contrastive_weight * loss_c + mlm_w * loss_mlm
    return {'loss': loss, 'loss_contrastive': closs / sample_size,
            'loss_diversity': diversity * sample_size, 'loss_mlm': loss_mlm,
            'code_ppl': perplexity, 'codes_acc': codes_acc,
            'features_l2': features_pen, 'num_masked': jnp.sum(span_mask)}
