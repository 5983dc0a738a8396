"""Ali-Paraformer SANM stack: LFR frontend, FSMN-memory attention, encoder,
decoder (+decoder3 tail block).

Parity targets (reference file:line):
  - LFR stack/skip frontend           asr/wenet/paraformer/layers.py:23-91
  - MultiHeadedAttentionSANM          paraformer/attention.py:8-114
  - DummyMultiHeadSANM (fsmn-only)    paraformer/attention.py:117-158
  - MultiHeadAttentionCross           paraformer/attention.py:161-217
  - PositionwiseFeedForwardDecoderSANM layers.py:94-122 (w_2 bias-free,
    LayerNorm between act and w_2)
  - AliParaformerEncoderLayer         layers.py:125-179 (norm1 over in_size;
    residual only when in_size==size)
  - SanmEncoder                       layers.py:182-295 (encoders0 maps the
    560-dim LFR features to output_size; whisper-style sinusoid pos table of
    width input_size, x scaled by sqrt(output_size))
  - SanmDecoderLayer / SanmDecoder    layers.py:310-495 (eps=1e-12 norms,
    FFN-without-residual feeding the fsmn block, decoders3 tail)

TPU design: LFR is one clamped gather (no per-row python padding), the fsmn
block is a depthwise NWC conv with asymmetric (left,right) padding, and every
forward is static-shape/jittable.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from reverb_tpu.models.modules import (depthwise_conv1d_ntc, dropout,
                                       init_conv1d, init_embedding,
                                       init_layer_norm, init_linear,
                                       layer_norm, linear)
from reverb_tpu.utils.common import make_pad_mask


@dataclasses.dataclass(frozen=True)
class SanmConfig:
    input_size: int = 560            # post-LFR feature dim (80 * m)
    output_size: int = 512
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 50
    decoder_blocks: int = 16
    vocab_size: int = 8404
    kernel_size: int = 11
    sanm_shift: int = 0
    dropout_rate: float = 0.1
    lfr_m: int = 7
    lfr_n: int = 6

    @property
    def fsmn_pad(self):
        left = (self.kernel_size - 1) // 2 + self.sanm_shift
        return (left, self.kernel_size - 1 - left)


# ------------------------------ LFR frontend ------------------------------

def lfr(x, x_lens, m: int = 7, n: int = 6):
    """Low-frame-rate stacking (layers.py:23-91): frame t of the output
    stacks input frames [t·n - ⌈(m-1)/2⌉, ... +m), head-padded with frame 0
    and tail-padded with the last valid frame.

    One clamped gather instead of the reference's concat+gather+unfold.
    x: (B, T, D) → (B, ⌈T/n⌉, D·m); new_lens = ⌈lens/n⌉.
    """
    B, T, D = x.shape
    left = (m - 1) // 2
    T_out = -(-T // n)
    t_idx = jnp.arange(T_out)[:, None] * n - left + jnp.arange(m)[None, :]
    idx = jnp.clip(t_idx[None], 0, jnp.maximum(x_lens, 1)[:, None, None] - 1)
    out = x[jnp.arange(B)[:, None, None], idx]              # (B, T_out, m, D)
    new_lens = -(-x_lens // n)
    return out.reshape(B, T_out, m * D), new_lens


def whisper_sinusoids(d_model: int, max_len: int = 5000) -> np.ndarray:
    """openai-whisper sinusoid table (transformer/embedding.py:446-460)."""
    inc = np.log(10000) / (d_model // 2 - 1)
    inv = np.exp(-inc * np.arange(d_model // 2))
    t = np.arange(max_len)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


# ------------------------------ fsmn / attention ------------------------------

def _fsmn(p, v, mask_pad, pad, rate=0.0, rng=None):
    """FSMN memory block (attention.py:64-85): mask → depthwise conv
    (asymmetric pad, no bias) → +residual → dropout → mask."""
    m = mask_pad[:, 0, :, None].astype(v.dtype)             # (B,T,1)
    v = v * m
    x = depthwise_conv1d_ntc(p, v, padding=pad) + v
    return dropout(x, rate, rng) * m


def init_sanm_attention(rng, in_feat: int, n_feat: int, k: int):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {'linear_q_k_v': init_linear(k1, in_feat, 3 * n_feat),
            'fsmn_block': init_conv1d(k2, n_feat, n_feat, k, groups=n_feat,
                                      bias=False),
            'linear_out': init_linear(k3, n_feat, n_feat)}


def sanm_self_attention(p, x, mask, mask_pad, cfg: SanmConfig, rngs=None):
    """MultiHeadedAttentionSANM.forward (attention.py:87-114):
    softmax(qkᵀ/√dk)·v → linear_out, plus the fsmn memory over v."""
    B, T, _ = x.shape
    H = cfg.attention_heads
    D = cfg.output_size
    dk = D // H
    qkv = linear(p['linear_q_k_v'], x)                      # (B,T,3D)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    fsmn = _fsmn(p['fsmn_block'], v, mask_pad, cfg.fsmn_pad,
                 cfg.dropout_rate, rngs.next() if rngs else None)
    q = q.reshape(B, T, H, dk).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, H, dk).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, H, dk).transpose(0, 2, 1, 3)
    scores = jnp.einsum('bhtd,bhsd->bhts', q, k) / math.sqrt(dk)
    scores = jnp.where(mask[:, None, :, :], scores.astype(jnp.float32),
                       -1e9)   # finite fill: padded query rows stay NaN-free
    att = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    att = jnp.where(mask[:, None, :, :], att, 0.0)
    ctx = jnp.einsum('bhts,bhsd->bhtd', att, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, D)
    return linear(p['linear_out'], ctx) + fsmn


def init_cross_attention(rng, n_feat: int, target_size: int):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {'linear_q': init_linear(k1, n_feat, n_feat),
            'linear_k_v': init_linear(k2, target_size, 2 * n_feat),
            'linear_out': init_linear(k3, n_feat, n_feat)}


def sanm_cross_attention(p, x, memory, memory_mask, cfg: SanmConfig):
    """MultiHeadAttentionCross.forward (attention.py:179-217): q from the
    decoder stream, fused k/v projection from the encoder memory."""
    B, T, _ = x.shape
    H = cfg.attention_heads
    D = cfg.output_size
    dk = D // H
    q = linear(p['linear_q'], x).reshape(B, T, H, dk).transpose(0, 2, 1, 3)
    kv = linear(p['linear_k_v'], memory)
    k, v = jnp.split(kv, 2, axis=-1)
    S = memory.shape[1]
    k = k.reshape(B, S, H, dk).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, H, dk).transpose(0, 2, 1, 3)
    scores = jnp.einsum('bhtd,bhsd->bhts', q * dk ** -0.5, k)
    scores = jnp.where(memory_mask[:, None, :, :].astype(bool),
                       scores.astype(jnp.float32), -1e9)
    att = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    att = jnp.where(memory_mask[:, None, :, :].astype(bool), att, 0.0)
    ctx = jnp.einsum('bhts,bhsd->bhtd', att, v)
    return linear(p['linear_out'], ctx.transpose(0, 2, 1, 3).reshape(B, T, D))


# ------------------------------ encoder ------------------------------

def _init_ffn(rng, d, hidden):
    k1, k2 = jax.random.split(rng)
    return {'w_1': init_linear(k1, d, hidden),
            'w_2': init_linear(k2, hidden, d)}


def init_sanm_encoder(rng, cfg: SanmConfig):
    ks = jax.random.split(rng, cfg.num_blocks + 1)

    def layer(k, in_size):
        k1, k2 = jax.random.split(k)
        return {'self_attn': init_sanm_attention(k1, in_size,
                                                 cfg.output_size,
                                                 cfg.kernel_size),
                'feed_forward': _init_ffn(k2, cfg.output_size,
                                          cfg.linear_units),
                'norm1': init_layer_norm(in_size),
                'norm2': init_layer_norm(cfg.output_size)}

    return {'encoders0': [layer(ks[0], cfg.input_size)],
            'encoders': [layer(ks[i + 1], cfg.output_size)
                         for i in range(cfg.num_blocks - 1)],
            'after_norm': init_layer_norm(cfg.output_size)}


def _ali_encoder_layer(p, x, mask, mask_pad, cfg: SanmConfig, in_size,
                       rngs=None):
    """AliParaformerEncoderLayer.forward (layers.py:143-179): pre-norm,
    residual skipped when the layer resizes (encoders0)."""
    residual = x
    xn = layer_norm(p['norm1'], x)
    att = sanm_self_attention(p['self_attn'], xn, mask, mask_pad, cfg, rngs)
    att = dropout(att, cfg.dropout_rate, rngs.next() if rngs else None)
    x = residual + att if in_size == cfg.output_size else att
    residual = x
    xn = layer_norm(p['norm2'], x)
    h = jax.nn.relu(linear(p['feed_forward']['w_1'], xn))
    h = dropout(h, cfg.dropout_rate, rngs.next() if rngs else None)
    h = linear(p['feed_forward']['w_2'], h)
    return residual + dropout(h, cfg.dropout_rate,
                              rngs.next() if rngs else None)


def sanm_encoder_forward(params, feats, feats_lens, cfg: SanmConfig,
                         cmvn=None, rngs=None):
    """LFR → CMVN → whisper-sinusoid pos (x·√output_size + pe) → encoders0 →
    encoders → after_norm (layers.py:182-295).  feats: raw (B, T, 80)."""
    x, lens = lfr(feats, feats_lens, cfg.lfr_m, cfg.lfr_n)
    if cmvn is not None:
        mean, istd = cmvn
        x = (x - mean.astype(x.dtype)) * istd.astype(x.dtype)
    T = x.shape[1]
    masks = (~make_pad_mask(lens, T))[:, None, :]           # (B,1,T)
    # ParaformerPositinoalEncoding: whisper sinusoid table of width
    # input_size added to x, xscale = sqrt(output_size); "Paraformer starts
    # from 1" — the table is read at offset+1
    # (paraformer/embedding.py:4-14, paraformer/subsampling.py:38-43)
    pe = jnp.asarray(whisper_sinusoids(cfg.input_size))[None, 1:T + 1]
    x = x * math.sqrt(cfg.output_size) + pe.astype(x.dtype)
    x = dropout(x, cfg.dropout_rate, rngs.next() if rngs else None)
    att_mask = masks & masks.transpose(0, 2, 1)             # (B,T,T)
    x = _ali_encoder_layer(params['encoders0'][0], x, att_mask, masks, cfg,
                           cfg.input_size, rngs)
    for lp in params['encoders']:
        x = _ali_encoder_layer(lp, x, att_mask, masks, cfg, cfg.output_size,
                               rngs)
    return layer_norm(params['after_norm'], x), masks


# ------------------------------ decoder ------------------------------

def init_sanm_decoder(rng, cfg: SanmConfig):
    ks = jax.random.split(rng, cfg.decoder_blocks + 4)

    def dec_layer(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        d = cfg.output_size
        return {'self_attn': {'fsmn_block': init_conv1d(
                    k1, d, d, cfg.kernel_size, groups=d, bias=False)},
                'src_attn': init_cross_attention(k2, d, d),
                'feed_forward': {
                    'w_1': init_linear(k3, d, cfg.linear_units),
                    'w_2': init_linear(k4, cfg.linear_units, d, bias=False),
                    'norm': init_layer_norm(cfg.linear_units)},
                'norm1': init_layer_norm(d), 'norm2': init_layer_norm(d),
                'norm3': init_layer_norm(d)}

    k_ffn1, k_ffn2 = jax.random.split(ks[-3])
    return {'embed': {'0': init_embedding(ks[-1], cfg.vocab_size,
                                          cfg.output_size)},
            'decoders': [dec_layer(ks[i]) for i in range(cfg.decoder_blocks)],
            'decoders3': [{'feed_forward': {
                'w_1': init_linear(k_ffn1, cfg.output_size, cfg.linear_units),
                'w_2': init_linear(k_ffn2, cfg.linear_units, cfg.output_size,
                                   bias=False),
                'norm': init_layer_norm(cfg.linear_units)},
                'norm1': init_layer_norm(cfg.output_size)}],
            'after_norm': init_layer_norm(cfg.output_size),
            'output_layer': init_linear(ks[-2], cfg.output_size,
                                        cfg.vocab_size)}


def _ffn_decoder_sanm(p, x, cfg: SanmConfig, rngs=None):
    """w_2(LayerNorm(dropout(relu(w_1 x)))) — w_2 bias-free
    (layers.py:94-122)."""
    h = jax.nn.relu(linear(p['w_1'], x))
    h = dropout(h, cfg.dropout_rate, rngs.next() if rngs else None)
    return linear(p['w_2'], layer_norm(p['norm'], h))


def sanm_decoder_forward(params, memory, memory_mask, sematic_embeds,
                         ys_lens, cfg: SanmConfig, rngs=None):
    """SanmDecoder.forward (layers.py:445-480): NAR single pass over the
    CIF-fired semantic embeddings; norms use eps=1e-12."""
    x = sematic_embeds
    T = x.shape[1]
    tgt_mask = (~make_pad_mask(ys_lens, T))[:, None, :]     # (B,1,T)
    for p in params['decoders']:
        residual = x
        xn = layer_norm(p['norm1'], x, eps=1e-12)
        tgt = _ffn_decoder_sanm(p['feed_forward'], xn, cfg, rngs)
        # DummyMultiHeadSANM: fsmn block only (attention.py:133-158)
        tn = layer_norm(p['norm2'], tgt, eps=1e-12)
        f = _fsmn(p['self_attn']['fsmn_block'], tn, tgt_mask, cfg.fsmn_pad,
                  cfg.dropout_rate, rngs.next() if rngs else None)
        x = residual + dropout(f, cfg.dropout_rate,
                               rngs.next() if rngs else None)
        residual = x
        xn = layer_norm(p['norm3'], x, eps=1e-12)
        c = sanm_cross_attention(p['src_attn'], xn, memory, memory_mask, cfg)
        x = residual + dropout(c, cfg.dropout_rate,
                               rngs.next() if rngs else None)
    for p in params['decoders3']:
        x = _ffn_decoder_sanm(p['feed_forward'],
                              layer_norm(p['norm1'], x, eps=1e-12), cfg, rngs)
    x = layer_norm(params['after_norm'], x)
    return linear(params['output_layer'], x)


def sanm_forward_paraformer(params, feats, feats_lens, cfg: SanmConfig,
                            cif_cfg, max_tokens: int = 512, cmvn=None):
    """`Paraformer.forward_paraformer` (paraformer.py:296-356): encoder →
    CIF predictor with inference tail handling → NAR decoder → log-softmax.

    Returns (decoder_out (B,U,V) log-probs, decoder_out_lens (B,) int32,
    tp_alphas (B, T·u) — zeros when the checkpoint has no timestamp
    branch)."""
    from reverb_tpu.models.paraformer import (cif_alphas, cif_fire,
                                              cif_tail_process,
                                              tp_alphas_forward)
    enc, mask = sanm_encoder_forward(params['encoder'], feats, feats_lens,
                                     cfg, cmvn=cmvn)
    alphas = cif_alphas(params['predictor'], enc, mask, cif_cfg)
    hidden = enc
    if cif_cfg.tail_threshold > 0.0:
        hidden, alphas, token_num = cif_tail_process(
            enc, alphas, mask[:, 0, :], cif_cfg.tail_threshold)
    else:
        token_num = jnp.floor(jnp.sum(alphas, axis=-1))
    token_num = jnp.minimum(token_num.astype(jnp.int32), max_tokens)
    fired, _ = cif_fire(hidden, alphas, max_tokens, cif_cfg.threshold)
    logits = sanm_decoder_forward(params['decoder'], enc, mask, fired,
                                  token_num, cfg)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if 'tp_output' in params['predictor']:
        tp = tp_alphas_forward(params['predictor'], enc, mask, cif_cfg)
    else:
        tp = jnp.zeros((enc.shape[0],
                        enc.shape[1] * cif_cfg.upsample_times), jnp.float32)
    return logp, token_num, tp


def sanm_greedy_decode(params, feats, feats_lens, cfg: SanmConfig,
                       cif_cfg, max_tokens: int = 200, cmvn=None):
    """NAR inference: per-position argmax over `sanm_forward_paraformer`;
    returns (tokens (B,U), decoder_out_lens (B,))."""
    logp, token_num, _ = sanm_forward_paraformer(
        params, feats, feats_lens, cfg, cif_cfg, max_tokens, cmvn)
    return jnp.argmax(logp, axis=-1), token_num
