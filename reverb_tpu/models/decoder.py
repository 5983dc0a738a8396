"""(Bi)Transformer decoder with Language-Specific Layers.

Parity targets:
  - DecoderLayer                     asr/wenet/transformer/decoder_layer.py:22-133
  - LanguageSpecificDecoderLayer     decoder_layer.py:209-340
      * LayerNorm eps=1e-12 (vs 1e-5 elsewhere) — decoder_layer.py:241-243
      * LSL mix before FFN, NO trailing x = x + y (unlike the encoder LSL)
  - TransformerDecoder               asr/wenet/transformer/decoder.py:33-234
  - LanguageSpecificTransformerDecoder  decoder.py:308-383 (LSL first+last)
  - BiTransformerDecoder             decoder.py:386-522

`decoder_forward` is the batched teacher-forced pass (training + rescoring);
`decoder_forward_one_step` is the incremental step used by attention beam
search, with a static-shape activation cache per layer.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from reverb_tpu.models import attention as att
from reverb_tpu.models import embedding as emb
from reverb_tpu.models.modules import (ACTIVATIONS, Rngs, dropout, embedding,
                                       layer_norm, linear, remat_policy)
from reverb_tpu.utils.common import make_pad_mask, subsequent_mask


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 5000
    encoder_output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    r_num_blocks: int = 0
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    input_layer: str = 'embed'
    use_output_layer: bool = True
    normalize_before: bool = True
    src_attention: bool = True
    key_bias: bool = True
    activation_type: str = 'relu'
    num_langs: int = 0           # >0 → first+last layers are LSL
    decoder_type: str = 'bitransformer'   # 'transformer' | 'bitransformer'
    tie_word_embedding: bool = False
    gradient_checkpointing: bool = False
    remat_policy: str = 'dots'        # 'full' | 'dots' (see encoder.py)
    # activation dtype for the decoder stack (AMP / bf16 serving).  The
    # stack's dtype is otherwise set by the f32 embedding table — which
    # silently ran every decoder matmul in f32 even when the encoder was
    # bf16 (weights are cast to x.dtype inside modules.linear).
    compute_dtype: Optional[type] = None


def _layer_is_lsl(cfg: DecoderConfig, i: int, n_blocks: int) -> bool:
    return cfg.num_langs > 0 and (i == 0 or i == n_blocks - 1)


def _lsl_mix(lang_params, x, cat_embs):
    ys = jnp.stack([linear(lp, x) for lp in lang_params], axis=0)
    if cat_embs.ndim == 1:
        w = cat_embs.astype(x.dtype)[:, None, None, None]
    else:
        w = cat_embs.astype(x.dtype).T[:, :, None, None]
    return jnp.sum(w * ys, axis=0)


def decoder_layer(p, x, tgt_mask, memory, memory_mask, cfg: DecoderConfig,
                  cat_embs=None, rngs: Rngs | None = None,
                  is_lsl: bool = False, q_slice: Optional[int] = None,
                  return_src_attn: bool = False, mem_kv=None,
                  mem_group: Optional[int] = None):
    """One decoder block. If q_slice is not None, only the query at position
    q_slice attends (incremental decoding); x is still the full (B,L,D) buffer.
    Returns the per-position output (B,L,D) or (B,1,D) when q_slice set; with
    return_src_attn also the cross-attention weights (B,H,Tq,Tmem) — the
    reference's forward_one_step_with_attn surface (decoder.py:236-281)."""
    eps = 1e-12 if is_lsl else 1e-5
    rate = cfg.dropout_rate

    def drop(v):
        return dropout(v, rate, rngs.next() if rngs else None)

    residual = x
    xn = layer_norm(p['norm1'], x, eps)
    if q_slice is None:
        tgt_q, q_mask, res_q = xn, tgt_mask, residual
    else:
        tgt_q = jax.lax.dynamic_slice_in_dim(xn, q_slice, 1, axis=1)
        res_q = jax.lax.dynamic_slice_in_dim(residual, q_slice, 1, axis=1)
        q_mask = jax.lax.dynamic_slice_in_dim(tgt_mask, q_slice, 1, axis=1)
    sa, _ = att.mha(p['self_attn'], tgt_q, xn, xn, q_mask,
                    cfg.attention_heads, cfg.self_attention_dropout_rate,
                    rngs.next() if rngs else None)
    x = res_q + drop(sa)

    src_attn_w = None
    if cfg.src_attention:
        residual = x
        xn = layer_norm(p['norm2'], x, eps)
        if return_src_attn:
            ca, _, src_attn_w = att.mha(
                p['src_attn'], xn, memory, memory, memory_mask,
                cfg.attention_heads, cfg.src_attention_dropout_rate,
                rngs.next() if rngs else None, return_weights=True)
        elif mem_kv is not None and mem_group is not None:
            # K/V precomputed per utterance (B,H,T,dk); each consecutive
            # group of `mem_group` hyp rows shares one utterance's memory —
            # grouped nbest rescoring with all ops ≤4-D (attention.py)
            ca = att.mha_shared_kv_grouped(p['src_attn'], xn, mem_kv,
                                           memory_mask,
                                           cfg.attention_heads, mem_group)
        elif mem_kv is not None:
            # K/V precomputed once for the shared memory (nbest rescoring)
            ca = att.mha_shared_kv(p['src_attn'], xn, mem_kv, memory_mask,
                                   cfg.attention_heads)
        else:
            ca, _ = att.mha(p['src_attn'], xn, memory, memory, memory_mask,
                            cfg.attention_heads,
                            cfg.src_attention_dropout_rate,
                            rngs.next() if rngs else None)
        x = residual + drop(ca)

    residual = x
    xn = layer_norm(p['norm3'], x, eps)
    act = ACTIVATIONS[cfg.activation_type]
    if is_lsl:
        assert cat_embs is not None, "LSL decoder layer requires cat_embs"
        y = _lsl_mix(p['language_layers'], xn, cat_embs)
        h = linear(p['feed_forward']['w_2'],
                   dropout(act(linear(p['feed_forward']['w_1'], y)), rate,
                           rngs.next() if rngs else None))
        x = residual + drop(h)
        # NOTE: no trailing +y here (decoder_layer.py:332-340)
    else:
        h = linear(p['feed_forward']['w_2'],
                   dropout(act(linear(p['feed_forward']['w_1'], xn)), rate,
                           rngs.next() if rngs else None))
        x = residual + drop(h)
    if return_src_attn:
        return x, src_attn_w
    return x


def _single_decoder_forward(p, memory, memory_mask, ys_in_pad, ys_in_lens,
                            cfg: DecoderConfig, n_blocks: int,
                            cat_embs=None, rngs=None, mem_kv=None,
                            mem_group=None):
    """L2R or R2L stack: embed+abs-pos → N layers → after_norm → output_layer."""
    tgt = ys_in_pad
    L = tgt.shape[1]
    tgt_mask = (~make_pad_mask(ys_in_lens, L))[:, None, :]       # (B,1,L)
    tgt_mask = tgt_mask & subsequent_mask(L)[None]               # (B,L,L)
    x = embedding(p['embed']['0'], tgt)
    x, _ = emb.abs_position_encoding(x, 0, cfg.positional_dropout_rate,
                                     rngs.next() if rngs else None)
    if cfg.compute_dtype is not None:
        x = x.astype(cfg.compute_dtype)
    for i, lp in enumerate(p['decoders']):
        if cfg.gradient_checkpointing and rngs is not None:
            # per-layer dropout key passed explicitly so remat replay
            # re-derives identical keys (see encoder.py remat note)
            def step(v, key, lp=lp, i=i):
                return decoder_layer(lp, v, tgt_mask, memory, memory_mask,
                                     cfg, cat_embs, Rngs(key),
                                     is_lsl=_layer_is_lsl(cfg, i, n_blocks))
            x = jax.checkpoint(
                step, policy=remat_policy(cfg.remat_policy))(x, rngs.next())
        else:
            x = decoder_layer(lp, x, tgt_mask, memory, memory_mask, cfg,
                              cat_embs, rngs,
                              is_lsl=_layer_is_lsl(cfg, i, n_blocks),
                              mem_kv=mem_kv[i] if mem_kv is not None else None,
                              mem_group=mem_group)
    if cfg.normalize_before:
        x = layer_norm(p['after_norm'], x)
    if cfg.use_output_layer:
        x = linear(p['output_layer'], x)
    return x


def decoder_forward(params, memory, memory_mask, ys_in_pad, ys_in_lens,
                    r_ys_in_pad=None, reverse_weight: float = 0.0,
                    cfg: DecoderConfig = DecoderConfig(),
                    cat_embs=None, rngs=None, mem_kv=None, r_mem_kv=None,
                    mem_group=None):
    """BiTransformerDecoder.forward (decoder.py:462-496).

    mem_kv/r_mem_kv: optional per-layer precomputed shared cross-attention
    K/V (attention.cross_kv) for the left/right stacks — used by nbest
    rescoring where all hyps share one utterance's memory.

    Returns (l_x (B,L,V), r_x (B,L,V) or 0.0 scalar)."""
    if cfg.decoder_type == 'bitransformer':
        l_x = _single_decoder_forward(params['left_decoder'], memory,
                                      memory_mask, ys_in_pad, ys_in_lens, cfg,
                                      cfg.num_blocks, cat_embs, rngs, mem_kv,
                                      mem_group)
        if reverse_weight > 0.0 and cfg.r_num_blocks > 0:
            r_x = _single_decoder_forward(params['right_decoder'], memory,
                                          memory_mask, r_ys_in_pad, ys_in_lens,
                                          cfg, cfg.r_num_blocks, cat_embs,
                                          rngs, r_mem_kv, mem_group)
        else:
            r_x = jnp.zeros((), dtype=memory.dtype)
        return l_x, r_x
    l_x = _single_decoder_forward(params, memory, memory_mask, ys_in_pad,
                                  ys_in_lens, cfg, cfg.num_blocks, cat_embs,
                                  rngs, mem_kv, mem_group)
    return l_x, jnp.zeros((), dtype=memory.dtype)


def decoder_forward_one_step(params, memory, memory_mask, tgt_buf, step,
                             cache, cfg: DecoderConfig, cat_embs=None,
                             return_src_attn: bool = False, mem_kv=None):
    """Incremental decode step over a static-size token buffer.

    tgt_buf: (B, Lmax) int32 with tokens [0..step] valid; step: traced scalar.
    cache: (n_layers, B, Lmax, D) per-layer outputs for positions < step
           (activation cache, decoder.py:191-234 semantics), or zeros at step 0.
    Returns (logp (B,V) float32, new_cache).

    Each layer self-attends with query = position `step`, keys = all positions
    <= step (masked), so one step is O(L) attention — same math as the
    reference's growing-cache forward_one_step but with static shapes.
    """
    p = params['left_decoder'] if cfg.decoder_type == 'bitransformer' else params
    B, Lmax = tgt_buf.shape
    x = embedding(p['embed']['0'], tgt_buf)
    x, _ = emb.abs_position_encoding(x, 0, 0.0, None)
    if cfg.compute_dtype is not None:
        x = x.astype(cfg.compute_dtype)
    pos = jnp.arange(Lmax)
    valid = (pos[None, :] <= step)                       # (1, Lmax)
    tgt_mask = jnp.broadcast_to(valid, (B, Lmax))[:, None, :]   # (B,1,Lmax)

    n_blocks = cfg.num_blocks
    new_cache = []
    # cache[i] holds layer i's outputs for positions < step; layer i's input
    # is the embedded buffer (i=0) or layer i-1's updated cache (i>0); only
    # the query at position `step` is recomputed (reference decoder.py:214-227
    # concat-cache semantics, static-shape version).
    attn_sum = None
    for i, lp in enumerate(p['decoders']):
        out_q = decoder_layer(lp, x, tgt_mask, memory, memory_mask, cfg,
                              cat_embs, None,
                              is_lsl=_layer_is_lsl(cfg, i, n_blocks),
                              q_slice=step,
                              return_src_attn=return_src_attn,
                              mem_kv=mem_kv[i] if mem_kv is not None
                              else None)  # (B,1,D)
        if return_src_attn:
            out_q, w = out_q                           # w: (B,H,1,Tmem)
            layer_mean = jnp.mean(w.astype(jnp.float32), axis=1)[:, 0]
            attn_sum = layer_mean if attn_sum is None else attn_sum + layer_mean
        upd = jax.lax.dynamic_update_slice_in_dim(cache[i], out_q, step, axis=1)
        new_cache.append(upd)
        x = upd
    y = jax.lax.dynamic_slice_in_dim(x, step, 1, axis=1)[:, 0]   # (B,D)
    if cfg.normalize_before:
        y = layer_norm(p['after_norm'], y)
    if cfg.use_output_layer:
        y = linear(p['output_layer'], y)
    logp = jax.nn.log_softmax(y.astype(jnp.float32), axis=-1)
    if return_src_attn:
        # mean over layers and heads (asr_model.py:1045-1046)
        return logp, jnp.stack(new_cache, axis=0), \
            attn_sum / len(p['decoders'])
    return logp, jnp.stack(new_cache, axis=0)
