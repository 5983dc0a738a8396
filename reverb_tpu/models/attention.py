"""Multi-headed attention: vanilla + WeNet's rel-pos variant WITHOUT rel_shift.

Parity targets:
  - MultiHeadedAttention            asr/wenet/transformer/attention.py:25-263
  - RelPositionMultiHeadedAttention asr/wenet/transformer/attention.py:266-399
    (rel_shift deliberately disabled at attention.py:391-396: matrix_bd is
     used UNSHIFTED — this non-standard variant is what the released weights
     were trained with, so we reproduce it exactly.)

Softmax runs in float32 regardless of activation dtype (TPU bf16 matmuls keep
WER stable only if the score normalization accumulates in f32).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from reverb_tpu.models.modules import dropout, linear

_MASK_VALUE = -1e9  # finite stand-in for -inf (keeps softmax NaN-free)


def _dot(a, b):
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _split_heads(x, h: int):
    B, T, D = x.shape
    return x.reshape(B, T, h, D // h).transpose(0, 2, 1, 3)  # (B,H,T,dk)


def _merge_heads(x):
    B, H, T, dk = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, T, H * dk)


def forward_qkv(p, query, key, value, h: int):
    q = _split_heads(linear(p['linear_q'], query), h)
    k = _split_heads(linear(p['linear_k'], key), h)
    v = _split_heads(linear(p['linear_v'], value), h)
    return q, k, v


def forward_attention(p, value, scores, mask: Optional[jax.Array],
                      rate: float = 0.0, rng=None,
                      return_weights: bool = False):
    """value (B,H,T2,dk), scores (B,H,T1,T2), mask bool (B,1|T1,T2) True=keep."""
    scores32 = scores.astype(jnp.float32)
    if mask is not None:
        m = mask[:, None, :, :]  # (B,1,*,T2)
        m = m[..., :scores.shape[-1]]
        scores32 = jnp.where(m, scores32, _MASK_VALUE)
        attn = jax.nn.softmax(scores32, axis=-1)
        attn = jnp.where(m, attn, 0.0)
    else:
        attn = jax.nn.softmax(scores32, axis=-1)
    attn = attn.astype(value.dtype)
    p_attn = dropout(attn, rate, rng)
    x = _merge_heads(_dot(p_attn, value))
    out = linear(p['linear_out'], x)
    if return_weights:
        return out, attn
    return out


def mha(p, query, key, value, mask, h: int, rate: float = 0.0, rng=None,
        cache: Optional[jax.Array] = None, return_weights: bool = False):
    """Vanilla MHA. cache (B,H,Tc,2*dk) holds concat(K,V); returns new cache."""
    q, k, v = forward_qkv(p, query, key, value, h)
    if cache is not None:
        kc, vc = jnp.split(cache, 2, axis=-1)
        k = jnp.concatenate([kc, k], axis=2)
        v = jnp.concatenate([vc, v], axis=2)
    new_cache = jnp.concatenate([k, v], axis=-1)
    d_k = q.shape[-1]
    scores = _dot(q, k.transpose(0, 1, 3, 2)) / math.sqrt(d_k)
    out = forward_attention(p, v, scores, mask, rate, rng, return_weights)
    if return_weights:
        return out[0], new_cache, out[1]
    return out, new_cache


def cross_kv(p, memory, h: int):
    """Precompute cross-attention K/V heads for a memory shared by many query
    sequences (nbest rescoring): memory (T,D) → ((H,T,dk), (H,T,dk)).

    The K/V projections over the T-frame encoder output dominate rescoring
    FLOPs; computing them once per utterance instead of once per hypothesis
    cuts that cost by the nbest size (search.py:363-448 recomputes them per
    stacked hyp batch)."""
    k = _split_heads(linear(p['linear_k'], memory[None]), h)[0]
    v = _split_heads(linear(p['linear_v'], memory[None]), h)[0]
    return k, v


def cross_kv_batched(p, memory, h: int):
    """Batched `cross_kv`: memory (B,T,D) → ((B,H,T,dk), (B,H,T,dk)) —
    one K/V projection per utterance for grouped nbest rescoring."""
    k = _split_heads(linear(p['linear_k'], memory), h)
    v = _split_heads(linear(p['linear_v'], memory), h)
    return k, v


def mha_shared_kv_grouped(p, query, kv, mask, h: int, group: int):
    """MHA where each consecutive block of `group` query rows shares one
    utterance's (k, v) from kv (B,H,T,dk).

    Cross-attention has no query-query interaction, so a group's rows
    concatenate into ONE query stream of length group·L: every contraction
    stays a clean 4-D batched matmul over batch B·H.  (The vmap-over-
    utterances formulation produced 5-D operands whose layout
    assignment/transposes cost ~199 ms of async copy DMA per serving batch
    and ~13% of the program's exposed time.)

    query (B·group, L, D); mask (B,1,T) True=keep; returns (B·group, L, D).
    """
    BG, L, D = query.shape
    B = BG // group
    q = _split_heads(linear(p['linear_q'], query).reshape(B, group * L, D), h)
    k, v = kv                                              # (B,H,T,dk)
    d_k = q.shape[-1]
    scores = jnp.einsum('bhqd,bhtd->bhqt', q, k,
                        precision=jax.lax.Precision.HIGHEST) / math.sqrt(d_k)
    scores32 = scores.astype(jnp.float32)
    if mask is not None:
        m = mask[:, None, :, :][..., :scores.shape[-1]]    # (B,1,1,T)
        scores32 = jnp.where(m, scores32, _MASK_VALUE)
        attn = jnp.where(m, jax.nn.softmax(scores32, axis=-1), 0.0)
    else:
        attn = jax.nn.softmax(scores32, axis=-1)
    ctx = jnp.einsum('bhqt,bhtd->bhqd', attn.astype(v.dtype), v,
                     precision=jax.lax.Precision.HIGHEST)
    return linear(p['linear_out'], _merge_heads(ctx)).reshape(BG, L, -1)


def mha_shared_kv(p, query, kv, mask, h: int):
    """MHA whose (k, v) = kv of shape (H,T,dk) are shared across the whole
    query batch: the B× K/V copies are never materialized — the shared
    operands ride the einsums directly (B folds into the query rows, a
    better MXU shape than B small batched matmuls)."""
    q = _split_heads(linear(p['linear_q'], query), h)        # (B,H,L,dk)
    k, v = kv
    d_k = q.shape[-1]
    scores = jnp.einsum('bhld,htd->bhlt', q, k,
                        precision=jax.lax.Precision.HIGHEST) / math.sqrt(d_k)
    scores32 = scores.astype(jnp.float32)
    if mask is not None:
        m = mask[:, None, :, :][..., :scores.shape[-1]]      # (B,1,*,T)
        scores32 = jnp.where(m, scores32, _MASK_VALUE)
        attn = jnp.where(m, jax.nn.softmax(scores32, axis=-1), 0.0)
    else:
        attn = jax.nn.softmax(scores32, axis=-1)
    ctx = jnp.einsum('bhlt,htd->bhld', attn.astype(v.dtype), v,
                     precision=jax.lax.Precision.HIGHEST)
    return linear(p['linear_out'], _merge_heads(ctx))


def rel_pos_mha(p, query, key, value, mask, pos_emb, h: int,
                rate: float = 0.0, rng=None,
                cache: Optional[jax.Array] = None):
    """Transformer-XL-style rel-pos attention, **no rel_shift** (see header).

    pos_emb: (1, T2, D) from RelPositionalEncoding.
    scores = ((q+u) kᵀ + (q+v) pᵀ) / sqrt(dk)
    """
    q, k, v = forward_qkv(p, query, key, value, h)
    if cache is not None:
        kc, vc = jnp.split(cache, 2, axis=-1)
        k = jnp.concatenate([kc, k], axis=2)
        v = jnp.concatenate([vc, v], axis=2)
    new_cache = jnp.concatenate([k, v], axis=-1)

    d_k = q.shape[-1]
    pos = _split_heads(linear(p['linear_pos'], pos_emb), h)  # (1,H,T2,dk)

    from reverb_tpu.ops import flash_attention as _fa
    if _fa.flash_attention_eligible(mask, rate, rng, cache,
                                    batch=q.shape[0], heads=h):
        kv_lens = mask[:, 0, :k.shape[2]].sum(-1)
        ctx = _fa.rel_pos_flash_attention(q, k, v, pos, p['pos_bias_u'],
                                          p['pos_bias_v'], kv_lens,
                                          rate=rate, rng=rng)
        # The Pallas custom call is not a dot, so the 'dots' remat policy
        # would not save its output and the backward replays the whole
        # forward kernel (measured: 16.5 ms/step of rematted_computation +
        # jvp replays at B=48 flagship).  Tag it saveable ('attn_out' is in
        # the dots save list next to 'ln_stats').
        from jax.ad_checkpoint import checkpoint_name
        ctx = checkpoint_name(ctx, 'attn_out')
        out = linear(p['linear_out'], _merge_heads(ctx))
        return out, new_cache

    u = p['pos_bias_u'].astype(q.dtype)[None, :, None, :]    # (1,H,1,dk)
    vb = p['pos_bias_v'].astype(q.dtype)[None, :, None, :]

    matrix_ac = _dot(q + u, k.transpose(0, 1, 3, 2))
    matrix_bd = _dot(q + vb, pos.transpose(0, 1, 3, 2))
    # NOTE: reference removes rel_shift here (attention.py:391-396);
    # matrix_bd enters the scores unshifted.
    scores = (matrix_ac + matrix_bd[..., :matrix_ac.shape[-1]]) / math.sqrt(d_k)
    return forward_attention(p, v, scores, mask, rate, rng), new_cache
