"""Alternative encoder families: Branchformer, E-Branchformer, Squeezeformer,
Efficient-Conformer-style grouped attention.

Capability parity with asr/wenet/{branchformer,e_branchformer,squeezeformer,
efficient_conformer}/ (SURVEY.md §2.4) — same architectural ideas,
re-implemented TPU-first on the shared functional module layer:
  - ConvolutionalGatingMLP (cgMLP): proj→GELU → spatial gating (depthwise
    conv on half the channels, elementwise gate) → proj
    (branchformer/cgmlp.py:24-194)
  - BranchformerEncoderLayer: parallel attention + cgMLP branches merged by
    concat+linear (branchformer/encoder_layer.py:24-230)
  - EBranchformerEncoderLayer: macaron FFN halves + depthwise-conv merge
    (e_branchformer/encoder_layer.py)
  - Squeezeformer: conformer-style blocks around a temporal
    reduce/recover U-structure (squeezeformer/encoder.py:35,
    subsampling.py:95-300)
  - Grouped rel-pos attention (efficient_conformer/attention.py:28): heads
    attend over strided key groups.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp

from reverb_tpu.models import attention as att
from reverb_tpu.models.encoder import (EncoderConfig, SUBSAMPLE_FNS,
                                       conformer_layer, feed_forward)
from reverb_tpu.models.modules import (ACTIVATIONS, conv1d, dropout,
                                       init_conv1d, init_layer_norm,
                                       init_linear, layer_norm, linear)
from reverb_tpu.models.asr_model import _init_mha, _init_ffn
from reverb_tpu.utils.common import make_pad_mask


# ------------------------------ cgMLP ------------------------------

def init_cgmlp(rng, size: int, linear_units: int, kernel: int,
               use_linear_after_conv: bool = False):
    """Param tree keyed exactly like the reference ConvolutionalGatingMLP
    (branchformer/cgmlp.py): channel_proj1 is a Sequential (Linear at '0'),
    the gating unit nests under 'csgu'."""
    ks = jax.random.split(rng, 4)
    p = {'channel_proj1': {'0': init_linear(ks[0], size, linear_units)},
         'csgu': {'norm': init_layer_norm(linear_units // 2),
                  'conv': init_conv1d(ks[1], linear_units // 2,
                                      linear_units // 2, kernel,
                                      groups=linear_units // 2)},
         'channel_proj2': init_linear(ks[2], linear_units // 2, size)}
    if use_linear_after_conv:
        p['csgu']['linear'] = init_linear(ks[3], linear_units // 2,
                                          linear_units // 2)
    return p


def cgmlp_forward(p, x, kernel: int, gate_activation: str = 'identity',
                  causal: bool = False, rate: float = 0.0, rng=None):
    """(B,T,D) → (B,T,D): proj-GELU → spatial gating → proj.

    Exact CSGU order (cgmlp.py:86-131): when causal, x_g is zero-padded
    lorder frames on the left BEFORE the LayerNorm (the padded frames enter
    the conv as β, not 0 — matched bit-for-bit); non-causal uses a
    symmetric conv.
    """
    x = jax.nn.gelu(linear(p['channel_proj1']['0'], x),
                    approximate=False)   # torch.nn.GELU default is exact erf
    xr, xg = jnp.split(x, 2, axis=-1)
    csgu = p['csgu']
    if causal:
        xg = jnp.pad(xg, ((0, 0), (kernel - 1, 0), (0, 0)))
        xg = layer_norm(csgu['norm'], xg)
        xg_c = conv1d(csgu['conv'], xg.transpose(0, 2, 1),
                      groups=xg.shape[-1])
    else:
        xg = layer_norm(csgu['norm'], xg)
        xg_c = conv1d(csgu['conv'], xg.transpose(0, 2, 1),
                      padding=(kernel - 1) // 2, groups=xg.shape[-1])
    xg = xg_c.transpose(0, 2, 1)
    if 'linear' in csgu:
        xg = linear(csgu['linear'], xg)
    if gate_activation != 'identity':
        xg = ACTIVATIONS[gate_activation](xg)
    x = xr * xg
    x = dropout(x, rate, rng)
    return linear(p['channel_proj2'], x)


# ------------------------------ branchformer ------------------------------

@dataclasses.dataclass(frozen=True)
class BranchformerConfig:
    input_size: int = 80
    output_size: int = 256
    attention_heads: int = 4
    num_blocks: int = 12
    cgmlp_linear_units: int = 2048
    cgmlp_conv_kernel: int = 31
    dropout_rate: float = 0.1
    merge_method: str = 'concat'          # concat | learned_ave | fixed_ave
    cgmlp_weight: float = 0.5             # fixed_ave branch weight
    causal: bool = False                  # csgu / fusion conv causality
    e_branchformer: bool = False          # adds macaron FFNs + conv merge
    ffn_units: int = 2048
    merge_conv_kernel: int = 3
    pos_enc_layer_type: str = 'rel_pos'


def init_branchformer_layer(rng, cfg: BranchformerConfig):
    """Keys mirror the reference exactly: 'attn' (not self_attn),
    'depthwise_conv_fusion' for the e-branchformer merge conv, norm_final on
    EVERY layer (branchformer/encoder_layer.py:67,124), pooling/weight
    projections for the learned_ave merge (:73-78)."""
    ks = jax.random.split(rng, 10)
    d = cfg.output_size
    p = {'norm_mha': init_layer_norm(d),
         'norm_mlp': init_layer_norm(d),
         'norm_final': init_layer_norm(d),
         'attn': _init_mha(ks[0], d, True,
                           cfg.pos_enc_layer_type == 'rel_pos',
                           cfg.attention_heads),
         'cgmlp': init_cgmlp(ks[1], d, cfg.cgmlp_linear_units,
                             cfg.cgmlp_conv_kernel)}
    if cfg.e_branchformer:
        p['feed_forward'] = _init_ffn(ks[2], d, cfg.ffn_units)
        p['feed_forward_macaron'] = _init_ffn(ks[3], d, cfg.ffn_units)
        p['norm_ff'] = init_layer_norm(d)
        p['norm_ff_macaron'] = init_layer_norm(d)
        p['depthwise_conv_fusion'] = init_conv1d(
            ks[4], 2 * d, 2 * d, cfg.merge_conv_kernel, groups=2 * d)
        p['merge_proj'] = init_linear(ks[5], 2 * d, d)
    else:
        # merge_proj input dim depends on the merge method
        # (branchformer/encoder_layer.py:81-105)
        p['merge_proj'] = init_linear(
            ks[5], 2 * d if cfg.merge_method == 'concat' else d, d)
        p['pooling_proj1'] = init_linear(ks[6], d, 1)
        p['pooling_proj2'] = init_linear(ks[7], d, 1)
        p['weight_proj1'] = init_linear(ks[8], d, 1)
        p['weight_proj2'] = init_linear(ks[9], d, 1)
    return p


def branchformer_layer_forward(p, x, mask, pos_emb, cfg: BranchformerConfig,
                               rngs=None, mask_pad=None):
    rate = cfg.dropout_rate

    def drop(v):
        return dropout(v, rate, rngs.next() if rngs else None)

    if cfg.e_branchformer:
        residual = x
        xn = layer_norm(p['norm_ff_macaron'], x)
        h = jax.nn.silu(linear(p['feed_forward_macaron']['w_1'], xn))
        h = drop(h)
        h = linear(p['feed_forward_macaron']['w_2'], h)
        x = residual + 0.5 * drop(h)

    # branch 1: attention
    x1 = layer_norm(p['norm_mha'], x)
    if cfg.pos_enc_layer_type == 'rel_pos':
        x1, _ = att.rel_pos_mha(p['attn'], x1, x1, x1, mask, pos_emb,
                                cfg.attention_heads)
    else:
        x1, _ = att.mha(p['attn'], x1, x1, x1, mask, cfg.attention_heads)
    x1 = drop(x1)
    # branch 2: cgMLP.  The plain Branchformer never forwards its `causal`
    # flag to the cgmlp (branchformer/encoder.py:83-90), so CSGU defaults to
    # causal=True there; only the E-Branchformer threads it through
    # (e_branchformer/encoder.py:120).
    cg_causal = True if not cfg.e_branchformer else cfg.causal
    x2 = layer_norm(p['norm_mlp'], x)
    x2 = cgmlp_forward(p['cgmlp'], x2, cfg.cgmlp_conv_kernel,
                       causal=cg_causal, rate=rate,
                       rng=rngs.next() if rngs else None)
    x2 = drop(x2)

    if cfg.e_branchformer:
        cat = jnp.concatenate([x1, x2], axis=-1)
        conv = cat.transpose(0, 2, 1)
        if cfg.causal:
            conv = jnp.pad(conv, ((0, 0), (0, 0),
                                  (cfg.merge_conv_kernel - 1, 0)))
            conv = conv1d(p['depthwise_conv_fusion'], conv,
                          groups=conv.shape[1])
        else:
            conv = conv1d(p['depthwise_conv_fusion'], conv,
                          padding=(cfg.merge_conv_kernel - 1) // 2,
                          groups=conv.shape[1])
        merged = cat + conv.transpose(0, 2, 1)
        x = x + drop(linear(p['merge_proj'], merged))
        residual = x
        xn = layer_norm(p['norm_ff'], x)
        h = jax.nn.silu(linear(p['feed_forward']['w_1'], xn))
        h = drop(h)
        h = linear(p['feed_forward']['w_2'], h)
        x = residual + 0.5 * drop(h)
        return layer_norm(p['norm_final'], x)

    # plain branchformer merges (branchformer/encoder_layer.py:160-226)
    if cfg.merge_method == 'concat':
        merged = linear(p['merge_proj'],
                        jnp.concatenate([x1, x2], axis=-1))
    elif cfg.merge_method == 'learned_ave':
        # attention-pooled per-branch weights (:175-205)
        D = x.shape[-1]
        valid = (mask_pad[:, 0, :, None].astype(x.dtype)
                 if mask_pad is not None
                 else jnp.ones(x.shape[:2] + (1,), x.dtype))

        def pooled_weight(branch, pool_p, w_p):
            score = linear(pool_p, branch) / D ** 0.5      # (B,T,1)
            score = jnp.where(valid > 0, score, -jnp.inf)
            a = jax.nn.softmax(score, axis=1)
            pooled = jnp.sum(a * branch, axis=1)           # (B,D)
            return linear(w_p, pooled)                     # (B,1)

        w1 = pooled_weight(x1, p['pooling_proj1'], p['weight_proj1'])
        w2 = pooled_weight(x2, p['pooling_proj2'], p['weight_proj2'])
        w = jax.nn.softmax(jnp.concatenate([w1, w2], axis=-1), axis=-1)
        merged = linear(p['merge_proj'],
                        w[:, 0:1, None] * x1 + w[:, 1:2, None] * x2)
    elif cfg.merge_method == 'fixed_ave':
        merged = linear(p['merge_proj'],
                        (1.0 - cfg.cgmlp_weight) * x1
                        + cfg.cgmlp_weight * x2)
    else:
        raise ValueError(cfg.merge_method)
    x = x + drop(merged)
    # applied to EVERY plain-branchformer layer (encoder_layer.py:124)
    return layer_norm(p['norm_final'], x)


def init_branchformer(rng, cfg: BranchformerConfig):
    from reverb_tpu.models.asr_model import init_encoder_params
    base_cfg = EncoderConfig(input_size=cfg.input_size,
                             output_size=cfg.output_size,
                             pos_enc_layer_type=cfg.pos_enc_layer_type)
    ks = jax.random.split(rng, cfg.num_blocks + 1)
    base = init_encoder_params(ks[0], dataclasses.replace(base_cfg,
                                                          num_blocks=0))
    base['encoders'] = [init_branchformer_layer(ks[i + 1], cfg)
                        for i in range(cfg.num_blocks)]
    return base


def branchformer_forward(params, xs, xs_lens, cfg: BranchformerConfig,
                         cmvn=None, rngs=None):
    """(B,T,F) → (B,T',D), masks — BranchformerEncoder.forward."""
    base_cfg = EncoderConfig(input_size=cfg.input_size,
                             output_size=cfg.output_size,
                             dropout_rate=cfg.dropout_rate,
                             pos_enc_layer_type=cfg.pos_enc_layer_type)
    B, T, _ = xs.shape
    masks = (~make_pad_mask(xs_lens, T))[:, None, :]
    if cmvn is not None:
        xs = (xs - cmvn[0]) * cmvn[1]
    xs, pos_emb, masks = SUBSAMPLE_FNS['conv2d'](params['embed'], xs, masks,
                                                 base_cfg, 0, rngs)
    for lp in params['encoders']:
        xs = branchformer_layer_forward(lp, xs, masks, pos_emb, cfg, rngs,
                                        mask_pad=masks)
    xs = layer_norm(params['after_norm'], xs)
    return xs, masks


# ------------------------------ squeezeformer ------------------------------

@dataclasses.dataclass(frozen=True)
class SqueezeformerConfig:
    """Reference-exact Squeezeformer (squeezeformer/encoder.py:35-200):
    depthwise Conv2d subsampling → preln → post-norm blocks
    [MHSA→LN, FFN1→LN, conv→LN, FFN2→LN] with adaptive per-module input
    scales, a 2× TimeReductionLayer1D at reduce_idx and repeat-2×+linear
    recovery at recover_idx; rel-pos attention WITH rel_shift (unlike the
    conformer, do_rel_shift defaults True — attention.py:224-227)."""
    input_size: int = 80
    output_size: int = 256             # == encoder_dim
    attention_heads: int = 4
    linear_units: int = 1024           # encoder_dim · expansion_factor
    num_blocks: int = 12
    reduce_idx: int = 5
    recover_idx: int = 11
    dropout_rate: float = 0.1
    cnn_module_kernel: int = 31
    time_reduction_kernel: int = 5
    adaptive_scale: bool = True
    do_rel_shift: bool = True
    activation: str = 'swish'


def _init_ada(d):
    return {'ada_scale': jnp.ones((1, 1, d), jnp.float32),
            'ada_bias': jnp.zeros((1, 1, d), jnp.float32)}


def _ada(p, x, cfg):
    if not cfg.adaptive_scale:
        return x
    return p['ada_scale'].astype(x.dtype) * x + p['ada_bias'].astype(x.dtype)


def _rel_shift(x):
    """Transformer-XL relative shift (squeezeformer/attention.py:73-97):
    zero-pad one column, fold, drop the first row."""
    B, H, T1, T2 = x.shape
    zero = jnp.zeros((B, H, T1, 1), x.dtype)
    xp = jnp.concatenate([zero, x], axis=-1).reshape(B, H, T2 + 1, T1)
    return xp[:, :, 1:].reshape(B, H, T1, T2)


def _sq_attention(p, x, mask, pos_emb, cfg: SqueezeformerConfig, rngs=None):
    """RelPositionMultiHeadedAttention with adaptive scale + rel_shift
    (squeezeformer/attention.py:146-232)."""
    import math as _math
    B, T, D = x.shape
    H = cfg.attention_heads
    dk = D // H
    xa = _ada(p, x, cfg)
    q = linear(p['linear_q'], xa).reshape(B, T, H, dk)
    k = linear(p['linear_k'], xa).reshape(B, T, H, dk).transpose(0, 2, 1, 3)
    v = linear(p['linear_v'], xa).reshape(B, T, H, dk).transpose(0, 2, 1, 3)
    pe = linear(p['linear_pos'], pos_emb).reshape(
        pos_emb.shape[0], -1, H, dk).transpose(0, 2, 1, 3)
    q_u = (q + p['pos_bias_u'].astype(x.dtype)).transpose(0, 2, 1, 3)
    q_v = (q + p['pos_bias_v'].astype(x.dtype)).transpose(0, 2, 1, 3)
    ac = jnp.einsum('bhtd,bhsd->bhts', q_u, k)
    bd = jnp.einsum('bhtd,bhsd->bhts', q_v, pe)
    if cfg.do_rel_shift:
        bd = _rel_shift(bd)
    scores = (ac + bd) / _math.sqrt(dk)
    scores = jnp.where(mask[:, None, :, :], scores.astype(jnp.float32), -1e9)
    attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    attn = jnp.where(mask[:, None, :, :], attn, 0.0)
    attn = dropout(attn, cfg.dropout_rate, rngs.next() if rngs else None)
    ctx = jnp.einsum('bhts,bhsd->bhtd', attn, v)
    return linear(p['linear_out'], ctx.transpose(0, 2, 1, 3).reshape(B, T, D))


def _sq_ffn(p, x, cfg: SqueezeformerConfig, rngs=None):
    x = _ada(p, x, cfg)
    h = ACTIVATIONS[cfg.activation](linear(p['w_1'], x))
    h = dropout(h, cfg.dropout_rate, rngs.next() if rngs else None)
    return linear(p['w_2'], h)


def _sq_conv(p, x, mask_pad, cfg: SqueezeformerConfig, rngs=None):
    """Conv module (squeezeformer/convolution.py:121-180): ada → mask →
    pointwise(2c)+GLU → symmetric depthwise → batch-norm → swish →
    pointwise; NWC layout throughout."""
    from reverb_tpu.models.modules import (batch_norm_last,
                                           depthwise_conv1d_ntc,
                                           pointwise_conv_as_linear)
    x = _ada(p, x, cfg)
    m = mask_pad[:, 0, :, None].astype(x.dtype)
    x = x * m
    x = pointwise_conv_as_linear(p['pointwise_conv1'], x)
    a, b = jnp.split(x, 2, axis=-1)
    x = a * jax.nn.sigmoid(b)                                # GLU
    x = depthwise_conv1d_ntc(p['depthwise_conv'], x,
                             padding=(cfg.cnn_module_kernel - 1) // 2)
    x = batch_norm_last(p['norm'], x)   # NWC layout
    x = ACTIVATIONS[cfg.activation](x)
    x = pointwise_conv_as_linear(p['pointwise_conv2'], x)
    return x * m


def init_squeezeformer_layer(rng, cfg: SqueezeformerConfig):
    d = cfg.output_size
    ks = jax.random.split(rng, 4)
    attn = _init_mha(ks[0], d, True, True, cfg.attention_heads)
    attn.update(_init_ada(d))
    ffn1 = _init_ffn(ks[1], d, cfg.linear_units)
    ffn1.update(_init_ada(d))
    ffn2 = _init_ffn(ks[2], d, cfg.linear_units)
    ffn2.update(_init_ada(d))
    kc = jax.random.split(ks[3], 3)
    from reverb_tpu.models.modules import init_batch_norm
    # conv-module params live FLAT in the layer dict (the checkpoint
    # converter hoists `.conv_module.` — convert/torch_ckpt.py)
    p = {'self_attn': attn, 'ffn1': ffn1, 'ffn2': ffn2,
         'pointwise_conv1': init_conv1d(kc[0], d, 2 * d, 1),
         'depthwise_conv': init_conv1d(kc[1], d, d,
                                       cfg.cnn_module_kernel, groups=d),
         'pointwise_conv2': init_conv1d(kc[2], d, d, 1),
         'norm': init_batch_norm(d),
         'layer_norm1': init_layer_norm(d),
         'layer_norm2': init_layer_norm(d),
         'layer_norm3': init_layer_norm(d),
         'layer_norm4': init_layer_norm(d)}
    p.update(_init_ada(d))   # the conv module's adaptive scale
    return p


def squeezeformer_layer_forward(p, x, mask, pos_emb, mask_pad,
                                cfg: SqueezeformerConfig, rngs=None):
    """Post-norm block (squeezeformer/encoder_layer.py:49-150)."""
    def drop(v):
        return dropout(v, cfg.dropout_rate, rngs.next() if rngs else None)

    x = layer_norm(p['layer_norm1'],
                   x + drop(_sq_attention(p['self_attn'], x, mask, pos_emb,
                                          cfg, rngs)))
    x = layer_norm(p['layer_norm2'], x + drop(_sq_ffn(p['ffn1'], x, cfg,
                                                      rngs)))
    x = layer_norm(p['layer_norm3'],
                   x + drop(_sq_conv(p, x, mask_pad, cfg, rngs)))
    x = layer_norm(p['layer_norm4'], x + drop(_sq_ffn(p['ffn2'], x, cfg,
                                                      rngs)))
    return x


def init_squeezeformer(rng, cfg: SqueezeformerConfig):
    from reverb_tpu.models.modules import init_conv2d
    d = cfg.output_size
    f = cfg.input_size
    ks = jax.random.split(rng, cfg.num_blocks + 5)
    embed = {'pw_conv': init_conv2d(ks[0], 1, d, 3, 3),
             'dw_conv': init_conv2d(ks[1], d, d, 3, 3),
             'input_proj': {'0': init_linear(
                 ks[2], d * (((f - 1) // 2 - 1) // 2), d)}}
    tr = {'dw_conv': init_conv1d(ks[3], d, d, cfg.time_reduction_kernel,
                                 groups=d),
          'pw_conv': init_conv1d(ks[4], d, d, 1)}
    return {'embed': embed,
            'preln': init_layer_norm(d),
            'time_reduction_layer': tr,
            'time_recover_layer': init_linear(ks[-1], d, d),
            'encoders': [init_squeezeformer_layer(ks[5 + i], cfg)
                         for i in range(cfg.num_blocks)]}


def squeezeformer_forward(params, xs, xs_lens, cfg: SqueezeformerConfig,
                          cmvn=None, rngs=None):
    """SqueezeformerEncoder.forward (encoder.py:200-260)."""
    from reverb_tpu.models.modules import conv2d
    B, T, _ = xs.shape
    masks = (~make_pad_mask(xs_lens, T))[:, None, :]
    if cmvn is not None:
        xs = (xs - cmvn[0]) * cmvn[1]
    # DepthwiseConv2dSubsampling4 (subsampling.py:27-93): pw → relu → dw →
    # relu → flatten → rel-pos → input_proj
    x4 = xs[:, None, :, :]
    x4 = jax.nn.relu(conv2d(params['embed']['pw_conv'], x4, stride=(2, 2)))
    x4 = jax.nn.relu(conv2d(params['embed']['dw_conv'], x4, stride=(2, 2)))
    b, c, t, fdim = x4.shape
    xs = x4.transpose(0, 2, 1, 3).reshape(b, t, c * fdim)
    # the pos_enc sits BEFORE input_proj and is built with encoder_dim
    # (encoder.py:147): x·sqrt(encoder_dim), pos table width encoder_dim
    import math as _math
    from reverb_tpu.models.embedding import pe_table
    d = cfg.output_size
    xs = xs * _math.sqrt(d)
    pos_emb = jnp.asarray(pe_table(d))[None, :t].astype(xs.dtype)
    xs = linear(params['embed']['input_proj']['0'], xs)
    masks = masks[:, :, :-2:2][:, :, :-2:2]
    mask_pad = masks
    att_mask = masks & masks.transpose(0, 2, 1)
    xs = layer_norm(params['preln'], xs)

    recover = None
    cur_att, cur_pad, cur_pos = att_mask, mask_pad, pos_emb[:, :xs.shape[1]]
    for i, lp in enumerate(params['encoders']):
        if i == cfg.reduce_idx:
            recover = (xs, cur_att, cur_pos, cur_pad)
            # TimeReductionLayer1D (subsampling.py:95-170): mask → dw(s2,
            # pad k-2) → pw(k1) → trim/pad to ceil(T/2)
            xm = xs * cur_pad[:, 0, :, None].astype(xs.dtype)
            xc = xm.transpose(0, 2, 1)
            # dw conv: stride 2, padding k-stride (subsampling.py:119-130)
            xc = conv1d(params['time_reduction_layer']['dw_conv'], xc,
                        stride=2, padding=max(0, cfg.time_reduction_kernel - 2),
                        groups=xc.shape[1])
            xc = conv1d(params['time_reduction_layer']['pw_conv'], xc)
            xr = xc.transpose(0, 2, 1)
            cur_att = cur_att[:, ::2, ::2]
            cur_pad = cur_pad[:, :, ::2]
            L = cur_pad.shape[-1]
            xr = xr[:, :L] if xr.shape[1] >= L else jnp.pad(
                xr, ((0, 0), (0, L - xr.shape[1]), (0, 0)))
            xs = xr
            cur_pos = cur_pos[:, ::2]
        if i == cfg.recover_idx and recover is not None:
            r_x, cur_att, cur_pos, cur_pad = recover
            up = jnp.repeat(xs, 2, axis=1)
            up = linear(params['time_recover_layer'], up)
            xs = r_x + up[:, :r_x.shape[1]]
            xs = xs * cur_pad[:, 0, :, None].astype(xs.dtype)
        xs = squeezeformer_layer_forward(lp, xs, cur_att, cur_pos, cur_pad,
                                         cfg, rngs)
    return xs, masks


# -------------------- grouped attention (efficient conformer) -----------

def grouped_rel_pos_mha(p, x, mask, pos_emb, h: int, group_size: int = 3,
                        rate: float = 0.0, rng=None):
    """GroupedRelPositionMultiHeadedAttention
    (efficient_conformer/attention.py:28-260): q/k/v/pos are grouped by
    concatenating `group_size` consecutive frames along the head dim
    (d_k → d_k·g), the mask is strided ::g, scores scale by sqrt(d_k·g),
    and the context is un-grouped back to full resolution (padding trimmed).
    pos_bias_u/v are (h, d_k·g).  No rel_shift (matches the conformer)."""
    import math as _math
    B, T, D = x.shape
    dk = D // h
    g = group_size
    q = linear(p['linear_q'], x)
    k = linear(p['linear_k'], x)
    v = linear(p['linear_v'], x)
    pe = linear(p['linear_pos'], pos_emb)

    pad_q = (-T) % g
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad_q), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_q), (0, 0)))
    Tp = pe.shape[1]
    pad_p = (-Tp) % g
    if pad_p:
        pe = jnp.pad(pe, ((0, 0), (0, pad_p), (0, 0)))
    Tg = q.shape[1] // g

    def grp(t):
        return t.reshape(t.shape[0], -1, h, dk * g).transpose(0, 2, 1, 3)

    qg, kg, vg = grp(q), grp(k), grp(v)
    pg = grp(pe)
    mg = mask[:, ::g, ::g] if mask is not None else None
    q_u = (qg.transpose(0, 2, 1, 3)
           + p['pos_bias_u'].astype(x.dtype)).transpose(0, 2, 1, 3)
    q_v = (qg.transpose(0, 2, 1, 3)
           + p['pos_bias_v'].astype(x.dtype)).transpose(0, 2, 1, 3)
    ac = jnp.einsum('bhtd,bhsd->bhts', q_u, kg)
    bd = jnp.einsum('bhtd,bhsd->bhts', q_v, pg[:, :, :kg.shape[2]])
    scores = (ac + bd) / _math.sqrt(dk * g)
    if mg is not None:
        mm = mg[:, None, :, :scores.shape[-1]]
        scores = jnp.where(mm, scores.astype(jnp.float32), -1e9)
        attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        attn = jnp.where(mm, attn, 0.0)
    else:
        attn = jax.nn.softmax(scores.astype(jnp.float32),
                              axis=-1).astype(x.dtype)
    attn = dropout(attn, rate, rng)
    ctx = jnp.einsum('bhts,bhsd->bhtd', attn, vg)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, Tg * g, D)
    if pad_q:
        ctx = ctx[:, :T]
    return linear(p['linear_out'], ctx)


# -------------------- efficient conformer (full encoder) -----------------

@dataclasses.dataclass(frozen=True)
class EfficientConformerConfig:
    """EfficientConformerEncoder (efficient_conformer/encoder.py:41):
    conformer blocks with grouped rel-pos attention; at `stride_layer_idx`
    the conv module's depthwise conv is strided (kernel recomputed k//s when
    stride_kernel) and the residual goes through an AvgPool1d with
    ceil_mode (no recovery — later layers run at the reduced rate)."""
    input_size: int = 80
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 12
    cnn_module_kernel: int = 15
    dropout_rate: float = 0.1
    group_size: int = 3
    group_layer_idx: tuple = (0, 1, 2, 3)
    stride_layer_idx: tuple = (3,)
    stride: tuple = (2,)
    stride_kernel: bool = True


def _eff_kernels(cfg: EfficientConformerConfig):
    """cnn_module_kernels per stride stage (encoder.py:128-136)."""
    ks = [cfg.cnn_module_kernel]
    for s in cfg.stride:
        ks.append(ks[-1] // s if cfg.stride_kernel else ks[-1])
    return ks


def _eff_base_cfg(cfg: EfficientConformerConfig, kernel: int
                  ) -> EncoderConfig:
    return EncoderConfig(
        input_size=cfg.input_size, output_size=cfg.output_size,
        attention_heads=cfg.attention_heads, linear_units=cfg.linear_units,
        cnn_module_kernel=kernel, cnn_module_norm='batch_norm',
        dropout_rate=cfg.dropout_rate)


def _eff_layer_kernel(cfg: EfficientConformerConfig, i: int) -> int:
    """Kernel for layer i (encoder.py:155-198): the index advances AFTER a
    stride layer is appended, so the stride layer itself still uses the
    pre-stride kernel; only layers after it get the recomputed k//s."""
    kernels = _eff_kernels(cfg)
    return kernels[sum(1 for j in cfg.stride_layer_idx if j < i)]


def init_efficient_conformer(rng, cfg: EfficientConformerConfig):
    from reverb_tpu.models.asr_model import (_init_conformer_layer,
                                             init_encoder_params)
    ks = jax.random.split(rng, cfg.num_blocks + 1)
    base = init_encoder_params(
        ks[0], dataclasses.replace(_eff_base_cfg(cfg, cfg.cnn_module_kernel),
                                   num_blocks=0))
    layers = []
    for i in range(cfg.num_blocks):
        lcfg = _eff_base_cfg(cfg, _eff_layer_kernel(cfg, i))
        lp = _init_conformer_layer(ks[i + 1], lcfg, False)
        if i in cfg.group_layer_idx:
            # grouped attention: pos biases are (h, d_k·g)
            d = cfg.output_size
            dk = d // cfg.attention_heads
            k1, k2 = jax.random.split(jax.random.fold_in(ks[i + 1], 99))
            from reverb_tpu.models.modules import xavier_uniform
            lp['self_attn']['pos_bias_u'] = xavier_uniform(
                k1, (cfg.attention_heads, dk * cfg.group_size))
            lp['self_attn']['pos_bias_v'] = xavier_uniform(
                k2, (cfg.attention_heads, dk * cfg.group_size))
        layers.append(lp)
    base['encoders'] = layers
    return base


def _avg_pool_ceil(x, s: int):
    """torch.nn.AvgPool1d(kernel=s, stride=s, ceil_mode=True,
    count_include_pad=False) over (B, T, D)."""
    B, T, D = x.shape
    Tp = -(-T // s) * s
    pad = Tp - T
    xs = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    cnt = jnp.pad(jnp.ones((T,), x.dtype), (0, pad))
    xs = xs.reshape(B, Tp // s, s, D).sum(axis=2)
    cnt = cnt.reshape(Tp // s, s).sum(axis=1)
    return xs / cnt[None, :, None]


def _efficient_layer(p, x, mask, pos_emb, mask_pad,
                     cfg: EfficientConformerConfig, i: int, rngs=None):
    """Conformer block; stride layers follow StrideConformerEncoderLayer
    (efficient_conformer/encoder_layer.py:44-150): the conv module
    downsamples and the pre-conv residual is AvgPool'd to match."""
    from reverb_tpu.models.encoder import conv_module
    base_cfg = _eff_base_cfg(cfg, _eff_layer_kernel(cfg, i))
    is_stride = i in cfg.stride_layer_idx
    stride = cfg.stride[list(cfg.stride_layer_idx).index(i)] if is_stride \
        else 1

    def drop(v):
        return dropout(v, cfg.dropout_rate, rngs.next() if rngs else None)

    residual = x
    xn = layer_norm(p['norm_ff_macaron'], x)
    x = residual + 0.5 * drop(feed_forward(p['feed_forward_macaron'], xn,
                                           base_cfg, rngs))
    residual = x
    xn = layer_norm(p['norm_mha'], x)
    if i in cfg.group_layer_idx:
        x_att = grouped_rel_pos_mha(p['self_attn'], xn, mask, pos_emb,
                                    cfg.attention_heads, cfg.group_size,
                                    cfg.dropout_rate,
                                    rngs.next() if rngs else None)
    else:
        x_att, _ = att.rel_pos_mha(p['self_attn'], xn, xn, xn, mask,
                                   pos_emb, cfg.attention_heads,
                                   cfg.dropout_rate,
                                   rngs.next() if rngs else None)
    x = residual + drop(x_att)

    residual = x
    xn = layer_norm(p['norm_conv'], x)
    if is_stride:
        # strided conv module: masked input, strided depthwise, symmetric
        # padding (efficient_conformer/convolution.py:95-160)
        from reverb_tpu.models.modules import (batch_norm_last,
                                               pointwise_conv_as_linear)
        k = base_cfg.cnn_module_kernel
        xc = xn * mask_pad[:, 0, :, None].astype(xn.dtype)
        xc = pointwise_conv_as_linear(p['pointwise_conv1'], xc)
        a, b = jnp.split(xc, 2, axis=-1)
        xc = a * jax.nn.sigmoid(b)
        w = p['depthwise_conv']['weight'].astype(xc.dtype).transpose(2, 1, 0)
        xc = jax.lax.conv_general_dilated(
            xc, w, window_strides=(stride,),
            padding=[((k - 1) // 2, (k - 1) // 2)],
            dimension_numbers=('NHC', 'HIO', 'NHC'),
            feature_group_count=xc.shape[-1],
            precision=jax.lax.Precision.HIGHEST)
        xc = xc + p['depthwise_conv']['bias'][None, None, :].astype(xc.dtype)
        xc = batch_norm_last(p['norm'], xc)
        xc = jax.nn.silu(xc)
        xc = pointwise_conv_as_linear(p['pointwise_conv2'], xc)
        new_pad = mask_pad[:, :, ::stride][:, :, :xc.shape[1]]
        xc = xc * new_pad[:, 0, :, None].astype(xc.dtype)
        residual = _avg_pool_ceil(residual, stride)[:, :xc.shape[1]]
        x = residual + drop(xc)
    else:
        xc, _ = conv_module(p, xn, mask_pad, base_cfg, rngs)
        x = residual + drop(xc)

    residual = x
    xn = layer_norm(p['norm_ff'], x)
    x = residual + 0.5 * drop(feed_forward(p['feed_forward'], xn, base_cfg,
                                           rngs))
    return layer_norm(p['norm_final'], x)


def efficient_conformer_forward(params, xs, xs_lens,
                                cfg: EfficientConformerConfig,
                                cmvn=None, rngs=None):
    """(B,T,F) → (B,T',D), masks — EfficientConformerEncoder.forward
    (encoder.py:232-287): masks/pos stride AFTER each stride layer."""
    base_cfg = _eff_base_cfg(cfg, cfg.cnn_module_kernel)
    B, T, _ = xs.shape
    masks = (~make_pad_mask(xs_lens, T))[:, None, :]
    if cmvn is not None:
        xs = (xs - cmvn[0]) * cmvn[1]
    xs, pos_emb, masks = SUBSAMPLE_FNS['conv2d'](params['embed'], xs, masks,
                                                 base_cfg, 0, rngs)
    mask_pad = masks
    att_mask = masks & masks.transpose(0, 2, 1)
    stride_at = dict(zip(cfg.stride_layer_idx, range(len(cfg.stride))))
    for i, lp in enumerate(params['encoders']):
        xs = _efficient_layer(lp, xs, att_mask, pos_emb, mask_pad, cfg, i,
                              rngs)
        if i in stride_at:
            s = cfg.stride[stride_at[i]]
            masks = masks[:, :, ::s]
            att_mask = att_mask[:, ::s, ::s]
            mask_pad = masks
            pos_emb = pos_emb[:, ::s]
    xs = layer_norm(params['after_norm'], xs)
    return xs, masks
