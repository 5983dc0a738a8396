"""Conformer / Transformer encoder with Language-Specific Layers (LSL).

Parity targets (reference file:line):
  - Conv2dSubsampling4/6/8, LinearInput  asr/wenet/transformer/subsampling.py
  - ConvolutionModule                    asr/wenet/transformer/convolution.py:23-144
  - ConformerEncoderLayer                asr/wenet/transformer/encoder_layer.py:164-244
  - LanguageSpecificConformerEncoderLayer encoder_layer.py:247-402
      * y = Σ_i cat_embs[i]·Linear_i(norm_ff(x)); x = residual + ½·FFN(y);
        then norm_final; then x = x + y   (the trailing +y is load-bearing)
  - BaseEncoder.forward                  asr/wenet/transformer/encoder.py:117-149
  - ConformerEncoder (+LSL first/last when num_langs>0)  encoder.py:453-579
  - streaming forward_chunk              encoder.py:231-339 (static-shape rings
        here: att_cache (L,B,H,Tc,2dk), cnn_cache (L,B,D,k-1))

TPU notes: the layer stack is a Python loop under jit (XLA CSEs the repeated
structure); activations run in cfg.compute_dtype (bf16 on TPU) with layernorm/
softmax in f32.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from reverb_tpu.models import attention as att
from reverb_tpu.models import embedding as emb
from reverb_tpu.models.modules import (ACTIVATIONS, Rngs, batch_norm_1d,
                                       batch_norm_last, conv1d, conv2d,
                                       depthwise_conv1d_ntc, dropout, glu,
                                       layer_norm, linear,
                                       pointwise_conv_as_linear, remat_policy)
from reverb_tpu.utils.common import (add_optional_chunk_mask, make_pad_mask)


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    input_size: int = 80
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: str = 'conv2d'
    pos_enc_layer_type: str = 'rel_pos'
    normalize_before: bool = True
    static_chunk_size: int = 0
    use_dynamic_chunk: bool = False
    use_dynamic_left_chunk: bool = False
    macaron_style: bool = True
    selfattention_layer_type: str = 'rel_selfattn'
    activation_type: str = 'swish'
    use_cnn_module: bool = True
    cnn_module_kernel: int = 15
    causal: bool = False
    cnn_module_norm: str = 'batch_norm'
    key_bias: bool = True
    num_langs: int = 0          # >0 → first+last layers are LSL
    encoder_type: str = 'conformer'   # 'conformer' | 'transformer'
    gradient_checkpointing: bool = False
    # 'full' recomputes the whole layer in the backward (min memory, ~33%
    # extra FLOPs); 'dots' saves every matmul output and replays only the
    # cheap VPU work (LN/activations/masks) — the MXU never recomputes, so
    # larger batches fit at ~zero FLOP cost (the v5e train-throughput
    # sweet spot; see tools/bench_train_mfu.py --remat)
    remat_policy: str = 'dots'        # 'full' | 'dots'
    # GPipe pipeline parallelism (parallel/pipeline.py): >1 routes the
    # homogeneous middle conformer stack through an S-stage microbatched
    # pipeline when the ambient mesh has a matching 'pipe' axis
    # (reverb-train --num_devices_pipe); 0/1 = off
    pipeline_stages: int = 0
    pipeline_microbatches: int = 2
    # MoE FFN (positionwise_feed_forward.py:58-121): token-choice top-k
    positionwise_layer_type: str = 'position_wise_feed_forward'
    n_expert: int = 8
    n_expert_per_token: int = 3

    @property
    def head_dim(self):
        return self.output_size // self.attention_heads

    @property
    def subsampling_rate(self):
        return {'linear': 1, 'conv2d2': 2, 'conv2d': 4,
                'conv2d6': 6, 'conv2d8': 8}[self.input_layer]


# ------------------------------ subsampling ------------------------------

def subsampled_len(cfg: EncoderConfig, T: int) -> int:
    if cfg.input_layer == 'linear':
        return T
    if cfg.input_layer == 'conv2d':
        return ((T - 1) // 2 - 1) // 2
    if cfg.input_layer == 'conv2d6':
        return ((T - 1) // 2 - 2) // 3
    if cfg.input_layer == 'conv2d8':
        return (((T - 1) // 2 - 1) // 2 - 1) // 2
    raise ValueError(cfg.input_layer)


def conv2d_subsampling4(p, x, x_mask, cfg: EncoderConfig, offset=0, rngs=None,
                        pos_len: int | None = None):
    """x (B,T,F) → (out (B,T',D), pos_emb, mask (B,1,T')).
    Parity: subsampling.py:172-226."""
    x = x[:, None, :, :]                        # (B,1,T,F)
    x = jax.nn.relu(conv2d(p['conv']['0'], x, stride=(2, 2)))
    x = jax.nn.relu(conv2d(p['conv']['2'], x, stride=(2, 2)))
    B, C, T, F = x.shape
    x = x.transpose(0, 2, 1, 3).reshape(B, T, C * F)
    x = linear(p['out']['0'], x)
    x, pos = _pos_enc(cfg, x, offset, rngs, pos_len)
    return x, pos, x_mask[:, :, 2::2][:, :, 2::2]


def linear_input(p, x, x_mask, cfg: EncoderConfig, offset=0, rngs=None,
                 pos_len=None):
    x = linear(p['out']['0'], x)
    x = layer_norm(p['out']['1'], x)
    x = dropout(x, cfg.dropout_rate, rngs.next() if rngs else None)
    x, pos = _pos_enc(cfg, x, offset, rngs, pos_len)
    return x, pos, x_mask


def _pos_enc(cfg: EncoderConfig, x, offset, rngs, pos_len=None):
    rng = rngs.next() if rngs else None
    if cfg.pos_enc_layer_type == 'rel_pos':
        return emb.rel_position_encoding(x, offset,
                                         cfg.positional_dropout_rate, rng,
                                         size=pos_len)
    if cfg.pos_enc_layer_type in ('abs_pos', 'abs_pos_whisper'):
        return emb.abs_position_encoding(x, offset,
                                         cfg.positional_dropout_rate, rng)
    if cfg.pos_enc_layer_type == 'no_pos':
        return emb.no_position_encoding(x, offset,
                                        cfg.positional_dropout_rate, rng)
    raise ValueError(cfg.pos_enc_layer_type)


SUBSAMPLE_FNS = {'conv2d': conv2d_subsampling4, 'linear': linear_input}


# ------------------------------ conv module ------------------------------

def conv_module(p, x, mask_pad, cfg: EncoderConfig, rngs=None,
                cnn_cache: Optional[jax.Array] = None):
    """Conformer conv: pw(2C)→GLU→dw(k)→norm→swish→pw. x (B,T,C).
    Returns (out, new_cnn_cache (B,C,k-1) when causal).

    TPU layout: everything stays (B,T,C) — the pointwise convs are plain
    matmuls on the MXU and the depthwise conv runs in NWC, so there are no
    (B,T,C)↔(B,C,T) layout copies (profiled at ~20 ms/fwd on the flagship
    before this change).  The streaming cnn_cache keeps its (B,C,k-1)
    public layout (tiny transposes)."""
    act = ACTIVATIONS[cfg.activation_type]
    if mask_pad is not None:
        keep = mask_pad.transpose(0, 2, 1)      # (B,T,1)
        x = jnp.where(keep, x, 0.0)
    lorder = cfg.cnn_module_kernel - 1 if cfg.causal else 0
    new_cache = None
    if lorder > 0:
        if cnn_cache is None:
            x = jnp.pad(x, ((0, 0), (lorder, 0), (0, 0)))
        else:
            x = jnp.concatenate([cnn_cache.transpose(0, 2, 1), x], axis=1)
        new_cache = x[:, -lorder:].transpose(0, 2, 1)
        pad_same = 0
    else:
        pad_same = (cfg.cnn_module_kernel - 1) // 2
    x = glu(pointwise_conv_as_linear(p['pointwise_conv1'], x), axis=-1)
    x = depthwise_conv1d_ntc(p['depthwise_conv'], x, padding=pad_same)
    if cfg.cnn_module_norm == 'layer_norm':
        x = act(layer_norm(p['norm'], x))
    else:
        x = act(batch_norm_last(p['norm'], x))
    x = pointwise_conv_as_linear(p['pointwise_conv2'], x)
    if mask_pad is not None:
        x = jnp.where(keep, x, 0.0)
    return x, new_cache


# ------------------------------ FFN ------------------------------

def feed_forward(p, x, cfg: EncoderConfig, rngs=None, activation=None):
    if 'experts' in p:
        return moe_feed_forward(p, x, cfg, rngs, activation)
    act = activation or ACTIVATIONS[cfg.activation_type]
    x = act(linear(p['w_1'], x))
    x = dropout(x, cfg.dropout_rate, rngs.next() if rngs else None)
    return linear(p['w_2'], x)


def moe_feed_forward(p, x, cfg: EncoderConfig, rngs=None, activation=None):
    """Token-choice top-k mixture-of-experts FFN.

    Parity: MoEFFNLayer (positionwise_feed_forward.py:58-121) — gate linear
    (no bias) → top-k router logits → softmax over the selected k (f32) →
    weighted sum of the selected experts' FFN outputs.

    TPU design: instead of the reference's per-expert gather/scatter (dynamic
    shapes), every expert runs densely over all tokens and non-selected
    experts get weight 0 — identical math, static shapes, one batched
    (E,·,·) MXU einsum per projection.  Dense compute costs E/k extra FLOPs,
    the right trade at reference scale (E=8).  The stacked expert tensors
    are annotated over the mesh's Auto 'expert' axis (expert parallelism:
    each device group computes its experts over all tokens; the weighted
    combine contracts E, so XLA reduces partial sums over ICI).
    """
    from reverb_tpu.parallel.mesh import constrain
    act = activation or ACTIVATIONS[cfg.activation_type]
    B, L, D = x.shape
    xs = x.reshape(-1, D)
    router = linear(p['gate'], xs)                       # (N, E)
    E = len(p['experts'])
    k = min(cfg.n_expert_per_token, E)
    logits, idx = jax.lax.top_k(router, k)               # (N, k)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    # dense per-token expert weights: we[n,e] = w[n,j] if idx[n,j]==e else 0
    we = jnp.sum(jnp.where(idx[:, :, None] == jnp.arange(E)[None, None, :],
                           w[:, :, None], 0.0), axis=1)  # (N, E)
    w1 = constrain(jnp.stack([ep['w_1']['weight'] for ep in p['experts']]),
                   'expert')                              # (E, H, D)
    b1 = constrain(jnp.stack([ep['w_1']['bias'] for ep in p['experts']]),
                   'expert')                              # (E, H)
    w2 = constrain(jnp.stack([ep['w_2']['weight'] for ep in p['experts']]),
                   'expert')                              # (E, D, H)
    b2 = constrain(jnp.stack([ep['w_2']['bias'] for ep in p['experts']]),
                   'expert')                              # (E, D)
    h = act(jnp.einsum('nd,ehd->enh', xs, w1) + b1[:, None, :])
    h = dropout(h, cfg.dropout_rate, rngs.next() if rngs else None)
    y = jnp.einsum('enh,edh->end', h, w2) + b2[:, None, :]   # (E, N, D)
    out = jnp.einsum('ne,end->nd', we, y)
    return out.reshape(B, L, D)


def _lsl_mix(lang_params, x, cat_embs):
    """y = Σ_i cat_embs[i] · Linear_i(x).  cat_embs: (num_langs,) or (B,num_langs).
    encoder_layer.py:376-391 / decoder_layer.py:316-331."""
    ys = jnp.stack([linear(lp, x) for lp in lang_params], axis=0)  # (L,B,T,D)
    if cat_embs.ndim == 1:
        w = cat_embs.astype(x.dtype)[:, None, None, None]
    else:
        w = cat_embs.astype(x.dtype).T[:, :, None, None]           # (L,B,1,1)
    return jnp.sum(w * ys, axis=0)


# ------------------------------ encoder layers ------------------------------

def conformer_layer(p, x, mask, pos_emb, mask_pad, cfg: EncoderConfig,
                    cat_embs=None, rngs=None, att_cache=None, cnn_cache=None,
                    is_lsl: bool = False):
    """One (LSL-)conformer block. Returns (x, new_att_cache, new_cnn_cache)."""
    rate = cfg.dropout_rate

    def drop(v):
        return dropout(v, rate, rngs.next() if rngs else None)

    # macaron FFN (½)
    if cfg.macaron_style:
        residual = x
        xn = layer_norm(p['norm_ff_macaron'], x)
        x = residual + 0.5 * drop(feed_forward(p['feed_forward_macaron'], xn,
                                               cfg, rngs))
    # MHSA
    residual = x
    xn = layer_norm(p['norm_mha'], x)
    arng = rngs.next() if rngs else None
    if cfg.selfattention_layer_type == 'rel_selfattn':
        x_att, new_att_cache = att.rel_pos_mha(
            p['self_attn'], xn, xn, xn, mask, pos_emb, cfg.attention_heads,
            cfg.attention_dropout_rate, arng, cache=att_cache)
    else:
        x_att, new_att_cache = att.mha(
            p['self_attn'], xn, xn, xn, mask, cfg.attention_heads,
            cfg.attention_dropout_rate, arng, cache=att_cache)
    x = residual + drop(x_att)

    # conv module
    new_cnn_cache = None
    if cfg.use_cnn_module:
        residual = x
        xn = layer_norm(p['norm_conv'], x)
        xc, new_cnn_cache = conv_module(p, xn, mask_pad, cfg, rngs, cnn_cache)
        x = residual + drop(xc)

    # final FFN (+ LSL mixing)
    residual = x
    xn = layer_norm(p['norm_ff'], x)
    ff_scale = 0.5 if cfg.macaron_style else 1.0
    if is_lsl:
        assert cat_embs is not None, "LSL layer requires cat_embs"
        y = _lsl_mix(p['language_layers'], xn, cat_embs)
        x = residual + ff_scale * drop(feed_forward(p['feed_forward'], y, cfg,
                                                    rngs))
        if cfg.use_cnn_module:
            x = layer_norm(p['norm_final'], x)
        x = x + y                         # encoder_layer.py:400
    else:
        x = residual + ff_scale * drop(feed_forward(p['feed_forward'], xn, cfg,
                                                    rngs))
        if cfg.use_cnn_module:
            x = layer_norm(p['norm_final'], x)
    return x, new_att_cache, new_cnn_cache


def transformer_layer(p, x, mask, pos_emb, mask_pad, cfg: EncoderConfig,
                      cat_embs=None, rngs=None, att_cache=None,
                      cnn_cache=None, is_lsl: bool = False):
    """Plain transformer encoder block (encoder_layer.py:22-121)."""
    rate = cfg.dropout_rate

    def drop(v):
        return dropout(v, rate, rngs.next() if rngs else None)

    residual = x
    xn = layer_norm(p['norm1'], x)
    arng = rngs.next() if rngs else None
    x_att, new_att_cache = att.mha(p['self_attn'], xn, xn, xn, mask,
                                   cfg.attention_heads,
                                   cfg.attention_dropout_rate, arng,
                                   cache=att_cache)
    x = residual + drop(x_att)
    residual = x
    xn = layer_norm(p['norm2'], x)
    x = residual + drop(feed_forward(p['feed_forward'], xn, cfg, rngs,
                                     activation=ACTIVATIONS['relu']))
    return x, new_att_cache, None


def _layer_is_lsl(cfg: EncoderConfig, i: int) -> bool:
    return cfg.num_langs > 0 and (i == 0 or i == cfg.num_blocks - 1)


def encoder_forward(params, xs, xs_lens, cfg: EncoderConfig,
                    cat_embs=None, cmvn=None,
                    decoding_chunk_size: int = 0,
                    num_decoding_left_chunks: int = -1,
                    rngs: Rngs | None = None,
                    chunk_rng=None,
                    return_layers: bool = False,
                    enable_full_context: bool = True):
    """Full encoder forward (encoder.py:117-149).

    xs: (B, T, F) features; xs_lens: (B,). Returns (out (B,T',D), masks
    (B,1,T')), plus per-layer outputs when return_layers
    (forward_return_layers, encoder.py:151-206 — feeds the context adaptor).
    cmvn: optional (mean, istd) applied before subsampling.
    """
    B, T, _ = xs.shape
    masks = (~make_pad_mask(xs_lens, T))[:, None, :]   # (B,1,T)
    if cmvn is not None:
        mean, istd = cmvn
        xs = (xs - mean.astype(xs.dtype)) * istd.astype(xs.dtype)
    sub_fn = SUBSAMPLE_FNS[cfg.input_layer]
    xs, pos_emb, masks = sub_fn(params['embed'], xs, masks, cfg, 0, rngs)
    mask_pad = masks
    chunk_masks = add_optional_chunk_mask(
        masks, cfg.use_dynamic_chunk, cfg.use_dynamic_left_chunk,
        decoding_chunk_size, cfg.static_chunk_size,
        num_decoding_left_chunks, rng=chunk_rng,
        enable_full_context=enable_full_context)

    layer_fn = (conformer_layer if cfg.encoder_type == 'conformer'
                else transformer_layer)

    # GPipe region: when the config asks for pipeline_stages S>1 AND the
    # ambient mesh carries a matching 'pipe' axis, the maximal homogeneous
    # (non-LSL) middle run whose length divides S goes through the
    # microbatched pipeline (parallel/pipeline.py) — manual over only
    # 'pipe', so DP/TP sharding of the batch/params composes in the same
    # jitted step.  Remaining layers run sequentially as usual.
    pipe_lo = pipe_hi = 0
    if cfg.pipeline_stages > 1 and not return_layers:
        am = jax.sharding.get_abstract_mesh()
        sizes = dict(getattr(am, 'shape_tuple', ()) or ())
        if sizes.get('pipe', 1) == cfg.pipeline_stages:
            lo = 1 if cfg.num_langs > 0 else 0
            hi = (cfg.num_blocks - 1 if cfg.num_langs > 0
                  else cfg.num_blocks)
            n = ((hi - lo) // cfg.pipeline_stages) * cfg.pipeline_stages
            if n >= cfg.pipeline_stages and \
                    xs.shape[0] % cfg.pipeline_microbatches == 0:
                pipe_lo, pipe_hi = lo, lo + n

    def _pipelined_region(xs):
        from reverb_tpu.parallel.pipeline import (pipeline_apply,
                                                  stack_layer_params)
        mids = params['encoders'][pipe_lo:pipe_hi]
        stacked = {'p': stack_layer_params(mids)}
        if rngs is not None:
            stacked['k'] = jnp.stack(
                [rngs.next() for _ in range(pipe_hi - pipe_lo)])

        def pl_fn(lp, h, mb_idx, cm, mp):
            # per-layer key folded with the microbatch index: microbatches
            # draw independent dropout masks, and the remat replay
            # re-derives the same ones
            r = (Rngs(jax.random.fold_in(lp['k'], mb_idx))
                 if 'k' in lp else None)
            out, _, _ = layer_fn(lp['p'], h, cm, pos_emb, mp, cfg,
                                 cat_embs, r, is_lsl=False)
            return out
        return pipeline_apply(
            pl_fn, stacked, xs, cfg.pipeline_microbatches,
            mesh=jax.sharding.get_abstract_mesh(), axis='pipe',
            remat=cfg.gradient_checkpointing,
            batch_args=(chunk_masks, mask_pad), takes_mb_index=True)

    layer_outs = []
    for i, lp in enumerate(params['encoders']):
        if pipe_hi > pipe_lo and i == pipe_lo:
            xs = _pipelined_region(xs)
        if pipe_lo <= i < pipe_hi:
            continue
        if cfg.gradient_checkpointing and rngs is not None:
            # the per-layer dropout key is an explicit argument so the remat
            # replay re-derives the SAME keys (a closed-over stateful Rngs
            # would advance again on replay and leak tracers)
            def step(x, key, lp=lp, i=i):
                return layer_fn(lp, x, chunk_masks, pos_emb, mask_pad, cfg,
                                cat_embs, Rngs(key),
                                is_lsl=_layer_is_lsl(cfg, i))
            xs, _, _ = jax.checkpoint(
                step, policy=remat_policy(cfg.remat_policy))(xs, rngs.next())
        else:
            xs, _, _ = layer_fn(lp, xs, chunk_masks, pos_emb, mask_pad, cfg,
                                cat_embs, rngs,
                                is_lsl=_layer_is_lsl(cfg, i))
        if return_layers:
            layer_outs.append(xs)
    if cfg.normalize_before:
        xs = layer_norm(params['after_norm'], xs)
    if return_layers:
        return xs, masks, layer_outs
    return xs, masks


def init_stream_caches(cfg: EncoderConfig, cache_t: int, batch: int = 1,
                       dtype=jnp.float32):
    """Zero-initialized static streaming caches:
    att (L, B, H, cache_t, 2·dk), cnn (L, B, D, k-1)."""
    L = cfg.num_blocks
    att = jnp.zeros((L, batch, cfg.attention_heads, cache_t,
                     2 * cfg.head_dim), dtype)
    lorder = cfg.cnn_module_kernel - 1 if (cfg.use_cnn_module and cfg.causal) \
        else 0
    cnn = jnp.zeros((L, batch, cfg.output_size, lorder), dtype) \
        if lorder else None
    return att, cnn


def encoder_forward_chunk(params, xs, offset, cfg: EncoderConfig,
                          att_cache, cnn_cache, cat_embs=None, cmvn=None):
    """Streaming chunk forward with static-shape ring KV/conv caches.

    Parity: encoder.py:231-339 (per-layer KV cache (H,Tc,2dk) + conv cache);
    redesigned with FIXED cache shapes so every streaming step is the same
    compiled XLA program: the cache is a right-aligned ring whose first
    `cache_t - min(offset, cache_t)` slots are masked out of attention, and
    rel-pos indices follow the absolute stream position.

    xs: (B, window_T, F) raw feature window (window_T yields chunk_t
        subsampled frames, e.g. (c-1)*4+7 for conv2d).
    offset: traced int scalar — absolute SUBSAMPLED position of this chunk —
        or an (B,) int vector of per-stream positions (a multi-stream pool
        advances slots at different absolute positions through one batched
        program; rel-pos tables and cache-validity masks go per-stream).
    att_cache: (L, B, H, cache_t, 2*dk); cnn_cache: (L, B, D, k-1) or None.
    Returns (ys (B, chunk_t, D), new_att_cache, new_cnn_cache).
    """
    from reverb_tpu.models.embedding import pe_table

    B = xs.shape[0]
    masks = jnp.ones((B, 1, xs.shape[1]), dtype=bool)
    if cmvn is not None:
        mean, istd = cmvn
        xs = (xs - mean.astype(xs.dtype)) * istd.astype(xs.dtype)
    sub_fn = SUBSAMPLE_FNS[cfg.input_layer]
    cache_t = att_cache.shape[3]
    chunk_t = subsampled_len(cfg, xs.shape[1])
    xs, _, _ = sub_fn(params['embed'], xs, masks, cfg, 0)

    # rel-pos over [offset - cache_t, offset + chunk_t): key slot j ↔ absolute
    # position offset - cache_t + j (invalid slots are masked anyway)
    S = cache_t + chunk_t
    table = jnp.asarray(pe_table(cfg.output_size))
    off_v = jnp.atleast_1d(jnp.asarray(offset))          # (1,) or (B,)
    idx = jnp.clip(off_v[:, None] - cache_t + jnp.arange(S), 0,
                   table.shape[0] - 1)
    pos_emb = table[idx].astype(xs.dtype)                # (1|B, S, D)

    # key validity: last min(offset, cache_t) cache slots + whole chunk
    valid_cache = jnp.minimum(off_v, cache_t)            # (1|B,)
    slot = jnp.arange(S)
    key_mask = jnp.broadcast_to(
        slot[None, None, :] >= cache_t - valid_cache[:, None, None],
        (B, 1, S))

    layer_fn = (conformer_layer if cfg.encoder_type == 'conformer'
                else transformer_layer)
    new_att, new_cnn = [], []
    for i, lp in enumerate(params['encoders']):
        xs, a_cache, c_cache = layer_fn(
            lp, xs, key_mask, pos_emb, None, cfg, cat_embs,
            att_cache=att_cache[i],
            cnn_cache=(cnn_cache[i] if cnn_cache is not None else None),
            is_lsl=_layer_is_lsl(cfg, i))
        new_att.append(a_cache[:, :, -cache_t:, :])
        if c_cache is not None:
            new_cnn.append(c_cache)
    if cfg.normalize_before:
        xs = layer_norm(params['after_norm'], xs)
    new_att_cache = jnp.stack(new_att, axis=0)
    new_cnn_cache = jnp.stack(new_cnn, axis=0) if new_cnn else cnn_cache
    return xs, new_att_cache, new_cnn_cache


def encoder_forward_chunk_by_chunk(params, xs, cfg: EncoderConfig,
                                   decoding_chunk_size: int,
                                   num_decoding_left_chunks: int = -1,
                                   cat_embs=None, cmvn=None):
    """Full-utterance simulation of streaming (encoder.py:341-402): overlapped
    raw-feature windows stride `subsample·chunk`, each produces chunk_t
    subsampled frames; caches carry between calls.

    xs: (1, T, F). Returns (ys (1, T', D), masks)."""
    sub = cfg.subsampling_rate
    context = {1: 1, 4: 7, 6: 11, 8: 15}[sub]   # right_context + 1
    stride = sub * decoding_chunk_size
    window = (decoding_chunk_size - 1) * sub + context
    num_left = (num_decoding_left_chunks if num_decoding_left_chunks >= 0
                else 16)
    cache_t = decoding_chunk_size * num_left
    att_cache, cnn_cache = init_stream_caches(cfg, cache_t, xs.shape[0],
                                              xs.dtype)
    outputs = []
    offset = 0
    T = xs.shape[1]
    for start in range(0, T - context + 1, stride):
        end = min(start + window, T)
        chunk = xs[:, start:end]
        ys, att_cache, cnn_cache = encoder_forward_chunk(
            params, chunk, jnp.asarray(offset), cfg, att_cache, cnn_cache,
            cat_embs, cmvn)
        outputs.append(ys)
        offset += ys.shape[1]
    ys = jnp.concatenate(outputs, axis=1)
    masks = jnp.ones((xs.shape[0], 1, ys.shape[1]), bool)
    return ys, masks
