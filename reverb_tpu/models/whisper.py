"""Whisper model family: encoder/decoder forward + HF weight converter.

Capability parity with asr/wenet/whisper/ (whisper.py:28 +
convert_whisper_to_wenet_config_and_ckpt.py — SURVEY.md §2.4): run OpenAI
Whisper checkpoints through this framework.  Architecture (public Whisper
spec): log-mel (B, T, 80) → conv1d(k3,s1)+GELU → conv1d(k3,s2)+GELU →
sinusoidal pos → pre-LN transformer encoder; decoder = learned positional
embedding + pre-LN transformer with cross-attention, tied output embedding,
no bias on K projections.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from reverb_tpu.models import attention as att
from reverb_tpu.models.embedding import pe_table
from reverb_tpu.models.modules import (conv1d, embedding, init_embedding,
                                       init_conv1d, init_layer_norm,
                                       init_linear, layer_norm, linear)
from reverb_tpu.utils.common import make_pad_mask, subsequent_mask


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    n_mels: int = 80
    n_audio_ctx: int = 1500
    n_audio_state: int = 384
    n_audio_head: int = 6
    n_audio_layer: int = 4
    n_vocab: int = 51865
    n_text_ctx: int = 448
    n_text_state: int = 384
    n_text_head: int = 6
    n_text_layer: int = 4


def _gelu(x):
    """Exact (erf) GELU — torch.nn.GELU's default, which both OpenAI and
    wenet whisper use; jax.nn.gelu defaults to the tanh approximation."""
    return jax.nn.gelu(x, approximate=False)


def _init_attn(rng, d: int):
    ks = jax.random.split(rng, 4)
    return {'linear_q': init_linear(ks[0], d, d),
            'linear_k': init_linear(ks[1], d, d, bias=False),
            'linear_v': init_linear(ks[2], d, d),
            'linear_out': init_linear(ks[3], d, d)}


def _init_block(rng, d: int, cross: bool):
    ks = jax.random.split(rng, 5)
    p = {'self_attn': _init_attn(ks[0], d),
         'norm1': init_layer_norm(d),
         'mlp': {'w_1': init_linear(ks[1], d, 4 * d),
                 'w_2': init_linear(ks[2], 4 * d, d)},
         'norm_mlp': init_layer_norm(d)}
    if cross:
        p['cross_attn'] = _init_attn(ks[3], d)
        p['norm2'] = init_layer_norm(d)
    return p


def init_whisper(rng, cfg: WhisperConfig):
    ks = jax.random.split(rng, cfg.n_audio_layer + cfg.n_text_layer + 6)
    enc = {'conv1': init_conv1d(ks[0], cfg.n_mels, cfg.n_audio_state, 3),
           'conv2': init_conv1d(ks[1], cfg.n_audio_state, cfg.n_audio_state,
                                3),
           'blocks': [_init_block(ks[2 + i], cfg.n_audio_state, False)
                      for i in range(cfg.n_audio_layer)],
           'ln_post': init_layer_norm(cfg.n_audio_state)}
    koff = 2 + cfg.n_audio_layer
    dec = {'token_embedding': init_embedding(ks[koff], cfg.n_vocab,
                                             cfg.n_text_state),
           'positional_embedding': jax.random.normal(
               ks[koff + 1], (cfg.n_text_ctx, cfg.n_text_state)) * 0.01,
           'blocks': [_init_block(ks[koff + 2 + i], cfg.n_text_state, True)
                      for i in range(cfg.n_text_layer)],
           'ln': init_layer_norm(cfg.n_text_state)}
    return {'encoder': enc, 'decoder': dec}


def whisper_encode(params, mel, cfg: WhisperConfig):
    """mel (B, T, n_mels) → (B, T//2, D)."""
    x = mel.transpose(0, 2, 1)
    x = _gelu(conv1d(params['conv1'], x, padding=1))
    x = _gelu(conv1d(params['conv2'], x, stride=2, padding=1))
    x = x.transpose(0, 2, 1)
    T = x.shape[1]
    if 'positional_embedding' in params:   # converted checkpoints carry the
        pos = jnp.asarray(params['positional_embedding'])  # exact buffer
    else:
        pos = jnp.asarray(pe_table(cfg.n_audio_state, max(T, cfg.n_audio_ctx)))
    x = x + pos[None, :T].astype(x.dtype)
    for blk in params['blocks']:
        xn = layer_norm(blk['norm1'], x)
        a, _ = att.mha(blk['self_attn'], xn, xn, xn, None, cfg.n_audio_head)
        x = x + a
        xn = layer_norm(blk['norm_mlp'], x)
        x = x + linear(blk['mlp']['w_2'],
                       _gelu(linear(blk['mlp']['w_1'], xn)))
    return layer_norm(params['ln_post'], x)


def whisper_decode(params, tokens, audio_features, cfg: WhisperConfig):
    """tokens (B, L) → logits (B, L, V); causal self-attn + cross-attn."""
    B, L = tokens.shape
    x = embedding(params['token_embedding'], tokens)
    x = x + params['positional_embedding'][None, :L].astype(x.dtype)
    causal = subsequent_mask(L)[None]
    for blk in params['blocks']:
        xn = layer_norm(blk['norm1'], x)
        a, _ = att.mha(blk['self_attn'], xn, xn, xn, causal,
                       cfg.n_text_head)
        x = x + a
        xn = layer_norm(blk['norm2'], x)
        a, _ = att.mha(blk['cross_attn'], xn, audio_features, audio_features,
                       None, cfg.n_text_head)
        x = x + a
        xn = layer_norm(blk['norm_mlp'], x)
        x = x + linear(blk['mlp']['w_2'],
                       _gelu(linear(blk['mlp']['w_1'], xn)))
    x = layer_norm(params['ln'], x)
    if 'output_layer' in params:     # untied head (wenet-format checkpoints)
        return linear(params['output_layer'], x)
    # tied output projection
    return x @ params['token_embedding']['weight'].T.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=('cfg', 'sot_len', 'eot'))
def _greedy_loop(params, feats, tokens0, cfg: WhisperConfig, sot_len: int,
                 eot: int):
    """One compiled program per (B, total_len) shape: a `lax.while_loop`
    over a static token buffer. Future positions hold `eot` padding, which
    the causal mask keeps invisible to every already-decoded position."""
    B, total = tokens0.shape

    def cond(state):
        _, cur, finished = state
        return (cur < total) & ~jnp.all(finished)

    def step(state):
        tokens, cur, finished = state
        logits = whisper_decode(params['decoder'], tokens, feats, cfg)
        prev = jax.lax.dynamic_index_in_dim(
            logits, cur - 1, axis=1, keepdims=False)          # (B, V)
        nxt = jnp.argmax(prev, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, eot, nxt)
        tokens = jax.lax.dynamic_update_slice(
            tokens, nxt[:, None], (0, cur))
        return tokens, cur + 1, finished | (nxt == eot)

    out, _, _ = jax.lax.while_loop(
        cond, step,
        (tokens0, jnp.int32(sot_len), jnp.zeros((B,), bool)))
    return out


def whisper_greedy_decode(params, mel, cfg: WhisperConfig, sot_sequence,
                          eot: int, max_len: int = 224):
    """Batched greedy decode — one compile per (B, length) shape (the former
    host loop re-jitted the decoder every step as `tokens` grew)."""
    feats = whisper_encode(params['encoder'], mel, cfg)
    B = mel.shape[0]
    L0 = len(sot_sequence)
    total = min(L0 + max_len, cfg.n_text_ctx)
    tokens0 = jnp.full((B, total), eot, jnp.int32)
    tokens0 = tokens0.at[:, :L0].set(
        jnp.asarray(sot_sequence, jnp.int32)[None])
    out = _greedy_loop(params, feats, tokens0, cfg, L0, int(eot))
    return np.asarray(out)[:, L0:]


# ------------------------------ HF converter ------------------------------

def convert_hf_whisper(hf_state: Dict[str, np.ndarray]
                       ) -> Dict:
    """Map a HuggingFace WhisperForConditionalGeneration state_dict into this
    module's param tree (whisper/convert_whisper_to_wenet_config_and_ckpt.py
    capability)."""
    g = {k.replace('model.', '', 1): np.asarray(v)
         for k, v in hf_state.items()}

    def lin(prefix, bias=True):
        p = {'weight': g[f'{prefix}.weight']}
        if bias and f'{prefix}.bias' in g:
            p['bias'] = g[f'{prefix}.bias']
        return p

    def ln(prefix):
        return {'weight': g[f'{prefix}.weight'], 'bias': g[f'{prefix}.bias']}

    def attn(prefix):
        return {'linear_q': lin(f'{prefix}.q_proj'),
                'linear_k': lin(f'{prefix}.k_proj', bias=False),
                'linear_v': lin(f'{prefix}.v_proj'),
                'linear_out': lin(f'{prefix}.out_proj')}

    def block(prefix, cross):
        p = {'self_attn': attn(f'{prefix}.self_attn'),
             'norm1': ln(f'{prefix}.self_attn_layer_norm'),
             'mlp': {'w_1': lin(f'{prefix}.fc1'),
                     'w_2': lin(f'{prefix}.fc2')},
             'norm_mlp': ln(f'{prefix}.final_layer_norm')}
        if cross:
            p['cross_attn'] = attn(f'{prefix}.encoder_attn')
            p['norm2'] = ln(f'{prefix}.encoder_attn_layer_norm')
        return p

    n_enc = len({k.split('.')[2] for k in g
                 if k.startswith('encoder.layers.')})
    n_dec = len({k.split('.')[2] for k in g
                 if k.startswith('decoder.layers.')})
    enc = {'conv1': {'weight': g['encoder.conv1.weight'],
                     'bias': g['encoder.conv1.bias']},
           'conv2': {'weight': g['encoder.conv2.weight'],
                     'bias': g['encoder.conv2.bias']},
           'positional_embedding': g['encoder.embed_positions.weight'],
           'blocks': [block(f'encoder.layers.{i}', False)
                      for i in range(n_enc)],
           'ln_post': ln('encoder.layer_norm')}
    dec = {'token_embedding': {'weight': g['decoder.embed_tokens.weight']},
           'positional_embedding': g['decoder.embed_positions.weight'],
           'blocks': [block(f'decoder.layers.{i}', True)
                      for i in range(n_dec)],
           'ln': ln('decoder.layer_norm')}
    return {'encoder': enc, 'decoder': dec}


def convert_wenet_whisper(state: Dict[str, np.ndarray]) -> Dict:
    """Map a wenet-format whisper state_dict (what the reference's
    whisper/convert_whisper_to_wenet_config_and_ckpt.py produces:
    TransformerEncoder with input_layer=conv1d2 / abs_pos_whisper +
    TransformerDecoder with embed_learnable_pe, key_bias=False) into this
    module's param tree."""
    g = {k: np.asarray(v) for k, v in state.items()}

    def lin(prefix, bias=True):
        p = {'weight': g[f'{prefix}.weight']}
        if bias and f'{prefix}.bias' in g:
            p['bias'] = g[f'{prefix}.bias']
        return p

    def ln(prefix):
        return {'weight': g[f'{prefix}.weight'], 'bias': g[f'{prefix}.bias']}

    def attn(prefix):
        return {'linear_q': lin(f'{prefix}.linear_q'),
                'linear_k': lin(f'{prefix}.linear_k', bias=False),
                'linear_v': lin(f'{prefix}.linear_v'),
                'linear_out': lin(f'{prefix}.linear_out')}

    def enc_block(prefix):
        return {'self_attn': attn(f'{prefix}.self_attn'),
                'norm1': ln(f'{prefix}.norm1'),
                'mlp': {'w_1': lin(f'{prefix}.feed_forward.w_1'),
                        'w_2': lin(f'{prefix}.feed_forward.w_2')},
                'norm_mlp': ln(f'{prefix}.norm2')}

    def dec_block(prefix):
        return {'self_attn': attn(f'{prefix}.self_attn'),
                'norm1': ln(f'{prefix}.norm1'),
                'cross_attn': attn(f'{prefix}.src_attn'),
                'norm2': ln(f'{prefix}.norm2'),
                'mlp': {'w_1': lin(f'{prefix}.feed_forward.w_1'),
                        'w_2': lin(f'{prefix}.feed_forward.w_2')},
                'norm_mlp': ln(f'{prefix}.norm3')}

    n_enc = 1 + max(int(k.split('.')[2]) for k in g
                    if k.startswith('encoder.encoders.'))
    n_dec = 1 + max(int(k.split('.')[2]) for k in g
                    if k.startswith('decoder.decoders.'))
    enc = {'conv1': lin('encoder.embed.conv.0'),
           'conv2': lin('encoder.embed.conv.2'),
           'positional_embedding': g['encoder.embed.pos_enc.pe'][0],
           'blocks': [enc_block(f'encoder.encoders.{i}')
                      for i in range(n_enc)],
           'ln_post': ln('encoder.after_norm')}
    dec = {'token_embedding': {'weight': g['decoder.embed.0.weight']},
           'positional_embedding': g['decoder.embed.1.pe'][0],
           'blocks': [dec_block(f'decoder.decoders.{i}')
                      for i in range(n_dec)],
           'ln': ln('decoder.after_norm')}
    if 'decoder.output_layer.weight' in g:
        out_w = g['decoder.output_layer.weight']
        if not np.array_equal(out_w, dec['token_embedding']['weight']) or \
                'decoder.output_layer.bias' in g:
            dec['output_layer'] = lin('decoder.output_layer')
    return {'encoder': enc, 'decoder': dec}


def load_hf_whisper(model_name: str = 'openai/whisper-tiny'):
    """Load a HF whisper checkpoint (requires the transformers package)."""
    import torch
    from transformers import WhisperForConditionalGeneration
    hf = WhisperForConditionalGeneration.from_pretrained(model_name)
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    c = hf.config
    cfg = WhisperConfig(
        n_mels=c.num_mel_bins, n_audio_state=c.d_model,
        n_audio_head=c.encoder_attention_heads,
        n_audio_layer=c.encoder_layers, n_vocab=c.vocab_size,
        n_text_ctx=c.max_target_positions, n_text_state=c.d_model,
        n_text_head=c.decoder_attention_heads, n_text_layer=c.decoder_layers)
    return convert_hf_whisper(state), cfg
