"""Context adaptor: deep-biasing personalization module.

Parity: asr/wenet/transformer/context_adaptor.py:20-147 (Amazon CTC
personalization paper) — context phrases are BiLSTM-encoded (final hidden
states, with a learned blank term prepended), the ASR encoder's weighted
layer mix (0.5·L[-1] + 0.25·L[-9] + 0.25·L[-15], :137-147) cross-attends to
the phrase embeddings with 1 head, and frames whose attention argmax picks
the blank term are zeroed (:67-93).  The adaptor output is ADDED to the
encoder output (asr_model.py:162-165).
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp

from reverb_tpu.diar.models import init_lstm, lstm_forward
from reverb_tpu.models.attention import mha
from reverb_tpu.models.modules import embedding, init_embedding, init_linear


@dataclasses.dataclass(frozen=True)
class ContextAdaptorConfig:
    vocab_size: int = 5000
    output_size: int = 512
    embedding_dim: int = 128
    num_layers: int = 2
    attention_heads: int = 1


def init_context_adaptor(rng, cfg: ContextAdaptorConfig):
    ks = jax.random.split(rng, 2 * cfg.num_layers + 5)
    h = cfg.output_size // 2
    lstms = []
    d = cfg.embedding_dim
    for i in range(cfg.num_layers):
        lstms.append({'fwd': init_lstm(ks[2 * i], d, h),
                      'bwd': init_lstm(ks[2 * i + 1], d, h)})
        d = 2 * h
    D = cfg.output_size
    return {
        'embed': init_embedding(ks[-5], cfg.vocab_size + 1,
                                cfg.embedding_dim),
        'lstm': lstms,
        'attention': {
            'linear_q': init_linear(ks[-4], D, D),
            'linear_k': init_linear(ks[-3], D, D),
            'linear_v': init_linear(ks[-2], D, D),
            'linear_out': init_linear(ks[-1], D, D),
        },
    }


def encode_cv(params, cv, cv_lengths, cfg: ContextAdaptorConfig):
    """Context phrases (N, L) int32 + lengths → (1, N+1, D) embeddings.

    A learned blank term (token id = vocab_size) is prepended
    (context_adaptor.py:95-135)."""
    N, L = cv.shape
    blank = jnp.zeros((1, L), cv.dtype).at[0, 0].set(cfg.vocab_size)
    cv = jnp.concatenate([blank, cv], axis=0)
    lengths = jnp.concatenate(
        [jnp.ones((1,), cv_lengths.dtype), cv_lengths])
    from reverb_tpu.utils.common import reverse_sequence
    x = embedding(params['embed'], cv)                  # (N+1, L, E)
    idx = jnp.maximum(lengths - 1, 0)
    valid = (jnp.arange(x.shape[1])[None, :]
             < lengths[:, None])[:, :, None]
    for lp in params['lstm']:
        xm = jnp.where(valid, x, 0.0)
        fwd = lstm_forward(lp['fwd'], xm)
        # packed-sequence backward semantics (context_adaptor.py:126-130):
        # the reverse direction starts at each term's TRUE last token, so
        # reverse only the valid region, run forward, un-reverse
        rx = reverse_sequence(xm, lengths, 0.0)
        bwd = reverse_sequence(lstm_forward(lp['bwd'], rx), lengths, 0.0)
        x = jnp.concatenate([fwd, bwd], axis=-1)
    # final hidden state of each direction (h_n of the packed LSTM)
    h = x.shape[-1] // 2
    last_fwd = jnp.take_along_axis(
        x[..., :h], idx[:, None, None], axis=1)[:, 0]   # (N+1, h)
    last_bwd = x[:, 0, h:]           # un-reversed pos 0 = backward final
    return jnp.concatenate([last_fwd, last_bwd], axis=-1)[None]  # (1,N+1,D)


def combine_layers(layer_outs: List[jax.Array]) -> jax.Array:
    """0.5·L[-1] + 0.25·L[-9] + 0.25·L[-15] (context_adaptor.py:137-147);
    clamps indices for shallow encoders."""
    n = len(layer_outs)
    a = layer_outs[-1]
    b = layer_outs[-9] if n >= 9 else layer_outs[max(n // 2 - 1, 0)]
    c = layer_outs[-15] if n >= 15 else layer_outs[0]
    return 0.5 * a + 0.25 * b + 0.25 * c


def context_adaptor_forward(params, encoder_layer_outs: List[jax.Array],
                            cv_encoder_out: jax.Array,
                            cfg: ContextAdaptorConfig):
    """(layer outs, (1, N+1, D) phrase embs) → bias (B, T, D) to ADD to the
    encoder output; frames whose attention picks the blank term are zeroed."""
    q = combine_layers(encoder_layer_outs)              # (B, T, D)
    B = q.shape[0]
    kv = jnp.broadcast_to(cv_encoder_out,
                          (B,) + cv_encoder_out.shape[1:])
    out, _, attn = mha(params['attention'], q, kv, kv, None,
                       cfg.attention_heads, return_weights=True)
    # attn: (B, H, T, N+1); blank term = index 0
    picks_blank = jnp.argmax(attn[:, 0], axis=-1) == 0  # (B, T)
    return jnp.where(picks_blank[..., None], 0.0, out)
