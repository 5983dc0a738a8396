"""CTL model: dual streaming/non-streaming encoder with contrastive loss.

Capability parity with asr/wenet/ctl_model/ (asr_model_ctl.py:30 —
SURVEY.md §2.4): the same encoder runs twice per batch — once full-context,
once chunk-masked (streaming view) — and an InfoNCE contrastive term pulls
the two views' frame representations together, on top of the standard hybrid
CTC/attention loss on the streaming view.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from reverb_tpu.models.asr_model import ModelConfig, compute_loss, \
    forward_encoder
from reverb_tpu.models.modules import Rngs


def ctl_contrastive_loss(full_out, stream_out, mask, temperature: float = 0.1,
                         logit_weight=None):
    """Frame-level InfoNCE between the two encoder views (per utterance)."""
    B, T, D = full_out.shape
    a = full_out / (jnp.linalg.norm(full_out, axis=-1, keepdims=True) + 1e-8)
    b = stream_out / (jnp.linalg.norm(stream_out, axis=-1, keepdims=True)
                      + 1e-8)
    sims = jnp.einsum('btd,bsd->bts', a, b) / temperature
    labels = jnp.arange(T)
    logp = jax.nn.log_softmax(sims, axis=-1)
    pos = jnp.take_along_axis(
        logp, jnp.broadcast_to(labels[None, :, None], (B, T, 1)),
        axis=-1)[..., 0]
    valid = mask[:, 0, :]
    return -jnp.sum(jnp.where(valid, pos, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)


def ctl_compute_loss(params, cfg: ModelConfig, batch, rng=None,
                     ctl_weight: float = 1.0, temperature: float = 0.1,
                     decoding_chunk_size: int = 16):
    """Streaming-view ASR loss + contrastive alignment to the full view."""
    base = compute_loss(params, cfg, batch, rng=rng)
    cat = batch.get('cat_embs')
    full_out, mask = forward_encoder(params, cfg, batch['feats'],
                                     batch['feats_lengths'], cat)
    stream_out, _ = forward_encoder(params, cfg, batch['feats'],
                                    batch['feats_lengths'], cat,
                                    decoding_chunk_size=decoding_chunk_size)
    ctl = ctl_contrastive_loss(jax.lax.stop_gradient(full_out), stream_out,
                               mask, temperature)
    out = dict(base)
    out['loss_ctl'] = ctl
    out['loss'] = base['loss'] + ctl_weight * ctl
    return out
