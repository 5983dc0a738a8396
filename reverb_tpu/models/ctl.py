"""CTL model: dual streaming/non-streaming encoder with contrastive loss.

Reference-exact semantics (asr/wenet/ctl_model/asr_model_ctl.py:30-292,
Interspeech 2023 "Enhancing the Unified Streaming and Non-streaming Model
with Contrastive Learning"):

  loss = loss_full + loss_chunk + ctl_weight * CTL

- loss_full: hybrid CTC/attention loss on the full-context encoder view
  (ctl_model/encoder.py:107-125 ``forward_full``).
- loss_chunk: the same loss on the chunk-masked streaming view; the dual
  encoder builds its chunk mask with ``enable_full_context=False`` so
  dynamic-chunk training never samples the full-context escape hatch
  (ctl_model/encoder.py:90-97).
- CTL (asr_model_ctl.py:256-292): frame-level InfoNCE — cosine similarity
  between the chunk view's frame x_t and [full-view y_t ; N sampled
  negatives], temperature ``logit_temp``, cross-entropy toward the
  positive, pad frames masked, normalized by the valid-frame count.
- negatives (asr_model_ctl.py:218-254, the fairseq sampler): per utterance
  i, N frames uniform over [0, len_i-1) of the SAME utterance's full view,
  with the collision shift (idx >= t → idx+1) so a sampled negative never
  sits at its own positive position; value collisions that survive
  (identical frame vectors) are squashed to -inf in the logits.

Gradients flow through both views and through the negatives, as in the
reference (only the index sampling is non-differentiable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from reverb_tpu.models.asr_model import ModelConfig, forward_encoder, \
    loss_from_encoder
from reverb_tpu.models.modules import Rngs


def sample_negatives(key, y, n_negatives: int, lengths, neg_idxs=None):
    """Sample per-frame negatives from the same utterance.

    y: (B, T, D) full-view encoder output; lengths: (B,) valid frames.
    Returns (negs (N, B, T, D), neg_idxs (B, T, N)).  Pass ``neg_idxs`` to
    reproduce a fixed draw (oracle tests).  Mirrors
    asr_model_ctl.py:218-254: idx ~ U[0, len_i-1), then +1 when idx >= t.
    """
    B, T, D = y.shape
    if neg_idxs is None:
        high = jnp.maximum(lengths.astype(jnp.int32)[:, None, None] - 1, 1)
        idx = jax.random.randint(key, (B, T, n_negatives), 0, high)
        t = jnp.arange(T)[None, :, None]
        neg_idxs = jnp.where(idx >= t, idx + 1, idx)
    flat = neg_idxs.reshape(B, T * n_negatives)
    negs = jnp.take_along_axis(y, flat[:, :, None], axis=1)
    negs = negs.reshape(B, T, n_negatives, D).transpose(2, 0, 1, 3)
    return negs, neg_idxs


def ctl_contrastive_loss(x, y, negs, mask, temperature: float = 0.1):
    """InfoNCE over [positive ; negatives] (asr_model_ctl.py:256-292).

    x: (B, T, D) chunk view; y: (B, T, D) full view; negs: (N, B, T, D);
    mask: (B, 1, T) valid-frame mask of the chunk view.
    """
    targets = jnp.concatenate([y[None], negs], axis=0)      # (N+1, B, T, D)
    neg_is_pos = jnp.all(y[None] == negs, axis=-1)          # (N, B, T)
    xf = x.astype(jnp.float32)
    tf = targets.astype(jnp.float32)
    # torch.cosine_similarity: dot / max(|a|·|b|, 1e-8)
    num = jnp.sum(xf[None] * tf, axis=-1)
    den = jnp.maximum(jnp.linalg.norm(xf, axis=-1)[None]
                      * jnp.linalg.norm(tf, axis=-1), 1e-8)
    logits = (num / den) / temperature                      # (N+1, B, T)
    logits = jnp.concatenate(
        [logits[:1], jnp.where(neg_is_pos, -jnp.inf, logits[1:])], axis=0)
    logp = jax.nn.log_softmax(logits, axis=0)
    ce = -logp[0]                                           # (B, T)
    valid = mask[:, 0, :]
    return jnp.sum(jnp.where(valid, ce, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)


def ctl_compute_loss(params, cfg: ModelConfig, batch, rng=None,
                     ctl_weight: float = 1.0, temperature: float = 0.1,
                     n_negatives: int = 0, neg_idxs=None):
    """Dual-view ASR loss + contrastive alignment (asr_model_ctl.py:71-113).

    Both views pay the full hybrid CTC/attention loss; the CTL term is only
    added when ``n_negatives > 0`` (reference gate, asr_model_ctl.py:96).
    """
    import dataclasses
    rngs = Rngs(rng) if rng is not None else None
    chunk_rng = rngs.next() if rngs else None
    neg_key = rngs.next() if rngs else jax.random.PRNGKey(0)
    cat = batch.get('cat_embs')

    # forward_full skips the chunk mask entirely (ctl_model/encoder.py:
    # 107-125 never calls add_optional_chunk_mask) — even a configured
    # static_chunk_size must not apply to the full view
    full_cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder,
                                         use_dynamic_chunk=False,
                                         static_chunk_size=0))
    full_out, full_mask = forward_encoder(
        params, full_cfg, batch['feats'], batch['feats_lengths'], cat, rngs,
        decoding_chunk_size=-1)
    full = loss_from_encoder(params, cfg, full_out, full_mask, batch,
                             rngs=rngs)

    chunk_out, chunk_mask = forward_encoder(
        params, cfg, batch['feats'], batch['feats_lengths'], cat, rngs,
        chunk_rng=chunk_rng, decoding_chunk_size=0,
        enable_full_context=False)
    chunk = loss_from_encoder(params, cfg, chunk_out, chunk_mask, batch,
                              rngs=rngs)

    ctl = jnp.zeros((), jnp.float32)
    if ctl_weight > 0 and n_negatives > 0:
        lens_chunk = jnp.sum(chunk_mask[:, 0, :], axis=-1)
        negs, _ = sample_negatives(neg_key, full_out, n_negatives,
                                   lens_chunk, neg_idxs=neg_idxs)
        ctl = ctl_contrastive_loss(chunk_out, full_out, negs, chunk_mask,
                                   temperature)

    return {'loss': full['loss'] + chunk['loss'] + ctl_weight * ctl,
            'loss_full': full['loss'], 'loss_chunk': chunk['loss'],
            'loss_ctl': ctl, 'th_accuracy': full['th_accuracy'],
            'chunk_th_accuracy': chunk['th_accuracy']}
