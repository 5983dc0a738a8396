"""Speaker-embedding model training: cosine-softmax speaker classification.

The reference pipeline consumes a pretrained wespeaker ResNet34 for its
embedding stage (diarization/infer_pyannote3.0.py:33-42 via pyannote's
embedding wrapper) and trains nothing in-repo; this module is the native
trainer for the x-vector-family TDNN in diar/models.py so the diarization
stack can be exercised end to end without downloadable weights (the
synthetic diar bench, custom-domain fine-tuning).  A randomly initialized
embedding net maps every input to nearly the same direction (cosine ≈ 1 —
outputs are dominated by the shared bias/statistics terms), so AHC merges
everything into one speaker; even a brief discriminative pass fixes that.

Objective: additive-margin cosine-softmax CE (AM-softmax) — logits =
s·(ê·Ŵᵀ − m·onehot(y)) over L2-normalized embeddings and class weights,
the standard x-vector/wespeaker recipe shape.  The margin forces
inter-speaker cosine DOWN (margin-0 training on confusable spectra leaves
all speakers inside AHC's merge radius — measured: every eval speaker
collapsed to one cluster on the shared-fundamental bench corpus).  The
classifier head is train-time only and discarded.
"""

from __future__ import annotations

import logging
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from reverb_tpu.diar.models import EmbeddingConfig, embedding_forward


def embedding_loss(params, head, feats, lens, labels,
                   cfg: EmbeddingConfig, scale: float = 10.0, forward=None,
                   margin: float = 0.0):
    """feats (B,T,F) + lens (B,) + int labels (B,) → AM-softmax CE."""
    fwd = forward or (lambda p, f, l: embedding_forward(p, f, l, cfg))
    emb = fwd(params, feats, lens)                          # (B,E) L2-normed
    w = head['weight']
    w = w / (jnp.linalg.norm(w, axis=-1, keepdims=True) + 1e-8)
    cos = emb @ w.T                                         # (B,S)
    if margin:
        cos = cos - margin * jax.nn.one_hot(labels, cos.shape[-1],
                                            dtype=cos.dtype)
    logits = scale * cos
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))
    acc = jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))
    return ce, {'ce': ce, 'acc': acc}


def train_embedding(params, n_speakers: int,
                    train_batches: Callable[[], Iterable],
                    cfg: EmbeddingConfig = EmbeddingConfig(),
                    lr: float = 1e-3, max_epochs: int = 10,
                    grad_clip: float = 5.0, scale: float = 10.0,
                    seed: int = 0, forward=None, margin: float = 0.0):
    """train_batches() yields (feats (B,T,F), lens (B,), labels (B,));
    returns the trained embedding params (head discarded)."""
    head = {'weight': jax.random.normal(
        jax.random.PRNGKey(seed), (n_speakers, cfg.embed_dim),
        jnp.float32) * 0.1}
    state = {'emb': params, 'head': head}
    tx = optax.chain(optax.clip_by_global_norm(grad_clip), optax.adam(lr))
    opt_state = tx.init(state)

    @jax.jit
    def step(state, opt_state, feats, lens, labels):
        (loss, aux), grads = jax.value_and_grad(
            lambda s: embedding_loss(s['emb'], s['head'], feats, lens,
                                     labels, cfg, scale, forward, margin),
            has_aux=True)(state)
        updates, opt_state = tx.update(grads, opt_state, state)
        return optax.apply_updates(state, updates), opt_state, loss, aux

    for epoch in range(max_epochs):
        losses, accs = [], []
        for feats, lens, labels in train_batches():
            state, opt_state, loss, aux = step(
                state, opt_state, jnp.asarray(feats),
                jnp.asarray(lens, jnp.int32), jnp.asarray(labels, jnp.int32))
            losses.append(float(loss))
            accs.append(float(aux['acc']))
        logging.info('emb epoch %d ce %.4f acc %.3f', epoch,
                     np.mean(losses), np.mean(accs))
    return state['emb']
