"""Segmentation model fine-tuning.

Parity: diarization/train_pyannote3.0.py:42-88 — powerset-CE + VAD-BCE loss,
Adam, grad clip 0.5, batches of (wave, per-frame powerset labels), early
stopping patience 10, max 20 epochs.
"""

from __future__ import annotations

import logging
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from reverb_tpu.diar.models import (SegmentationConfig, powerset_to_multilabel,
                                    segmentation_forward)


def segmentation_loss(params, wave, labels, cfg: SegmentationConfig,
                      vad_weight: float = 0.5, forward=None):
    """wave (B,T) + labels (B,T',C) one-hot powerset classes → CE + VAD BCE.

    forward(params, wave) overrides the native net — e.g.
    diar.pyannet.pyannet_forward to fine-tune a converted
    pyannote/segmentation-3.0 checkpoint (train_pyannote3.0.py's job)."""
    fwd = forward or (lambda p, w: segmentation_forward(p, w, cfg))
    logp = fwd(params, wave)                            # (B,T',C)
    T = min(logp.shape[1], labels.shape[1])
    logp = logp[:, :T]
    labels = labels[:, :T]
    ce = -jnp.mean(jnp.sum(labels * logp, axis=-1))
    # VAD auxiliary: speech = any non-empty powerset class (class 0 = silence)
    speech_prob = 1.0 - jnp.exp(logp[..., 0])
    speech_label = 1.0 - labels[..., 0]
    bce = -jnp.mean(speech_label * jnp.log(speech_prob + 1e-8)
                    + (1 - speech_label) * jnp.log(1 - speech_prob + 1e-8))
    return ce + vad_weight * bce, {'ce': ce, 'vad_bce': bce}


def train_segmentation(params, train_batches: Callable[[], Iterable],
                       cv_batches: Optional[Callable[[], Iterable]] = None,
                       cfg: SegmentationConfig = SegmentationConfig(),
                       lr: float = 1e-4, max_epochs: int = 20,
                       patience: int = 10, grad_clip: float = 0.5,
                       forward=None):
    tx = optax.chain(optax.clip_by_global_norm(grad_clip), optax.adam(lr))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, wave, labels):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: segmentation_loss(p, wave, labels, cfg,
                                        forward=forward),
            has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    @jax.jit
    def eval_loss(params, wave, labels):
        loss, _ = segmentation_loss(params, wave, labels, cfg,
                                    forward=forward)
        return loss

    best_loss = float('inf')
    best_params = params
    bad_epochs = 0
    for epoch in range(max_epochs):
        losses = []
        for wave, labels in train_batches():
            params, opt_state, loss, aux = step(
                params, opt_state, jnp.asarray(wave), jnp.asarray(labels))
            losses.append(float(loss))
        cv = None
        if cv_batches is not None:
            cv_losses = [float(eval_loss(params, jnp.asarray(w),
                                         jnp.asarray(l)))
                         for w, l in cv_batches()]
            cv = float(np.mean(cv_losses)) if cv_losses else None
        logging.info('seg epoch %d train %.4f cv %s', epoch,
                     np.mean(losses), cv)
        metric = cv if cv is not None else float(np.mean(losses))
        if metric < best_loss - 1e-5:
            best_loss = metric
            best_params = params
            bad_epochs = 0
        else:
            bad_epochs += 1
            if bad_epochs >= patience:
                logging.info('early stopping at epoch %d', epoch)
                break
    return best_params
