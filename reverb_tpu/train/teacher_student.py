"""Teacher-student distillation loss.

Parity: asr/wenet/transformer/ts_asr_model.py:82-252 + init_ts_asr_model
(:274-285) and bin/train.teacher-student.py — teacher runs without grads;
distillation = symmetric top-K KL between teacher/student CTC posteriors
(and decoder posteriors), each normalized by the encoder mask sum; final
loss = ts_weight·(ctc_w·kl_enc + (1−ctc_w)·kl_dec) + reg_weight·student_loss,
with an optional ts_weight decay schedule (:244-249).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from reverb_tpu.models import ctc as ctc_mod
from reverb_tpu.models.asr_model import ModelConfig, compute_loss, \
    forward_encoder
from reverb_tpu.models.decoder import decoder_forward
from reverb_tpu.utils.common import add_sos_eos, reverse_sequence


@dataclasses.dataclass(frozen=True)
class TSConfig:
    ts_weight: float = 0.5
    reg_weight: float = float('nan')      # nan → 1 - ts_weight (clamped ≥ 0)
    top_k_entries: int = 0                # 0 → full-vocab KL
    min_ts_weight: float = 0.0
    decrease_every: int = 0
    decrease_factor: float = 1.0

    @property
    def resolved_reg_weight(self) -> float:
        if self.reg_weight == self.reg_weight:     # not nan
            return self.reg_weight
        return 1.0 if self.ts_weight > 1 else 1.0 - self.ts_weight


def _kl(student_logp, teacher_logp):
    """KLDiv(log_target=True, reduction=sum): Σ exp(t)·(t − s)."""
    t = teacher_logp
    return jnp.sum(jnp.exp(t) * (t - student_logp))


def _topk_sym_kl(student_logp, teacher_logp, k: int):
    """Symmetric top-K KL (ts_asr_model.py:141-158): each side's top-K values
    against the other's gathered values, averaged."""
    if k <= 0:
        return _kl(student_logp, teacher_logp)
    s_vals, s_idx = jax.lax.top_k(student_logp, k)
    t_vals, t_idx = jax.lax.top_k(teacher_logp, k)
    xs = jnp.take_along_axis(student_logp, t_idx, axis=-1)
    xt = jnp.take_along_axis(teacher_logp, s_idx, axis=-1)
    return (_kl(xs, t_vals) + _kl(s_vals, xt)) / 2


def ts_loss(student_params, teacher_params, student_cfg: ModelConfig,
            teacher_cfg: ModelConfig, batch: Dict, ts: TSConfig,
            rng=None, ts_weight: Optional[jnp.ndarray] = None):
    """Distillation training loss. `ts_weight` may override the static conf
    (for the decayed schedule carried as train state)."""
    cat_embs = batch.get('cat_embs')
    text, text_lens = batch['target'], batch['target_lengths']
    cfg_t = teacher_cfg

    # teacher forward, no grads
    t_enc, t_mask = forward_encoder(
        jax.lax.stop_gradient(teacher_params), cfg_t, batch['feats'],
        batch['feats_lengths'], cat_embs if cfg_t.lsl_enc else None)
    t_ctc = ctc_mod.ctc_log_softmax(teacher_params['ctc'], t_enc)
    ys_in, _ = add_sos_eos(text, text_lens, cfg_t.sos, cfg_t.eos,
                           cfg_t.ignore_id)
    r_text = reverse_sequence(text, text_lens, cfg_t.ignore_id)
    r_ys_in, _ = add_sos_eos(r_text, text_lens, cfg_t.sos, cfg_t.eos,
                             cfg_t.ignore_id)
    t_dec, _ = decoder_forward(
        teacher_params['decoder'], t_enc, t_mask, ys_in, text_lens + 1,
        r_ys_in, cfg_t.reverse_weight, cfg_t.decoder,
        cat_embs=cat_embs if cfg_t.lsl_dec else None)
    t_dec = jax.nn.log_softmax(jax.lax.stop_gradient(t_dec), axis=-1)
    t_ctc = jax.lax.stop_gradient(t_ctc)

    # student forward
    cfg_s = student_cfg
    s_enc, s_mask = forward_encoder(
        student_params, cfg_s, batch['feats'], batch['feats_lengths'],
        cat_embs if cfg_s.lsl_enc else None, rngs=None)
    s_ctc = ctc_mod.ctc_log_softmax(student_params['ctc'], s_enc)
    s_dec, _ = decoder_forward(
        student_params['decoder'], s_enc, s_mask, ys_in, text_lens + 1,
        r_ys_in, cfg_s.reverse_weight, cfg_s.decoder,
        cat_embs=cat_embs if cfg_s.lsl_dec else None)
    s_dec = jax.nn.log_softmax(s_dec, axis=-1)

    denom = jnp.sum(s_mask)
    kl_enc = _topk_sym_kl(s_ctc, t_ctc, ts.top_k_entries) / denom
    kl_dec = _topk_sym_kl(s_dec, t_dec, ts.top_k_entries) / denom

    student = compute_loss(student_params, cfg_s, batch, rng=rng)
    w = ts_weight if ts_weight is not None else ts.ts_weight
    dist = kl_enc * cfg_s.ctc_weight + (1 - cfg_s.ctc_weight) * kl_dec
    loss = dist * w + student['loss'] * ts.resolved_reg_weight
    return {'loss': loss, 'kl_enc_loss': kl_enc, 'kl_dec_loss': kl_dec,
            'student_loss': student['loss'], 'loss_att': student['loss_att'],
            'loss_ctc': student['loss_ctc'],
            'th_accuracy': student['th_accuracy']}


def decay_ts_weight(ts_weight: float, ts: TSConfig) -> float:
    """ts_asr_model.py:244-249: multiplicative decay toward min_ts_weight."""
    return ((ts_weight - ts.min_ts_weight) * ts.decrease_factor
            + ts.min_ts_weight)
