"""Device-side training frontend: fbank + SpecAugment inside the train step.

TPU-native answer to input-pipeline starvation: the host pipeline's
per-utterance fbank (6–14 ms on one core, data/processor.py compute_fbank)
caps throughput at ~1.1× the flagship step's frame appetite on a small
host, so `dataset_conf: {device_feats: true}` moves feature extraction onto
the chip where it is noise (the fbank of a whole B=16×512-frame batch is
~0.1 % of the step's FLOPs and fuses into the compiled program).  The host
then only decodes/pads raw PCM — measured >30× appetite headroom.

Pipeline contract (data/dataset.py): samples carry a zero-width
``feat = (n_frames, 0)`` stub so the untouched sort/filter/batch stages
still see frame counts; ``processor.padding`` ships the padded PCM it
already packs (``batch['pcm']``).  The train/eval steps call
:func:`apply_frontend` to replace the zero-width ``feats`` with on-device
fbank (+ dither and SpecAugment under the step's PRNG, training only).

The reference has no equivalent — its DataLoader workers do torchaudio
fbank on host CPUs (dataset/processor.py:335-371); this is the redesign for
a 1-host-many-chips TPU pod where host cores per chip are scarce.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from reverb_tpu.frontend.fbank import FbankConfig, compute_fbank_batch


@dataclasses.dataclass(frozen=True)
class FrontendSpec:
    fbank: FbankConfig
    dither: float = 0.0
    num_t_mask: int = 0
    num_f_mask: int = 0
    max_t: int = 50
    max_f: int = 10


def frontend_from_configs(configs: Dict) -> Optional[FrontendSpec]:
    """FrontendSpec when `dataset_conf.device_feats` is set, else None.
    spec_sub/spec_trim have no device formulation — configuring them with
    device_feats is an error rather than silently dropped augmentation."""
    ds_conf = configs.get('dataset_conf', {}) or {}
    if not ds_conf.get('device_feats', False):
        return None
    if ds_conf.get('spec_sub') or ds_conf.get('spec_trim'):
        raise ValueError('device_feats supports spec_aug only; '
                         'spec_sub/spec_trim run on host features')
    fb = ds_conf.get('fbank_conf', {}) or {}
    # same default as the host path (data/dataset.py spec_aug stage): a
    # config that omits spec_aug must not silently lose augmentation just
    # because device_feats is on
    aug_on = bool(ds_conf.get('spec_aug', True))
    aug = ds_conf.get('spec_aug_conf', {}) or {}
    # every sample passes the resample stage first, so the configured
    # resample_rate (default 16000, processor.resample) IS the waveform
    # rate the device fbank sees — window sizes/mel filters follow it
    rs = ds_conf.get('resample_conf', {}) or {}
    return FrontendSpec(
        fbank=FbankConfig(sample_rate=int(rs.get('resample_rate', 16000)),
                          num_mel_bins=fb.get('num_mel_bins', 80),
                          frame_length_ms=fb.get('frame_length', 25),
                          frame_shift_ms=fb.get('frame_shift', 10)),
        dither=float(fb.get('dither', 0.0)),
        num_t_mask=int(aug.get('num_t_mask', 2)) if aug_on else 0,
        num_f_mask=int(aug.get('num_f_mask', 2)) if aug_on else 0,
        max_t=int(aug.get('max_t', 50)),
        max_f=int(aug.get('max_f', 10)),
    )


def _spec_aug_device(feats, lengths, rng, spec: FrontendSpec):
    """Vectorized SpecAugment matching processor.spec_aug's distribution:
    per sample, num_t_mask time masks with start ~ U{0..len-1} and width
    ~ U{1..max_t}, num_f_mask frequency masks likewise over the mel axis.
    (Draw SEQUENCES differ from the host's python-RNG loop — augmentation
    needs the distribution, not the stream; the reference's own DataLoader
    workers are worker-order nondeterministic too.)"""
    B, T, M = feats.shape
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :]          # (1,T)
    f_idx = jnp.arange(M, dtype=jnp.int32)[None, :]
    for _ in range(spec.num_t_mask):
        rng, k1, k2 = jax.random.split(rng, 3)
        start = jax.random.randint(k1, (B, 1), 0,
                                   jnp.maximum(lengths, 1)[:, None])
        width = jax.random.randint(k2, (B, 1), 1, spec.max_t + 1)
        mask = (t_idx >= start) & (t_idx < start + width)     # (B,T)
        feats = jnp.where(mask[:, :, None], 0.0, feats)
    for _ in range(spec.num_f_mask):
        rng, k1, k2 = jax.random.split(rng, 3)
        start = jax.random.randint(k1, (B, 1), 0, M)
        width = jax.random.randint(k2, (B, 1), 1, spec.max_f + 1)
        mask = (f_idx >= start) & (f_idx < start + width)     # (B,M)
        feats = jnp.where(mask[:, None, :], 0.0, feats)
    return feats


def apply_frontend(batch: Dict, spec: FrontendSpec, rng=None) -> Dict:
    """Replace a zero-width `feats` with device fbank from `pcm`.

    rng: training PRNG for dither + SpecAugment; None → deterministic
    (CV/eval, matching the host pipeline's cv_conf which disables both).
    Shapes: output T equals the batch's padded feature length so target
    padding and any pad_len_multiple bucketing are preserved."""
    if 'feats' in batch and batch['feats'].shape[-1] != 0:
        return batch                        # host features already present
    wav = batch['pcm'].astype(jnp.float32) * 32768.0
    if rng is not None and spec.dither > 0:
        rng, k = jax.random.split(rng)
        wav = wav + spec.dither * jax.random.normal(k, wav.shape, jnp.float32)
    feats = compute_fbank_batch(wav, spec.fbank)
    T = batch['feats'].shape[1] if 'feats' in batch else feats.shape[1]
    if feats.shape[1] >= T:
        feats = feats[:, :T]
    else:
        feats = jnp.pad(feats, ((0, 0), (0, T - feats.shape[1]), (0, 0)))
    lengths = batch['feats_lengths']
    if rng is not None and (spec.num_t_mask or spec.num_f_mask):
        rng, k = jax.random.split(rng)
        feats = _spec_aug_device(feats, lengths, k, spec)
    # zero padded frames: the host path pads with 0 and downstream masking
    # assumes it (fbank of padded silence is NOT zero)
    valid = (jnp.arange(T, dtype=jnp.int32)[None, :]
             < lengths[:, None])[:, :, None]
    feats = jnp.where(valid, feats, 0.0)
    return dict(batch, feats=feats)
