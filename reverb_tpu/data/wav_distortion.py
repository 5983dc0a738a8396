"""Waveform distortion augmentation suite.

Parity: asr/wenet/dataset/wav_distortion.py:31-334 — amplitude-domain
distortions (max/poly/fence/jag clipping, gain dB) applied with per-sample
probability; NumPy host-side.
"""

from __future__ import annotations

import random
from typing import Dict

import numpy as np


def db2amp(db: float) -> float:
    return 10.0 ** (db / 20.0)


def amp2db(amp: float) -> float:
    return 20.0 * np.log10(np.maximum(np.abs(amp), 1e-10))


def distort_max(x: np.ndarray, threshold_db: float = -10.0) -> np.ndarray:
    """Hard-clip everything above a dB threshold."""
    thr = db2amp(threshold_db)
    return np.clip(x, -thr, thr)


def distort_poly(x: np.ndarray, a: float = 1.0, m: float = 1.0,
                 n: float = 2.0) -> np.ndarray:
    """Polynomial waveshaping: sign(x)·a·|x|^ (m/n)."""
    return np.sign(x) * a * np.abs(x) ** (m / n)


def distort_fence(x: np.ndarray, low_db: float = -50.0,
                  high_db: float = -10.0) -> np.ndarray:
    """Zero samples outside the [low, high] dB band (fence distortion)."""
    a = np.abs(x)
    lo, hi = db2amp(low_db), db2amp(high_db)
    keep = (a >= lo) & (a <= hi)
    return np.where(keep, x, 0.0)


def distort_jag(x: np.ndarray, levels: int = 16) -> np.ndarray:
    """Coarse amplitude quantization (jagged waveform)."""
    return np.round(x * levels) / levels


def distort_gain(x: np.ndarray, gain_db: float = 6.0) -> np.ndarray:
    return np.clip(x * db2amp(gain_db), -1.0, 1.0)


DISTORTIONS = {
    'max_distortion': distort_max,
    'poly_distortion': distort_poly,
    'fence_distortion': distort_fence,
    'jag_distortion': distort_jag,
    'gain_db': distort_gain,
    'none': lambda x, **kw: x,
}


def distort_wav(sample: Dict, distort_types=None, prob: float = 0.2) -> Dict:
    """Pipeline stage: randomly apply one configured distortion."""
    if random.random() > prob:
        return sample
    types = distort_types or ['max_distortion', 'poly_distortion',
                              'fence_distortion', 'jag_distortion',
                              'gain_db']
    kind = random.choice(types)
    wav = sample['wav']
    sample['wav'] = DISTORTIONS[kind](wav).astype(np.float32)
    return sample
