"""Global CMVN: stats loading + application.

Parity: asr/wenet/utils/cmvn.py:21-93 (JSON & Kaldi-text stats formats) and
asr/wenet/transformer/cmvn.py:18-47 (apply (x - mean) * istd).
"""

from __future__ import annotations

import json
import math

import jax.numpy as jnp
import numpy as np


def _finalize(means, variance, count):
    means = np.asarray(means, dtype=np.float64) / count
    var = np.asarray(variance, dtype=np.float64) / count - means * means
    var = np.maximum(var, 1.0e-20)
    istd = 1.0 / np.sqrt(var)
    return means.astype(np.float32), istd.astype(np.float32)


def _load_json_cmvn(path):
    with open(path) as f:
        stats = json.load(f)
    return _finalize(stats['mean_stat'], stats['var_stat'], stats['frame_num'])


def _load_kaldi_cmvn(path):
    with open(path) as f:
        arr = f.read().split()
    assert arr[0] == '[' and arr[-1] == ']' and arr[-2] == '0', \
        "expected kaldi text-format cmvn stats"
    feat_dim = (len(arr) - 4) // 2
    means = [float(x) for x in arr[1:1 + feat_dim]]
    count = float(arr[feat_dim + 1])
    variance = [float(x) for x in arr[feat_dim + 2:2 * feat_dim + 2]]
    return _finalize(means, variance, count)


def load_cmvn(path, is_json: bool = True):
    """Returns (mean, istd) float32 arrays of shape (feat_dim,)."""
    if is_json:
        return _load_json_cmvn(path)
    return _load_kaldi_cmvn(path)


def apply_cmvn(x, mean, istd):
    """(x - mean) * istd, broadcasting over leading dims."""
    return (x - jnp.asarray(mean)) * jnp.asarray(istd)


def load_cmvn_from_configs(configs):
    """(mean, istd) from a reference-schema config dict, or None when no
    global CMVN is configured (init_model.py:102-104 loads the GlobalCMVN
    buffer into the model at construction, so training normalizes with the
    same stats serving does — a model trained without them is silently
    incompatible with every CLI decode)."""
    if configs.get('cmvn') != 'global_cmvn':
        return None
    conf = configs.get('cmvn_conf', {}) or {}
    path = conf.get('cmvn_file')
    if not path:
        return None
    return load_cmvn(path, conf.get('is_json_cmvn', True))
