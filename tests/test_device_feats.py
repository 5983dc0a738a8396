"""Device-side train frontend (dataset_conf.device_feats).

The host pipeline ships raw PCM + zero-width feat stubs; the train/eval
steps compute fbank (+ dither/SpecAugment) on device.  Loss through the
device frontend must match the host-features path (same wave, dither=0,
no augmentation) to frontend numerics (device vs numpy fbank agree to
~1e-3 on log-mels — tests/test_fbank.py goldens)."""

import json
import wave as wave_mod
from pathlib import Path

import numpy as np
import pytest

from tests.helpers import build_tiny_model_dir


def _write_corpus(root: Path, n=6, seed=0):
    rng = np.random.RandomState(seed)
    root.mkdir(parents=True, exist_ok=True)
    lines = []
    for i in range(n):
        x = (0.3 * np.sin(2 * np.pi * (300 + 70 * i) *
                          np.arange(16000 * 2) / 16000)
             + 0.01 * rng.randn(16000 * 2)).astype(np.float32)
        p = root / f'u{i}.wav'
        with wave_mod.open(str(p), 'wb') as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((x * 32000).astype(np.int16).tobytes())
        lines.append(json.dumps({'key': f'u{i}', 'wav': str(p),
                                 'txt': 'yes no', 'style': 'verbatim'}))
    lst = root / 'data.list'
    lst.write_text('\n'.join(lines) + '\n')
    return lst


def _conf(device_feats: bool):
    return {
        'fbank_conf': {'num_mel_bins': 80, 'frame_length': 25,
                       'frame_shift': 10, 'dither': 0.0},
        'filter_conf': {'max_length': 4000, 'min_length': 5},
        'spec_aug': False,
        'shuffle': False, 'sort': False,
        'batch_conf': {'batch_type': 'static', 'batch_size': 3},
        'pass_cat_emb': True,
        'cat_emb_conf': {'field': 'style', 'emb_len': 2,
                         'one_hot_ids': {'verbatim': 0, 'nonverbatim': 1}},
        'device_feats': device_feats,
        'cycle': 1, 'list_shuffle': False,
    }


def _batches(lst, conf, tokenizer):
    from reverb_tpu.data.dataset import Dataset
    return list(Dataset('raw', str(lst), tokenizer, conf, partition=False))


def test_device_feats_loss_matches_host_path(tmp_path):
    import jax
    import jax.numpy as jnp
    from reverb_tpu.cli.reverb import load_model
    from reverb_tpu.frontend.device_feats import (FrontendSpec,
                                                  apply_frontend,
                                                  frontend_from_configs)
    from reverb_tpu.models.asr_model import compute_loss
    from reverb_tpu.train.trainer import make_eval_step

    lst = _write_corpus(tmp_path / 'corpus')
    mdir = build_tiny_model_dir(tmp_path / 'model')
    model = load_model(str(mdir))
    tok = model.tokenizer
    cfg = model.model_config

    host_b = _batches(lst, _conf(False), tok)[0]
    dev_b = _batches(lst, _conf(True), tok)[0]
    assert dev_b['feats'].shape[-1] == 0           # stub, no host fbank
    np.testing.assert_array_equal(host_b['feats_lengths'],
                                  dev_b['feats_lengths'])

    configs = dict(model.configs)
    configs['dataset_conf'] = _conf(True)
    spec = frontend_from_configs(configs)
    assert spec is not None and spec.num_t_mask == 0

    def to_dev(b):
        return {k: jnp.asarray(v) for k, v in b.items()
                if isinstance(v, np.ndarray)}

    eval_host = make_eval_step(cfg)
    eval_dev = make_eval_step(cfg, frontend=spec)
    m_host = eval_host(model.params, to_dev(host_b))
    m_dev = eval_dev(model.params, to_dev(dev_b))
    np.testing.assert_allclose(float(m_dev['loss']), float(m_host['loss']),
                               rtol=5e-3, atol=5e-3)

    # feature-level agreement inside the valid region
    out = apply_frontend(to_dev(dev_b), spec, None)
    T = min(out['feats'].shape[1], host_b['feats'].shape[1])
    for i, L in enumerate(np.asarray(dev_b['feats_lengths'])):
        np.testing.assert_allclose(np.asarray(out['feats'])[i, :L],
                                   host_b['feats'][i, :L],
                                   rtol=1e-3, atol=2e-3)


def test_device_spec_aug_masks_inside_valid_region(tmp_path):
    import jax
    import jax.numpy as jnp
    from reverb_tpu.frontend.device_feats import (FrontendSpec,
                                                  _spec_aug_device)
    from reverb_tpu.frontend.fbank import FbankConfig

    B, T, M = 3, 60, 20
    feats = jnp.ones((B, T, M))
    lengths = jnp.array([60, 40, 20], jnp.int32)
    spec = FrontendSpec(fbank=FbankConfig(), num_t_mask=2, num_f_mask=1,
                        max_t=10, max_f=4)
    out = np.asarray(_spec_aug_device(feats, lengths,
                                      jax.random.PRNGKey(0), spec))
    assert (out == 0).any()                        # masks applied
    # time-mask starts are bounded by each sample's length; a fully-masked
    # row beyond start+max_t-1 past the length cannot occur
    for b, L in enumerate([60, 40, 20]):
        tail = out[b, min(L + spec.max_t, T):]
        assert tail.size == 0 or not (tail == 0).all(axis=-1).any()


def test_device_feats_rejects_spec_sub(tmp_path):
    from reverb_tpu.frontend.device_feats import frontend_from_configs
    with pytest.raises(ValueError):
        frontend_from_configs({'dataset_conf': {'device_feats': True,
                                                'spec_sub': True}})
