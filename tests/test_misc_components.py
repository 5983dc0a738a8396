"""CTL model, blank suppression, kaldi IO, wav distortion, AOT export."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_model_forward import TINY


def test_ctl_loss():
    from reverb_tpu.models.asr_model import ModelConfig, init_params
    from reverb_tpu.models.ctl import ctl_compute_loss
    import dataclasses
    conf = dict(TINY)
    conf['encoder_conf'] = dict(conf['encoder_conf'],
                                use_dynamic_chunk=True)
    cfg = ModelConfig.from_config(conf)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    batch = {
        'feats': jnp.asarray(rng.randn(2, 43, 80), jnp.float32),
        'feats_lengths': jnp.array([43, 43]),
        'target': jnp.array([[3, 4, 5, -1], [6, 7, -1, -1]]),
        'target_lengths': jnp.array([3, 2]),
        'cat_embs': jnp.array([[1.0, 0.0], [1.0, 0.0]]),
    }
    out = ctl_compute_loss(params, cfg, batch, rng=jax.random.PRNGKey(1),
                           ctl_weight=0.5, n_negatives=4)
    assert np.isfinite(float(out['loss']))
    assert float(out['loss_ctl']) >= 0
    assert np.isfinite(float(out['loss_full']))
    assert np.isfinite(float(out['loss_chunk']))


def test_ctc_activation_more():
    from reverb_tpu.models.ctc import ctc_activation_more
    V, D, T = 10, 8, 12
    rng = np.random.RandomState(0)
    params = {'ctc_lo': {'weight': jnp.asarray(rng.randn(V, D),
                                               jnp.float32),
                         'bias': jnp.zeros(V)}}
    enc = jnp.asarray(rng.randn(1, T, D), jnp.float32)
    probs, maxlen, n_nb, ratio, applied, changes = ctc_activation_more(
        params, enc, missing_blank_from_top2_threshold=1.1,
        non_blank_prob_threshold=-100.0, top_blank_prob_penalty=5.0)
    assert probs.shape == (1, T, V)
    assert maxlen == T
    # hack applied (threshold 1.1 > any ratio); blank-top frames penalized
    base = np.asarray(jax.nn.log_softmax(
        enc @ params['ctc_lo']['weight'].T, axis=-1))
    best_blank = base[0].argmax(-1) == 0
    assert int(changes) == int(best_blank.sum())


def test_kaldi_io_roundtrip(tmp_path):
    from reverb_tpu.data.kaldi_io import read_ark, read_scp, write_ark
    rng = np.random.RandomState(0)
    items = {'utt1': rng.randn(5, 3).astype(np.float32),
             'utt2': rng.randn(2, 3).astype(np.float32),
             'vec1': rng.randn(7).astype(np.float32)}
    ark = tmp_path / 'feats.ark'
    scp = tmp_path / 'feats.scp'
    write_ark(str(ark), items, str(scp))
    got = dict(read_ark(str(ark)))
    assert set(got) == set(items)
    np.testing.assert_allclose(got['utt1'], items['utt1'], rtol=1e-6)
    np.testing.assert_allclose(got['vec1'], items['vec1'], rtol=1e-6)
    got2 = dict(read_scp(str(scp)))
    np.testing.assert_allclose(got2['utt2'], items['utt2'], rtol=1e-6)


def test_wav_distortion():
    import random
    from reverb_tpu.data import wav_distortion as wd
    x = np.linspace(-1, 1, 1000).astype(np.float32)
    clipped = wd.distort(x.copy(), wd.make_max_distortion({'max_db': -10.0}),
                         rate=1.0)
    assert np.abs(clipped).max() <= wd.db2amp(-10.0) + 1e-6
    random.seed(11)
    fence = wd.make_fence_distortion({'mask_number': 2, 'max_db': -30})
    fenced = fence(x.astype(np.float64))
    assert (fenced == 0).any() and (fenced != 0).any()
    jag = wd.make_jag_distortion({'mask_number': 3})(x.astype(np.float64))
    assert (jag == 0).any() and np.isin(jag[jag != 0], x).all()
    s = {'wav': x[None, :].copy()}
    out = wd.distort_wav(s, prob=1.1)
    assert out['wav'].shape == (1, 1000)


def _load_reference_wav_distortion():
    """Execute the reference's own wav_distortion module (torchaudio is not
    installed here; only the top-level import needs a stub — none of the
    oracle-exercised functions touch it)."""
    import importlib.util
    import sys
    import types
    path = '/root/reference/asr/wenet/dataset/wav_distortion.py'
    if not os.path.exists(path):
        pytest.skip('reference tree not available')
    sys.modules.setdefault('torchaudio', types.ModuleType('torchaudio'))
    spec = importlib.util.spec_from_file_location('ref_wav_distortion', path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# amplitude grid hitting the quirk corners: exact zero, below/at the poly
# 1e-6 passthrough threshold, mask-edge magnitudes, the 0.9997 cap, >1
_GRID = np.array([0.0, 1e-7, -1e-7, 9.9e-7, 1e-6, -1e-6, 1e-5, -1e-4,
                  3.16e-3, -3.16e-3, 0.01, -0.05, 0.1778, -0.1778, 0.5,
                  -0.5, 0.9, -0.9, 0.997, -0.997, 0.9997, -0.9997, 0.9999,
                  -0.9999, 1.5, -1.5], dtype=np.float64)


@pytest.mark.parametrize('kind,conf', [
    ('poly', {'a': 4, 'm': 2, 'n': 2}),
    ('poly', {'a': 1, 'm': 1, 'n': 3}),
    ('quad', None),
    ('max', {'max_db': -10.0}),
    ('max', {'max_db': 0}),
    ('gain', {'db': 6.0}),
    ('gain', {'db': -20.0}),
])
def test_wav_distortion_pointwise_oracle(kind, conf):
    """Vectorized distortion functions == the reference's scalar functions
    on a quirk-corner amplitude grid (reference wav_distortion.py:31-259)."""
    import random
    from reverb_tpu.data import wav_distortion as wd
    ref = _load_reference_wav_distortion()
    makers = {
        'poly': (wd.make_poly_distortion, ref.make_poly_distortion, (conf,)),
        'quad': (wd.make_quad_distortion, ref.make_quad_distortion, ()),
        'max': (wd.make_max_distortion, ref.make_max_distortion, (conf,)),
        'gain': (wd.make_gain_db, ref.make_gain_db, (conf,)),
    }
    ours_mk, ref_mk, a = makers[kind]
    got = ours_mk(*a)(_GRID)
    want = np.array([ref_mk(*a)(float(v)) for v in _GRID])
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=0)


@pytest.mark.parametrize('kind', ['fence', 'jag'])
@pytest.mark.parametrize('mask_number', [0, 1, 4])
def test_wav_distortion_masked_oracle(kind, mask_number):
    """Seeded mask construction + masked transforms match the reference
    exactly (same random-draw order → identical masks → identical values)."""
    import random
    from reverb_tpu.data import wav_distortion as wd
    ref = _load_reference_wav_distortion()
    conf = {'mask_number': mask_number, 'max_db': -30}
    random.seed(1234)
    ref_fn = (ref.make_fence_distortion(conf) if kind == 'fence'
              else ref.make_jag_distortion(conf))
    want = np.array([ref_fn(float(v)) for v in _GRID])
    random.seed(1234)
    our_fn = (wd.make_fence_distortion(conf) if kind == 'fence'
              else wd.make_jag_distortion(conf))
    np.testing.assert_array_equal(our_fn(_GRID), want)


@pytest.mark.parametrize('dtype', [np.float32, np.float64])
@pytest.mark.parametrize('kind,conf,rate', [
    ('jag_distortion', {'mask_number': 4}, 0.3),
    ('fence_distortion', {'mask_number': 1, 'max_db': -30}, 0.5),
    ('poly_distortion', {'a': 4, 'm': 2, 'n': 2}, 0.9),
    ('quad_distortion', None, 0.1),
    ('max_distortion', {'max_db': -25.0}, 0.4),
    ('gain_db', {'db': 12.0}, 0.0),   # gain ignores rate (runs at 0.8)
    ('none_distortion', None, 0.5),
])
def test_distort_wav_conf_oracle(kind, conf, rate, dtype):
    """Full seeded distort_wav_conf == the reference bit-for-bit: identical
    RNG consumption (masks, then one uniform per sample) and identical
    float64-compute/store-to-dtype rounding (wav_distortion.py:262-313)."""
    import random
    from reverb_tpu.data import wav_distortion as wd
    ref = _load_reference_wav_distortion()
    rng = np.random.RandomState(5)
    wave = (rng.randn(1, 700) * 0.3).clip(-1, 1).astype(dtype)
    random.seed(77)
    want = ref.distort_wav_conf(wave.copy(), kind, conf, rate=rate)
    random.seed(77)
    got = wd.distort_wav_conf(wave.copy(), kind, conf, rate=rate)
    if kind in ('poly_distortion', 'quad_distortion') and dtype == np.float64:
        # the transcendental chain (log10/pow) differs by ≤1 ulp between
        # numpy's vectorized libm and math.*; invisible at float32 storage
        np.testing.assert_allclose(got, np.asarray(want), rtol=1e-12, atol=0)
    else:
        np.testing.assert_array_equal(got, np.asarray(want))


def test_aot_export():
    from reverb_tpu.export.aot import (export_serving_functions,
                                       scriptability_check)
    from reverb_tpu.models.asr_model import ModelConfig, init_params
    import dataclasses
    conf = dict(TINY)
    conf['encoder_conf'] = dict(conf['encoder_conf'], causal=True)
    cfg = ModelConfig.from_config(conf)
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert scriptability_check(params, cfg)
    compiled, meta = export_serving_functions(params, cfg, chunk_size=4,
                                              num_left_chunks=2,
                                              rescoring_nbest=3,
                                              max_hyp_len=8)
    assert set(compiled) == {'encoder_chunk', 'ctc_activation',
                             'attention_decoder'}
    # compiled functions execute with the exported shapes
    feats = jnp.zeros((1, meta['window'], 80), jnp.float32)
    ys, att, cnn = compiled['encoder_chunk'](
        params, feats, jnp.asarray(0), meta['att_cache'], meta['cnn_cache'],
        jnp.array([1.0, 0.0]))
    assert ys.shape[1] == 4
    ctc = compiled['ctc_activation'](params, jnp.zeros((1, 4, 32)))
    assert ctc.shape[-1] == 50


def test_default_persistent_cache_env(tmp_path, monkeypatch):
    """maybe_enable_default_cache: env dir wins, empty env disables, and the
    jax config actually points at the chosen directory afterwards."""
    import os
    from reverb_tpu.export.aot import maybe_enable_default_cache
    monkeypatch.setenv('REVERB_XLA_CACHE_DIR', '')
    assert maybe_enable_default_cache() is None
    d = str(tmp_path / 'xla_cache')
    monkeypatch.setenv('REVERB_XLA_CACHE_DIR', d)
    assert maybe_enable_default_cache() == d
    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d


def test_stablehlo_serialized_export_roundtrip(tmp_path):
    """serialize_serving_functions writes portable .stablehlo artifacts that
    reload into callables matching the live functions exactly (the ONNX-file
    analogue of bin/export_onnx_cpu.py)."""
    import json
    import os
    from reverb_tpu.export.aot import (load_serialized,
                                       serialize_serving_functions)
    from reverb_tpu.models import ctc as ctc_mod
    from reverb_tpu.models.asr_model import ModelConfig, init_params
    conf = dict(TINY)
    conf['encoder_conf'] = dict(conf['encoder_conf'], causal=True)
    cfg = ModelConfig.from_config(conf)
    params = init_params(jax.random.PRNGKey(1), cfg)
    out = tmp_path / 'export'
    paths = serialize_serving_functions(params, cfg, str(out), chunk_size=4,
                                        num_left_chunks=2, rescoring_nbest=3,
                                        max_hyp_len=8)
    assert set(paths) == {'encoder_chunk', 'ctc_activation',
                          'attention_decoder'}
    manifest = json.loads((out / 'manifest.json').read_text())
    assert manifest['chunk_size'] == 4
    assert all(os.path.getsize(p) > 0 for p in paths.values())

    ctc_fn = load_serialized(paths['ctc_activation'])
    enc = jnp.asarray(np.random.RandomState(0).randn(1, 4, 32), jnp.float32)
    got = ctc_fn(enc)
    want = ctc_mod.ctc_logprobs(params['ctc'], enc, 0.0, cfg.blank_id)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_export_cli(tmp_path):
    """reverb-export end-to-end on a tiny model dir."""
    from pathlib import Path
    from helpers import build_tiny_model_dir
    from reverb_tpu.bin import export as export_bin
    mdir = build_tiny_model_dir(Path(tmp_path) / 'model')
    out = tmp_path / 'artifacts'
    rc = export_bin.main(['--config', str(mdir / 'config.yaml'),
                          '--checkpoint', str(mdir / 'model.npz'),
                          '--output_dir', str(out),
                          '--chunk_size', '4', '--num_left_chunks', '2',
                          '--rescoring_nbest', '3', '--max_hyp_len', '8'])
    assert rc == 0
    assert (out / 'encoder_chunk.stablehlo').exists()
    assert (out / 'manifest.json').exists()
