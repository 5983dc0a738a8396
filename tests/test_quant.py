"""int8 PTQ serving path (ops/quant.py): quantized encoder stays close to
f32 and greedy CTC tokens survive quantization."""

import numpy as np
import jax
import jax.numpy as jnp

from reverb_tpu.models.asr_model import ModelConfig, init_params
from reverb_tpu.decode.api import encode_and_ctc
from reverb_tpu.ops.quant import int8_matmul, quantize_params_int8
from tests.test_model_forward import TINY


def test_int8_matmul_close_to_f32():
    rng = np.random.RandomState(0)
    x = rng.randn(64, 96).astype(np.float32)
    w = rng.randn(32, 96).astype(np.float32)
    scale = np.maximum(np.abs(w).max(1) / 127.0, 1e-12)
    q = np.clip(np.round(w / scale[:, None]), -127, 127).astype(np.int8)
    got = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(q),
                                 jnp.asarray(scale)))
    want = x @ w.T
    err = np.abs(got - want) / (np.abs(want).max() + 1e-9)
    assert err.max() < 0.02


def test_quantize_params_skips_and_converts():
    cfg = ModelConfig.from_config(TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    qp = quantize_params_int8(params)
    lp = qp['encoder']['encoders'][1]
    assert 'weight_q8' in lp['self_attn']['linear_q']
    assert lp['self_attn']['linear_q']['weight_q8'].dtype == jnp.int8
    assert 'weight' in qp['ctc']['ctc_lo']            # skipped head
    assert 'weight' not in lp['feed_forward']['w_1']
    # original tree untouched
    assert 'weight' in params['encoder']['encoders'][1]['self_attn']['linear_q']


def test_int8_encoder_matches_f32_and_greedy_tokens():
    cfg = ModelConfig.from_config(TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    qp = quantize_params_int8(params)
    B, T = 2, 67
    feats = jnp.asarray(np.random.RandomState(0).randn(B, T, 80),
                        jnp.float32)
    lens = jnp.array([T, T - 11])
    cat = jnp.array([1.0, 0.0])
    enc, el, ctc = encode_and_ctc(params, cfg, feats, lens, cat)
    enc_q, el_q, ctc_q = encode_and_ctc(qp, cfg, feats, lens, cat)
    assert np.array_equal(np.asarray(el), np.asarray(el_q))
    rel = (np.abs(np.asarray(enc - enc_q))
           / (np.abs(np.asarray(enc)).max() + 1e-9))
    assert rel.max() < 0.12    # random net, per-layer noise compounds
    assert np.isfinite(np.asarray(ctc_q)).all()
    tok = np.asarray(jnp.argmax(ctc, -1))
    tok_q = np.asarray(jnp.argmax(ctc_q, -1))
    agree = (tok == tok_q).mean()
    assert agree > 0.95        # greedy path effectively unchanged


def test_cli_int8_end_to_end(tmp_path):
    import sys
    import wave as wave_mod
    sys.path.insert(0, 'tests')
    from helpers import build_tiny_model_dir
    from reverb_tpu.cli import recognize_wav
    mdir = build_tiny_model_dir(tmp_path / 'model')
    sr = 16000
    t = np.arange(sr) / sr
    pcm = (np.clip(0.3 * np.sin(2 * np.pi * 440 * t), -1, 1)
           * 32767).astype('<i2')
    wav = tmp_path / 'a.wav'
    with wave_mod.open(str(wav), 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    argv = ['--audio_file', str(wav), '--config', str(mdir / 'config.yaml'),
            '--checkpoint', str(mdir / 'model.npz'),
            '--tokenizer-symbols', str(mdir / 'tk.units.txt'),
            '--modes', 'ctc_greedy_search', '--quantize', 'int8',
            '--result_dir', str(tmp_path / 'out')]
    old = sys.argv
    sys.argv = ['reverb'] + argv
    try:
        recognize_wav.main()
    finally:
        sys.argv = old
    assert (tmp_path / 'out' / 'ctc_greedy_search' / 'a.ctm').exists()


def test_static_calibrated_scales_match_dynamic():
    """calibrate_activation_scales + apply_activation_scales: every int8
    site seen by the calibration forward gets an a_scale, the static-scale
    path stays close to the dynamic path on in-calibration-range data, and
    greedy tokens are unchanged."""
    from reverb_tpu.ops.quant import (apply_activation_scales,
                                      calibrate_activation_scales)
    cfg = ModelConfig.from_config(TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    qp = quantize_params_int8(params)
    B, T = 2, 67
    rng = np.random.RandomState(0)
    cat = jnp.array([1.0, 0.0])
    lens = jnp.array([T, T - 11])

    from reverb_tpu.models.asr_model import forward_encoder
    from reverb_tpu.models import ctc as ctc_mod

    def run(p, feats):
        # plain model functions (no nested jit — see
        # calibrate_activation_scales docstring)
        enc, mask = forward_encoder(p, cfg, feats, lens, cat_embs=cat)
        ctc_mod.ctc_logprobs(p['ctc'], enc, 0.0, cfg.blank_id)

    batches = [(jnp.asarray(rng.randn(B, T, 80), jnp.float32),)
               for _ in range(3)]
    scales = calibrate_activation_scales(qp, run, batches)
    assert scales, 'no sites recorded'
    sp = apply_activation_scales(qp, scales)
    lp = sp['encoder']['encoders'][1]
    assert 'a_scale' in lp['self_attn']['linear_q']
    # conv subsample stack calibrated too
    emb = sp['encoder']['embed']
    found_conv = any('a_scale' in n for n in jax.tree.leaves(
        emb, is_leaf=lambda n: isinstance(n, dict) and 'weight_q8' in n)
        if isinstance(n, dict))
    assert found_conv

    feats = batches[0][0]
    enc_d, el_d, ctc_d = encode_and_ctc(qp, cfg, feats, lens, cat)
    enc_s, el_s, ctc_s = encode_and_ctc(sp, cfg, feats, lens, cat)
    assert np.array_equal(np.asarray(el_d), np.asarray(el_s))
    rel = (np.abs(np.asarray(enc_d - enc_s))
           / (np.abs(np.asarray(enc_d)).max() + 1e-9))
    assert rel.max() < 0.12
    tok_d = np.asarray(jnp.argmax(ctc_d, -1))
    tok_s = np.asarray(jnp.argmax(ctc_s, -1))
    # random-net logits are near-flat, so argmax measures tie-breaking
    # more than accuracy (the full-dims gate lives in
    # test_full_scale_parity.py::test_full_dims_int8_mode_deltas)
    assert (tok_d == tok_s).mean() > 0.9
