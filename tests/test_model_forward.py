"""End-to-end tiny-model forward/loss tests: shapes, LSL conditioning effect,
decoder incremental-vs-full consistency, CTC & label-smoothing loss oracles."""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

from reverb_tpu.models.asr_model import (ModelConfig, compute_loss,
                                         forward_attention_decoder,
                                         forward_encoder, init_params)
from reverb_tpu.models import ctc as ctc_mod
from reverb_tpu.models.decoder import (decoder_forward,
                                       decoder_forward_one_step)
from reverb_tpu.utils.common import add_sos_eos

TINY = {
    'input_dim': 80,
    'output_dim': 50,
    'encoder': 'conformer',
    'encoder_conf': {
        'output_size': 32, 'attention_heads': 2, 'linear_units': 64,
        'num_blocks': 4, 'dropout_rate': 0.1, 'positional_dropout_rate': 0.1,
        'attention_dropout_rate': 0.0, 'input_layer': 'conv2d',
        'pos_enc_layer_type': 'rel_pos', 'selfattention_layer_type':
        'rel_selfattn', 'activation_type': 'swish', 'macaron_style': True,
        'use_cnn_module': True, 'cnn_module_kernel': 15,
        'cnn_module_norm': 'batch_norm',
    },
    'decoder': 'bitransformer',
    'decoder_conf': {'attention_heads': 2, 'linear_units': 64,
                     'num_blocks': 3, 'r_num_blocks': 1, 'dropout_rate': 0.1},
    'model_conf': {'ctc_weight': 0.3, 'reverse_weight': 0.3,
                   'lsm_weight': 0.1, 'length_normalized_loss': False},
    'dataset_conf': {'pass_cat_emb': True,
                     'cat_emb_conf': {'emb_len': 2}},
}


@pytest.fixture(scope='module')
def model():
    cfg = ModelConfig.from_config(TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_config_parse(model):
    cfg, params = model
    assert cfg.vocab_size == 50
    assert cfg.sos == cfg.eos == 49
    assert cfg.encoder.num_langs == 2  # LSL from pass_cat_emb
    assert cfg.lsl_enc and not cfg.lsl_dec
    assert 'language_layers' in params['encoder']['encoders'][0]
    assert 'language_layers' in params['encoder']['encoders'][3]
    assert 'language_layers' not in params['encoder']['encoders'][1]


def test_encoder_forward_shapes(model):
    cfg, params = model
    B, T = 2, 67
    feats = jnp.asarray(np.random.RandomState(0).randn(B, T, 80),
                        dtype=jnp.float32)
    lens = jnp.array([T, 40])
    cat = jnp.array([1.0, 0.0])
    out, mask = forward_encoder(params, cfg, feats, lens, cat_embs=cat)
    Tsub = ((T - 1) // 2 - 1) // 2
    assert out.shape == (B, Tsub, 32)
    assert mask.shape == (B, 1, Tsub)
    assert int(mask[0].sum()) == Tsub
    assert int(mask[1].sum()) == ((40 - 1) // 2 - 1) // 2


def test_verbatimicity_changes_output(model):
    cfg, params = model
    feats = jnp.asarray(np.random.RandomState(1).randn(1, 43, 80),
                        dtype=jnp.float32)
    lens = jnp.array([43])
    out1, _ = forward_encoder(params, cfg, feats, lens,
                              cat_embs=jnp.array([1.0, 0.0]))
    out2, _ = forward_encoder(params, cfg, feats, lens,
                              cat_embs=jnp.array([0.0, 1.0]))
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-3


def test_loss_runs_and_is_finite(model):
    cfg, params = model
    rng = np.random.RandomState(2)
    batch = {
        'feats': jnp.asarray(rng.randn(2, 67, 80), dtype=jnp.float32),
        'feats_lengths': jnp.array([67, 50]),
        'target': jnp.array([[3, 4, 5, 6, -1], [7, 8, -1, -1, -1]]),
        'target_lengths': jnp.array([4, 2]),
        'cat_embs': jnp.array([[1.0, 0.0], [0.5, 0.5]]),
    }
    out = compute_loss(params, cfg, batch, rng=jax.random.PRNGKey(3))
    for k in ('loss', 'loss_att', 'loss_ctc'):
        assert np.isfinite(float(out[k])), k
    assert float(out['loss_ctc']) > 0
    # deterministic eval (no rng) also works
    out2 = compute_loss(params, cfg, batch, rng=None)
    assert np.isfinite(float(out2['loss']))


def test_decoder_incremental_matches_full(model):
    cfg, params = model
    rng = np.random.RandomState(4)
    T, D = 9, 32
    memory = jnp.asarray(rng.randn(1, T, D), dtype=jnp.float32)
    memory_mask = jnp.ones((1, 1, T), dtype=bool)
    tokens = jnp.array([[49, 3, 7, 12, 5]])  # sos + 4 tokens
    Lmax = 8
    buf = jnp.zeros((1, Lmax), dtype=jnp.int32)
    buf = buf.at[:, :5].set(tokens)

    # full teacher-forced pass
    full, _ = decoder_forward(params['decoder'], memory, memory_mask,
                              tokens, jnp.array([5]), None, 0.0, cfg.decoder)
    full_logp = jax.nn.log_softmax(full.astype(jnp.float32), axis=-1)

    # incremental: step through positions 0..4
    n_layers = cfg.decoder.num_blocks
    cache = jnp.zeros((n_layers, 1, Lmax, D), dtype=jnp.float32)
    for step in range(5):
        logp, cache = decoder_forward_one_step(
            params['decoder'], memory, memory_mask, buf,
            jnp.asarray(step), cache, cfg.decoder)
    np.testing.assert_allclose(np.asarray(logp[0]),
                               np.asarray(full_logp[0, 4]),
                               rtol=1e-3, atol=1e-4)


def test_forward_attention_decoder_r2l(model):
    cfg, params = model
    rng = np.random.RandomState(5)
    memory = jnp.asarray(rng.randn(1, 9, 32), dtype=jnp.float32)
    hyps = jnp.array([[49, 3, 4, 5, 49], [49, 6, 7, 49, 49]])
    lens = jnp.array([4, 3])
    l_x, r_x = forward_attention_decoder(params, cfg, hyps, lens, memory,
                                         reverse_weight=0.3)
    assert l_x.shape == (2, 5, 50)
    assert r_x.shape == (2, 5, 50)
    assert np.isfinite(np.asarray(l_x)).all()


def test_ctc_loss_matches_torch():
    rng = np.random.RandomState(6)
    B, T, V, L = 2, 12, 10, 4
    logits = rng.randn(B, T, V).astype(np.float32)
    labels = np.array([[1, 2, 3, 4], [5, 6, 0, 0]])
    in_lens = np.array([12, 9])
    lab_lens = np.array([4, 2])
    params = {'ctc_lo': {'weight': jnp.eye(V), 'bias': jnp.zeros(V)}}
    ours = float(ctc_mod.ctc_loss(params, jnp.asarray(logits),
                                  jnp.asarray(in_lens), jnp.asarray(labels),
                                  jnp.asarray(lab_lens)))
    lp = torch.from_numpy(logits).log_softmax(-1).transpose(0, 1)
    theirs = torch.nn.CTCLoss(reduction='sum', zero_infinity=True)(
        lp, torch.from_numpy(labels), torch.from_numpy(in_lens),
        torch.from_numpy(lab_lens)) / B
    np.testing.assert_allclose(ours, float(theirs), rtol=1e-3)


def test_label_smoothing_matches_torch():
    rng = np.random.RandomState(7)
    B, L, V = 2, 5, 10
    logits = rng.randn(B, L, V).astype(np.float32)
    target = np.array([[1, 2, 3, -1, -1], [4, 5, 6, 7, 8]])
    smoothing = 0.1
    ours = float(ctc_mod.label_smoothing_loss(
        jnp.asarray(logits), jnp.asarray(target), None, smoothing, V, -1))
    # torch oracle: KLDiv(log_softmax, smoothed one-hot), sum over non-pad / B
    logp = torch.from_numpy(logits).log_softmax(-1)
    conf = 1 - smoothing
    low = smoothing / (V - 1)
    t = torch.from_numpy(target)
    mask = t != -1
    true = torch.full((B, L, V), low)
    true.scatter_(2, t.clamp(min=0).unsqueeze(-1), conf)
    kl = torch.nn.functional.kl_div(logp, true, reduction='none').sum(-1)
    expected = kl.masked_fill(~mask, 0).sum() / B
    np.testing.assert_allclose(ours, float(expected), rtol=1e-4)


def test_filter_blank_embedding_matches_python_oracle():
    """Static-shape compaction == reference index_select+pad
    (asr_model.py:220-246)."""
    from reverb_tpu.models.asr_model import filter_blank_embedding
    rng = np.random.RandomState(3)
    B, T, D, V = 3, 11, 4, 6
    enc = rng.randn(B, T, D).astype(np.float32)
    probs = rng.randn(B, T, V).astype(np.float32)
    lens = np.array([11, 7, 0])
    mask = (np.arange(T)[None, :] < lens[:, None])[:, None, :]
    cfg = ModelConfig.from_config(TINY)
    out, new_mask = filter_blank_embedding(
        cfg, jnp.asarray(probs), jnp.asarray(enc), jnp.asarray(mask))
    out, new_mask = np.asarray(out), np.asarray(new_mask)
    top1 = probs.argmax(-1)
    for b in range(B):
        keep = [t for t in range(int(lens[b])) if top1[b, t] != cfg.blank_id]
        np.testing.assert_allclose(out[b, :len(keep)], enc[b, keep],
                                   rtol=1e-6)
        assert new_mask[b, 0].sum() == len(keep)
        np.testing.assert_allclose(out[b, len(keep):], 0.0)


def test_apply_non_blank_embedding_loss_and_decode():
    conf = dict(TINY)
    conf['model_conf'] = dict(TINY['model_conf'],
                              apply_non_blank_embedding=True)
    cfg = ModelConfig.from_config(conf)
    assert cfg.apply_non_blank_embedding
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, T = 2, 37
    batch = {
        'feats': jnp.asarray(np.random.RandomState(0)
                             .randn(B, T, 80).astype(np.float32)),
        'feats_lengths': jnp.array([T, T - 9]),
        'target': jnp.array([[1, 2, 3, -1], [4, 5, -1, -1]]),
        'target_lengths': jnp.array([3, 2]),
        'cat_embs': jnp.array([[1.0, 0.0], [0.0, 1.0]]),
    }
    out = compute_loss(params, cfg, batch)
    assert np.isfinite(float(out['loss']))

    from reverb_tpu.decode.api import decode
    res = decode(params, cfg, ['attention_rescoring'], batch['feats'],
                 batch['feats_lengths'], beam_size=3,
                 cat_embs=np.array([1.0, 0.0]))
    assert len(res['attention_rescoring']) == B


def test_label_smoothing_closed_form_matches_explicit():
    """The closed-form KL (no (B,L,V) f32 temps) must match the explicit
    true_dist/log_softmax formulation in value AND gradient, including
    smoothing=0 (KLDiv 0·log0=0 convention) and normalize_length."""
    import jax

    def explicit(logits, target, smoothing, V, ignore_id=-1,
                 normalize_length=False):
        B, L = target.shape
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        confidence = 1.0 - smoothing
        low = smoothing / (V - 1)
        mask = target != ignore_id
        tgt = jnp.where(mask, target, 0)
        true_dist = jnp.full((B, L, V), low, dtype=jnp.float32)
        true_dist = jnp.put_along_axis(
            true_dist, tgt[..., None], confidence, axis=-1, inplace=False)
        kl_terms = jnp.where(
            true_dist > 0,
            true_dist * (jnp.log(jnp.maximum(true_dist, 1e-30)) - logp), 0.0)
        kl = jnp.where(mask, jnp.sum(kl_terms, axis=-1), 0.0)
        denom = jnp.sum(mask) if normalize_length else B
        return jnp.sum(kl) / denom

    rng = np.random.RandomState(0)
    B, L, V = 3, 7, 50
    target = np.array([[1, 2, 3, -1, -1, -1, -1],
                       [4, 5, 6, 7, 8, 9, 10],
                       [11, 12, -1, -1, -1, -1, -1]])
    for smoothing in [0.1, 0.0]:
        for norm_len in [False, True]:
            for dtype in [np.float32, jnp.bfloat16]:
                logits = jnp.asarray(
                    rng.randn(B, L, V) * 3, dtype)
                got, ggrad = jax.value_and_grad(
                    lambda x: ctc_mod.label_smoothing_loss(
                        x, jnp.asarray(target), None, smoothing, V, -1,
                        norm_len))(logits)
                want, wgrad = jax.value_and_grad(
                    lambda x: explicit(x, jnp.asarray(target), smoothing, V,
                                       -1, norm_len))(logits)
                np.testing.assert_allclose(float(got), float(want),
                                           rtol=2e-5, atol=1e-6)
                np.testing.assert_allclose(
                    np.asarray(ggrad, np.float32),
                    np.asarray(wgrad, np.float32), rtol=2e-3, atol=2e-5)
