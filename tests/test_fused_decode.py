"""Fused serving path (decode/api._fused_rescoring_program): the single
device program wiring encoder → CTC top-k → prefix beam → attention
rescoring must return exactly what the generic multi-dispatch path returns
(asr_model.py:331-432 semantics), including blank-skip, bidecoder reverse
scores, in-beam context biasing, and the overflow fallback."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reverb_tpu.decode import api
from reverb_tpu.models.asr_model import ModelConfig, init_params

TINY = {
    'input_dim': 16, 'output_dim': 30,
    'encoder': 'conformer',
    'encoder_conf': {'output_size': 32, 'attention_heads': 2,
                     'linear_units': 48, 'num_blocks': 2,
                     'cnn_module_kernel': 7, 'dropout_rate': 0.0,
                     'attention_dropout_rate': 0.0,
                     'positional_dropout_rate': 0.0},
    'decoder': 'bitransformer',
    'decoder_conf': {'attention_heads': 2, 'linear_units': 48,
                     'num_blocks': 1, 'r_num_blocks': 1,
                     'dropout_rate': 0.0,
                     'self_attention_dropout_rate': 0.0,
                     'src_attention_dropout_rate': 0.0,
                     'positional_dropout_rate': 0.0},
    'model_conf': {'ctc_weight': 0.3, 'reverse_weight': 0.3},
}

MODES = ['ctc_prefix_beam_search', 'attention_rescoring']


def _setup():
    cfg = ModelConfig.from_config(TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(7)
    B, T = 3, 40
    feats = rng.randn(B, T, 16).astype(np.float32)
    feats_lens = np.array([40, 29, 40], np.int32)
    return cfg, params, feats, feats_lens


def _generic(monkeypatch, *args, **kw):
    """Run decode() with the fused fast path disabled."""
    monkeypatch.setattr(api, '_decode_fused', lambda *a, **k: None)
    return api.decode(*args, **kw)


def _assert_same(got, ref):
    assert set(got) == set(ref)
    for mode in ref:
        assert len(got[mode]) == len(ref[mode])
        for g, r in zip(got[mode], ref[mode]):
            assert g.tokens == r.tokens, mode
            assert g.times == r.times, mode
            assert (g.score is None) == (r.score is None)
            if r.score is not None:
                np.testing.assert_allclose(g.score, r.score, rtol=1e-5,
                                           atol=1e-5)
            assert (g.tokens_confidence is None) == \
                (r.tokens_confidence is None)
            if r.tokens_confidence is not None:
                np.testing.assert_allclose(g.tokens_confidence,
                                           r.tokens_confidence, rtol=1e-4,
                                           atol=1e-5)
            if mode == 'ctc_prefix_beam_search':
                assert g.nbest == r.nbest
                np.testing.assert_allclose(g.nbest_scores, r.nbest_scores,
                                           rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('fused_mode', [True, 'post'])
@pytest.mark.parametrize('blank_skip,rev_w', [(0.0, 0.0), (0.6, 0.3)])
def test_fused_matches_generic(monkeypatch, blank_skip, rev_w, fused_mode):
    cfg, params, feats, feats_lens = _setup()
    kw = dict(beam_size=4, ctc_weight=0.4, reverse_weight=rev_w,
              blank_skip_threshold=blank_skip)
    got = api.decode(params, cfg, MODES, feats, feats_lens, fused=fused_mode,
                     **kw)
    ref = _generic(monkeypatch, params, cfg, MODES, feats, feats_lens, **kw)
    _assert_same(got, ref)


def test_fused_with_context_graph(monkeypatch):
    from reverb_tpu.decode.context_graph import ContextGraph
    cfg, params, feats, feats_lens = _setup()
    graph = ContextGraph(context_score=2.0)
    graph.build([[3, 5], [7, 2, 4]])
    kw = dict(beam_size=4, ctc_weight=0.4, context_graph=graph)
    got = api.decode(params, cfg, MODES, feats, feats_lens, fused=True, **kw)
    ref = _generic(monkeypatch, params, cfg, MODES, feats, feats_lens, **kw)
    _assert_same(got, ref)


def test_fused_overflow_falls_back(monkeypatch):
    """max_hyp_len smaller than a produced hyp → generic path results."""
    cfg, params, feats, feats_lens = _setup()
    kw = dict(beam_size=4, ctc_weight=0.4)
    got = api.decode(params, cfg, MODES, feats, feats_lens, max_hyp_len=1,
                     fused=True, **kw)
    ref = _generic(monkeypatch, params, cfg, MODES, feats, feats_lens, **kw)
    _assert_same(got, ref)


def test_fused_post_matches_generic_int8(monkeypatch):
    """int8-PTQ params through the default fused='post' path must equal the
    generic multi-dispatch path on the same quantized params (the bench's
    REVERB_BENCH_INT8 run now rides the fused default)."""
    from reverb_tpu.ops.quant import quantize_params_int8
    cfg, params, feats, feats_lens = _setup()
    qp = quantize_params_int8(params)
    kw = dict(beam_size=4, ctc_weight=0.4, reverse_weight=0.3)
    got = api.decode(qp, cfg, MODES, feats, feats_lens, fused='post', **kw)
    ref = _generic(monkeypatch, qp, cfg, MODES, feats, feats_lens, **kw)
    _assert_same(got, ref)


def test_fused_rescoring_only_mode():
    cfg, params, feats, feats_lens = _setup()
    got = api.decode(params, cfg, ['attention_rescoring'], feats, feats_lens,
                     beam_size=4, ctc_weight=0.4, fused=True)
    assert set(got) == {'attention_rescoring'}
    assert all(isinstance(r.tokens, list) for r in got['attention_rescoring'])
