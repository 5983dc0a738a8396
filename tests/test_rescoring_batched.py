"""Whole-batch attention rescoring: ragged nbests, empty utterances, and
equivalence with a straightforward per-utterance reference computation.

Covers decode/rescoring.py `attention_rescoring` (one vmapped device program
for the whole batch) against the search.py:363-448 semantics.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from reverb_tpu.decode.rescoring import _rescore_device, attention_rescoring
from reverb_tpu.decode.results import DecodeResult
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


def _setup():
    cfg = ModelConfig.from_config(TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    B, T, D = 3, 12, 32
    enc = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    enc_lens = np.array([12, 9, 12], np.int64)
    return cfg, params, enc, enc_lens


def _mk_results(nbests, scores):
    out = []
    for hyps, sc in zip(nbests, scores):
        out.append(DecodeResult(
            tokens=hyps[0] if hyps else [], nbest=hyps, nbest_scores=sc,
            nbest_times=[[i for i, _ in enumerate(h)] for h in hyps]))
    return out


def test_ragged_nbest_matches_per_utt_reference():
    cfg, params, enc, enc_lens = _setup()
    nbests = [
        [[1, 2, 3], [4, 5]],          # N=2
        [[7]],                        # N=1
        [[2, 2, 8, 9], [3], [6, 6]],  # N=3
    ]
    scores = [[-1.0, -2.0], [-0.5], [-3.0, -1.5, -2.5]]
    pre = _mk_results(nbests, scores)
    got = attention_rescoring(params, cfg, pre, enc, enc_lens,
                              ctc_weight=0.4, reverse_weight=0.3)
    assert len(got) == 3
    # per-utterance reference: one _rescore_device call per utt
    for b, (hyps, sc) in enumerate(zip(nbests, scores)):
        N = len(hyps)
        Lb = 16
        hp = np.zeros((N, Lb), np.int32)
        lens = np.zeros((N,), np.int32)
        for i, h in enumerate(hyps):
            hp[i, :len(h)] = h
            lens[i] = len(h)
        att, r_att, tok_logp = _rescore_device(
            params, cfg, jnp.asarray(hp), jnp.asarray(lens), enc[b:b+1],
            0.3, None, jnp.asarray(int(enc_lens[b]), jnp.int32))
        att, r_att = np.asarray(att, np.float64), np.asarray(r_att, np.float64)
        score = att * 0.7 + r_att * 0.3
        total = score + np.asarray(sc) * 0.4
        best = int(np.argmax(total))
        assert got[b].tokens == hyps[best], (b, got[b].tokens)
        np.testing.assert_allclose(got[b].score, total[best], rtol=1e-5)
        want_tc = [math.exp(float(x))
                   for x in np.asarray(tok_logp)[best, :lens[best]]]
        np.testing.assert_allclose(got[b].tokens_confidence, want_tc,
                                   rtol=1e-4)


def test_empty_and_allempty_nbest():
    cfg, params, enc, enc_lens = _setup()
    pre = _mk_results([[[1, 2]], [[]], []],
                      [[-1.0], [0.0], []])
    got = attention_rescoring(params, cfg, pre, enc, enc_lens,
                              ctc_weight=0.1, reverse_weight=0.0)
    assert got[0].tokens == [1, 2]
    assert got[1].tokens == [] and got[2].tokens == []

    pre_all_empty = _mk_results([[[]], [], [[]]], [[0.0], [], [0.0]])
    got = attention_rescoring(params, cfg, pre_all_empty, enc, enc_lens)
    assert all(r.tokens == [] for r in got)


def test_padded_rows_never_win():
    """ctc_weight=0 must not let a zero-length padding row (score 0·-inf)
    beat real hypotheses."""
    cfg, params, enc, enc_lens = _setup()
    pre = _mk_results([[[1, 2, 3]], [[4, 5], [6]], [[7, 8]]],
                      [[-1.0], [-1.0, -2.0], [-1.5]])
    got = attention_rescoring(params, cfg, pre, enc, enc_lens,
                              ctc_weight=0.0, reverse_weight=0.0)
    assert got[0].tokens == [1, 2, 3]
    assert got[1].tokens in ([4, 5], [6])
    assert got[2].tokens == [7, 8]


def test_device_nbest_handoff_matches_host_packing():
    """decode/api.py hands the beam's raw device tuple straight to the
    rescorer (no nbest re-upload); results must match the host-packed
    path field for field — including utterances whose beam has fewer
    valid rows than K (NEG_INF sentinel rows)."""
    from reverb_tpu.decode.prefix_beam import ctc_prefix_beam_search_raw

    cfg, params, enc, enc_lens = _setup()
    rng = np.random.RandomState(7)
    # utterance 1 has ZERO frames: the beam state stays initial (one valid
    # empty prefix + NEG_INF sentinel rows) — the raw↔packed row mapping
    # must survive sentinel rows
    B, T, V = 3, 12, 10
    logp = jax.nn.log_softmax(
        jnp.asarray(rng.randn(B, T, V) * 2.0, jnp.float32), axis=-1)
    ctc_lens = jnp.asarray([12, 0, 9], jnp.int32)
    pre, raw = ctc_prefix_beam_search_raw(logp, ctc_lens, beam_size=8)
    assert any(len(p.nbest) < 8 for p in pre)   # sentinel rows exercised

    kw = dict(ctc_weight=0.35, reverse_weight=0.3)
    host = attention_rescoring(params, cfg, pre, enc, np.asarray(enc_lens),
                               **kw)
    dev = attention_rescoring(params, cfg, pre, enc, np.asarray(enc_lens),
                              device_nbest=raw, **kw)
    for h, d in zip(host, dev):
        assert d.tokens == h.tokens
        assert d.nbest == h.nbest
        assert d.times == h.times and d.nbest_times == h.nbest_times
        if h.nbest_scores is None:      # empty-utterance guard result
            assert d.nbest_scores is None and d.tokens_confidence == []
            continue
        np.testing.assert_allclose(d.score, h.score, rtol=1e-5)
        np.testing.assert_allclose(d.confidence, h.confidence, rtol=1e-5)
        np.testing.assert_allclose(d.nbest_scores, h.nbest_scores, rtol=1e-5)
        np.testing.assert_allclose(d.tokens_confidence, h.tokens_confidence,
                                   rtol=1e-4)
