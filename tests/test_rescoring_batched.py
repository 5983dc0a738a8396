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
