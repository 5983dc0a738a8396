"""HLG (graph-constrained CTC) decoding tests."""

import numpy as np
import jax
import pytest

from reverb_tpu.decode.hlg import (Fst, hlg_onebest, hlg_rescore,
                                   lexicon_graph)
from reverb_tpu.models.asr_model import ModelConfig, init_params
from tests.test_model_forward import TINY

# tokens: 0=blank, 1='a', 2='b', 3='c'
LEX = {'ab': [1, 2], 'ac': [1, 3], 'b': [2]}


def _logp(spikes, T, V=4, floor=-8.0, peak=0.0):
    """CTC log-prob matrix with blank-dominant frames and given spikes."""
    lp = np.full((T, V), floor, np.float32)
    lp[:, 0] = -0.05
    for t, u in spikes:
        lp[t] = floor
        lp[t, u] = peak
        lp[t, 0] = floor
    # renormalize rows to proper log-probs
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    return lp


def test_lexicon_graph_shape():
    g = lexicon_graph(LEX)
    assert g.start == 0 and g.final == {0: 0.0}
    # 'ab' and 'ac' share the 'a' trie arc
    a_arcs = [a for a in g.arcs[0] if a[1] == 2]  # ilabel = token 1 + 1
    assert len(a_arcs) == 1


def test_onebest_respects_lexicon():
    g = lexicon_graph(LEX)
    # spikes: 'a' then 'c' → only 'ac' is in the lexicon
    lp = _logp([(2, 1), (6, 3)], T=10)
    res = hlg_onebest(lp[None], np.array([10]), g)
    word_ids = {w: i + 1 for i, w in enumerate(sorted(LEX))}
    assert res[0].tokens == [word_ids['ac']]
    assert res[0].nbest[0] == [1, 3]          # CTC token path
    assert res[0].times == [2, 6]


def test_onebest_blocks_oov():
    g = lexicon_graph(LEX)
    # spikes 'c' alone: 'c' is not a word; best in-lexicon path must win
    lp = _logp([(3, 2)], T=8)                 # 'b' spike
    res = hlg_onebest(lp[None], np.array([8]), g)
    word_ids = {w: i + 1 for i, w in enumerate(sorted(LEX))}
    assert res[0].tokens == [word_ids['b']]


def test_word_scores_break_ties():
    # identical acoustics for 'ab' vs 'ac' → grammar score decides
    lp = _logp([(2, 1)], T=6)
    lp[4] = np.log(np.array([0.02, 0.01, 0.485, 0.485], np.float32))
    for fav in ('ab', 'ac'):
        g = lexicon_graph(LEX, word_scores={fav: 2.0})
        res = hlg_onebest(lp[None], np.array([6]), g)
        word_ids = {w: i + 1 for i, w in enumerate(sorted(LEX))}
        assert res[0].tokens == [word_ids[fav]], fav


def test_fst_text_roundtrip():
    text = """0 1 2 0 0.5
1 0 3 1 0.0
0 1.5
"""
    g = Fst.from_text(text)
    assert g.arcs[0] == [(1, 2, 0, -0.5)]
    assert g.final[0] == -1.5


def test_multi_word_sequence():
    g = lexicon_graph(LEX)
    lp = _logp([(1, 2), (5, 1), (8, 2)], T=12)   # 'b' then 'a','b' → b ab
    res = hlg_onebest(lp[None], np.array([12]), g)
    word_ids = {w: i + 1 for i, w in enumerate(sorted(LEX))}
    assert res[0].tokens == [word_ids['b'], word_ids['ab']]


@pytest.fixture(scope='module')
def model():
    cfg = ModelConfig.from_config(TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_hlg_rescore_runs(model):
    cfg, params = model
    V = cfg.vocab_size
    g = lexicon_graph({'ab': [1, 2], 'ac': [1, 3]})
    T = 10
    lp = np.full((T, V), -10.0, np.float32)
    lp[:, 0] = -0.05
    lp[2, :] = -10.0
    lp[2, 1] = -0.02
    lp[6, :] = -10.0
    lp[6, 2] = -0.7
    lp[6, 3] = -0.7  # ambiguous b/c → decoder decides
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    enc = np.random.RandomState(0).randn(1, T, 32).astype(np.float32)
    res = hlg_rescore(params, cfg, lp[None], np.array([T]), enc,
                      np.array([T]), g, lm_scale=0.5, decoder_scale=0.5,
                      r_decoder_scale=0.3, cat_embs=np.array([1.0, 0.0]))
    assert len(res) == 1
    assert len(res[0].tokens) >= 1
    assert np.isfinite(res[0].score)
    assert len(res[0].nbest) >= 2      # both lexicon words reachable
