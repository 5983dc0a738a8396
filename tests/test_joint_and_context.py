"""Joint time-sync decoding + context graph tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reverb_tpu.decode.context_graph import ContextGraph
from reverb_tpu.decode.joint import joint_decoding
from reverb_tpu.models.asr_model import ModelConfig, init_params
from tests.test_model_forward import TINY


@pytest.fixture(scope='module')
def model():
    cfg = ModelConfig.from_config(TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_joint_decoding_runs(model):
    cfg, params = model
    rng = np.random.RandomState(0)
    T, D, V = 12, 32, 50
    enc = rng.randn(1, T, D).astype(np.float32)
    logits = rng.randn(1, T, V).astype(np.float32)
    logits[:, :, 0] += 2.0                        # blank-dominant
    spikes = [2, 5, 9]
    for i, t in enumerate(spikes):
        logits[0, t, 5 + i] += 6.0
    ctc = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    res = joint_decoding(params, cfg, enc, np.array([T]), ctc,
                         ctc_weight=0.5, beam_size=3, length_bonus=0.5)
    assert len(res) == 1
    r = res[0]
    assert isinstance(r.tokens, list)
    assert len(r.times) == len(r.tokens)
    assert len(r.tokens_confidence) == len(r.tokens)
    assert np.isfinite(r.score)


def test_joint_ctc_only_matches_spikes(model):
    cfg, params = model
    rng = np.random.RandomState(1)
    T, V = 10, 50
    enc = rng.randn(1, T, 32).astype(np.float32)
    # distinct low filler values keep spike tokens OUT of the pre-beam on
    # non-spike frames (pre-beam inclusion would smear the start times — a
    # bookkeeping quirk shared with the reference's times dict)
    filler = -20.0 - (V - np.arange(V)) * 0.01
    logits = np.tile(filler[None, None, :], (1, T, 1)).astype(np.float32)
    logits[:, :, 0] = 0.0
    logits[0, 3, 7] = 5.0
    logits[0, 3, 0] = -8.0
    logits[0, 7, 9] = 5.0
    logits[0, 7, 0] = -8.0
    ctc = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    res = joint_decoding(params, cfg, enc, np.array([T]), ctc,
                         ctc_weight=1.0, beam_size=2, length_bonus=0.0)
    assert res[0].tokens == [7, 9]
    assert res[0].times == [3, 7]


def test_context_graph_scoring():
    table = {'▁a': 1, 'b': 2, '▁c': 3}
    g = ContextGraph(symbol_table=table, context_list=['ab'],
                     context_score=2.0, tokenizer=None)
    # 'ab' tokenized char-wise: a→? our fallback maps chars; build explicit
    g2 = ContextGraph(context_score=2.0, context_list=[],
                      symbol_table=table)
    g2.build([[1, 2]])
    # full match earns 2 per token
    assert abs(g2.score_sequence([1, 2]) - 4.0) < 1e-6
    # partial match is backed off at finalize
    assert abs(g2.score_sequence([1]) - 0.0) < 1e-6
    # non-matching tokens score 0
    assert abs(g2.score_sequence([3, 3]) - 0.0) < 1e-6


def test_context_graph_rescore_nbest():
    from reverb_tpu.decode.results import DecodeResult
    g = ContextGraph(context_score=5.0, symbol_table={'x': 1})
    g.build([[4, 5]])
    res = DecodeResult(tokens=[1, 2], score=-1.0,
                       nbest=[[1, 2], [4, 5]], nbest_scores=[-1.0, -1.5],
                       nbest_times=[[0, 1], [0, 1]], times=[0, 1])
    out = g.rescore_nbest([res])[0]
    assert out.tokens == [4, 5]          # bias phrase wins after +10 bonus
    assert abs(out.score - 8.5) < 1e-6


def test_joint_lexicon_constraint_from_config(tmp_path):
    """model_conf.lexicon_path/token_path (asr_model.py:73-74, 112-127) load
    words/prefixes/tok_to_str and constrain the time-sync beam: with a
    lexicon admitting only '▁ab', hypotheses whose last complete word is not
    in it are pruned."""
    from reverb_tpu.decode.joint import load_lexicon
    conf = {k: (dict(v) if isinstance(v, dict) else v) for k, v in TINY.items()}
    tok = tmp_path / 'units.txt'
    # full-vocab units table (the reference's tk.units.txt covers every id);
    # ids 5,6,7 → ▁a, b, ▁c; everything else a non-word-start filler token
    lines = {0: '<blank>', 5: '▁a', 6: 'b', 7: '▁c'}
    tok.write_text(''.join(f'{lines.get(i, f"z{i}")} {i}\n'
                           for i in range(50)))
    lex = tmp_path / 'lexicon.txt'
    lex.write_text('▁ab ▁a b\n')
    conf['model_conf'] = dict(conf.get('model_conf', {}) or {},
                              lexicon_path=str(lex), token_path=str(tok))
    cfg = ModelConfig.from_config(conf)
    assert cfg.lexicon_path == str(lex) and cfg.token_path == str(tok)

    words, prefixes, tok_to_str = load_lexicon(cfg.lexicon_path,
                                               cfg.token_path)
    assert words == {'▁ab': 1}
    assert prefixes == {'▁a': 1, '▁ab': 1}
    assert tok_to_str[5] == '▁a' and tok_to_str[6] == 'b'

    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(2)
    T, D, V = 12, 32, 50
    enc = rng.randn(1, T, D).astype(np.float32)
    logits = rng.randn(1, T, V).astype(np.float32)
    logits[:, :, 0] += 5.0      # blank always within the pre-beam, so the
    # beam survives via the blank branch and the reference's
    # empty-filter-output fallback (beam_search_timesync.py:428-431) — which
    # we reproduce — never fires on non-spike frames
    for t, v in [(2, 5), (5, 6), (9, 7)]:     # ▁a b then off-lexicon ▁c
        logits[0, t, v] += 9.0
    ctc = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    res = joint_decoding(params, cfg, enc, np.array([T]), ctc,
                         ctc_weight=0.5, beam_size=3, length_bonus=0.5)
    toks = res[0].tokens
    # the lexicon admits only the word '▁ab' (prefix '▁a'): every token must
    # be ▁a / b / ▁c (fillers are invalid continuations and invalid word
    # starts), '▁c' can only be the final in-progress token (nothing after
    # it is a valid prefix or word), and every COMPLETED word must be '▁ab'
    assert set(toks) <= {5, 6, 7}, toks
    assert 7 not in toks or toks[-1] == 7, toks
    for i, tk in enumerate(toks):
        if tok_to_str[tk].startswith('▁') and i > 0:
            w = ''
            for j in range(i - 1, -1, -1):
                w = tok_to_str[toks[j]] + w
                if tok_to_str[toks[j]].startswith('▁'):
                    break
            assert w in words, (w, toks)
