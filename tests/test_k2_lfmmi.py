"""LF-MMI (k2_model) tests: FSA forward scorers vs brute-force enumeration
and vs optax CTC, plus the registry bundle end-to-end.

Reference semantics: asr/wenet/k2/model.py:27-120 (K2Model delegates to
icefall LFMMILoss; loss = mmi / batch). Our TPU-native equivalents live in
reverb_tpu/ops/fsa.py + reverb_tpu/models/k2_model.py.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from reverb_tpu.ops import fsa


def _rand_logp(rng, T, V):
    x = rng.randn(T, V).astype(np.float32)
    return np.log(np.exp(x) / np.exp(x).sum(-1, keepdims=True))


def _ctc_trellis_arcs(tokens, blank_id):
    """2L+1-state transcript trellis as an arc table (host, test-only)."""
    L = len(tokens)
    S = 2 * L + 1
    lab = [blank_id if s % 2 == 0 else tokens[(s - 1) // 2]
           for s in range(S)]
    src, dst, labels, w = [], [], [], []
    for s in range(S):
        for k in (0, 1, 2):
            p = s - k
            if p < 0:
                continue
            if k == 2:
                # skip allowed only into a token state whose token differs
                # from the previous token state's
                if s % 2 == 0 or s < 3 or lab[s] == lab[s - 2]:
                    continue
            src.append(p)
            dst.append(s)
            labels.append(lab[s])
            w.append(0.0)
    final = np.full((S,), fsa.NEG_INF, np.float32)
    final[S - 1] = 0.0
    if L > 0:
        final[S - 2] = 0.0
    return (np.array(src, np.int32), np.array(dst, np.int32),
            np.array(labels, np.int32), np.array(w, np.float32), S, final)


def test_fsa_forward_matches_optax_ctc():
    """Numerator equivalence: transcript-trellis forward == −optax.ctc_loss."""
    rng = np.random.RandomState(0)
    T, V, blank = 11, 6, 0
    for tokens in ([1, 2, 2, 3], [4], [5, 5], [1, 2, 3, 4, 5]):
        logp = _rand_logp(rng, T, V)
        src, dst, lab, w, S, final = _ctc_trellis_arcs(tokens, blank)
        score = float(fsa.fsa_forward_score(
            jnp.asarray(logp), jnp.int32(T), jnp.asarray(src),
            jnp.asarray(dst), jnp.asarray(lab), jnp.asarray(w), S,
            jnp.asarray(final)))
        labels = jnp.asarray([tokens], jnp.int32)
        nll = float(optax.ctc_loss(
            jnp.asarray(logp)[None], jnp.zeros((1, T)), labels,
            jnp.zeros((1, len(tokens))), blank_id=blank)[0])
        assert abs(score + nll) < 1e-3, (tokens, score, nll)


def _brute_force_den(logp, T, blank, lm_weight_fn):
    """Enumerate all V^T frame-label paths; weight = acoustics + LM weight
    of the CTC-collapsed emission sequence."""
    V = logp.shape[1]
    tot = -np.inf
    for path in itertools.product(range(V), repeat=T):
        ac = sum(logp[t, l] for t, l in enumerate(path))
        emitted, prev = [], None
        for l in path:  # noqa: E741
            if l != blank and l != prev:
                emitted.append(l)
            prev = l
        lm = lm_weight_fn(emitted)
        tot = np.logaddexp(tot, ac + lm)
    return tot


def test_dense_unigram_den_vs_brute_force():
    rng = np.random.RandomState(1)
    T, V, blank = 4, 4, 0
    logp = _rand_logp(rng, T, V)
    uni = np.full((V,), -np.log(V - 1), np.float32)
    uni[blank] = fsa.NEG_INF
    got = float(fsa.dense_unigram_den_score(
        jnp.asarray(logp), jnp.int32(T), jnp.asarray(uni), blank))
    want = _brute_force_den(logp, T, blank,
                            lambda em: -np.log(V - 1) * len(em))
    assert abs(got - want) < 1e-3, (got, want)


def test_dense_unigram_den_respects_length_mask():
    rng = np.random.RandomState(2)
    T, V, blank = 6, 4, 0
    logp = _rand_logp(rng, T, V)
    uni = np.full((V,), -np.log(V - 1), np.float32)
    got = float(fsa.dense_unigram_den_score(
        jnp.asarray(logp), jnp.int32(3), jnp.asarray(uni), blank))
    want = float(fsa.dense_unigram_den_score(
        jnp.asarray(logp[:3]), jnp.int32(3), jnp.asarray(uni), blank))
    assert abs(got - want) < 1e-4


def test_bigram_den_vs_brute_force():
    rng = np.random.RandomState(3)
    T, V, blank = 4, 4, 0
    K = V - 1
    logp = _rand_logp(rng, T, V)
    big = np.log(rng.dirichlet(np.ones(K), size=K)).astype(np.float32)
    sos = np.log(rng.dirichlet(np.ones(K))).astype(np.float32)
    tokens = np.array([1, 2, 3], np.int32)
    src, dst, lab, w, S, final = fsa.bigram_den_arcs(
        big, blank, sos_logp=sos, tokens=tokens)
    got = float(fsa.fsa_forward_score(
        jnp.asarray(logp), jnp.int32(T), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(lab), jnp.asarray(w), S, jnp.asarray(final)))
    row = {int(t): i for i, t in enumerate(tokens)}

    def lm(emitted):
        s = 0.0
        prev = None
        for e in emitted:
            s += sos[row[e]] if prev is None else big[row[prev], row[e]]
            prev = e
        return s

    want = _brute_force_den(logp, T, blank, lm)
    assert abs(got - want) < 1e-3, (got, want)


def test_mmi_gradient_is_posterior_difference():
    """∂(den−num)/∂logits must be finite and sum ≈ 0 per frame (both terms
    are normalized posteriors over the vocab)."""
    rng = np.random.RandomState(4)
    T, V, blank = 8, 5, 0
    logits = jnp.asarray(rng.randn(T, V).astype(np.float32))
    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    uni = jnp.full((V,), -np.log(V - 1))

    def mmi(logits):
        logp = jax.nn.log_softmax(logits, -1)
        num = -optax.ctc_loss(logits[None], jnp.zeros((1, T)), tokens,
                              jnp.zeros((1, 3)), blank_id=blank)[0]
        den = fsa.dense_unigram_den_score(logp, jnp.int32(T), uni, blank)
        return den - num

    g = jax.grad(mmi)(logits)
    assert np.all(np.isfinite(np.asarray(g)))
    # den−num in logits space: rows sum to γ_den−γ_num ≈ 0
    assert np.allclose(np.asarray(jnp.sum(g, -1)), 0.0, atol=1e-4)


@pytest.fixture
def lfmmi_dir(tmp_path):
    d = tmp_path / 'lfmmi'
    d.mkdir()
    (d / 'tokens.txt').write_text(
        '<blk> 0\na 1\nb 2\nc 3\n<sos/eos> 9\n')
    (d / 'words.txt').write_text('<eps> 0\nab 1\nc 2\n')
    return str(d)


def _tiny_configs(lfmmi_dir):
    return {
        'input_dim': 16, 'output_dim': 10,
        'model': 'k2_model',
        'encoder': 'conformer',
        'encoder_conf': {'output_size': 32, 'attention_heads': 2,
                         'linear_units': 48, 'num_blocks': 2,
                         'cnn_module_kernel': 7, 'dropout_rate': 0.0,
                         'attention_dropout_rate': 0.0,
                         'positional_dropout_rate': 0.0},
        'decoder': 'transformer',
        'decoder_conf': {'attention_heads': 2, 'linear_units': 48,
                         'num_blocks': 1, 'dropout_rate': 0.0,
                         'self_attention_dropout_rate': 0.0,
                         'src_attention_dropout_rate': 0.0,
                         'positional_dropout_rate': 0.0},
        'model_conf': {'ctc_weight': 0.5, 'lsm_weight': 0.1,
                       'lfmmi_dir': lfmmi_dir},
    }


def test_k2_model_bundle_trains(lfmmi_dir):
    from reverb_tpu.models.registry import init_model
    bundle = init_model(_tiny_configs(lfmmi_dir))
    assert bundle.kind == 'k2_model'
    rng = np.random.RandomState(5)
    batch = {
        'feats': jnp.asarray(rng.randn(2, 40, 16), jnp.float32),
        'feats_lengths': jnp.asarray([40, 33], jnp.int32),
        'target': jnp.asarray([[1, 2, 3], [2, 1, -1]], jnp.int32),
        'target_lengths': jnp.asarray([3, 2], jnp.int32),
    }
    metrics = bundle.loss_fn(bundle.params, batch)
    loss = float(metrics['loss'])
    assert np.isfinite(loss)
    assert np.isfinite(float(metrics['loss_ctc']))   # the MMI term

    g = jax.grad(lambda p: bundle.loss_fn(p, batch)['loss'])(bundle.params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


def test_k2_model_bigram_resources(lfmmi_dir, tmp_path):
    """bigram.txt switches the denominator to the composed bigram graph."""
    import os
    with open(os.path.join(lfmmi_dir, 'bigram.txt'), 'w') as f:
        for u in range(1, 4):
            for v in range(1, 4):
                f.write(f'{u} {v} {np.log(1/3):.6f}\n')
    from reverb_tpu.models.k2_model import LfmmiResources
    res = LfmmiResources(lfmmi_dir, vocab_size=10, blank_id=0)
    assert res.bigram is not None
    assert res.sos_eos_id == 9
    assert 9 not in set(res.lm_tokens.tolist())
    assert res.word_table[1] == 'ab'
    rng = np.random.RandomState(6)
    logp = jnp.asarray(_rand_logp(rng, 7, 10))
    score = float(jax.jit(res.den_score_fn())(logp, jnp.int32(7)))
    assert np.isfinite(score) and score < 0
