"""Transducer: exact loss vs brute-force DP oracle, greedy/beam search."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reverb_tpu.models.transducer import (TransducerConfig, init_transducer,
                                          joint_forward, predictor_forward,
                                          predictor_init_state,
                                          predictor_step, rnnt_loss,
                                          transducer_beam_search,
                                          transducer_greedy_search,
                                          transducer_loss)


def rnnt_nll_bruteforce(logp, labels, T, U, blank=0):
    """Reference DP in float64 (standard Graves 2012 recursion)."""
    alpha = np.full((T, U + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(T):
        for u in range(U + 1):
            terms = []
            if t == 0 and u == 0:
                continue
            if t > 0:
                terms.append(alpha[t - 1, u] + logp[t - 1, u, blank])
            if u > 0:
                terms.append(alpha[t, u - 1] + logp[t, u - 1,
                                                    labels[u - 1]])
            alpha[t, u] = np.logaddexp.reduce(terms) if terms else -np.inf
    return -(alpha[T - 1, U] + logp[T - 1, U, blank])


@pytest.mark.parametrize('seed', [0, 1])
def test_rnnt_loss_matches_bruteforce(seed):
    rng = np.random.RandomState(seed)
    B, T, U, V = 2, 6, 3, 8
    logits = rng.randn(B, T, U + 1, V).astype(np.float32)
    labels = rng.randint(1, V, (B, U))
    t_lens = np.array([T, T - 2])
    u_lens = np.array([U, U - 1])
    got = np.asarray(rnnt_loss(jnp.asarray(logits), jnp.asarray(t_lens),
                               jnp.asarray(labels), jnp.asarray(u_lens)))
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    for b in range(B):
        expect = rnnt_nll_bruteforce(logp[b], labels[b], t_lens[b], u_lens[b])
        np.testing.assert_allclose(got[b], expect, rtol=1e-4)


CFG = TransducerConfig(vocab_size=20, encoder_output_size=16,
                       predictor_embed_size=16, predictor_hidden_size=16,
                       predictor_layers=1, join_dim=32)


@pytest.fixture(scope='module')
def model():
    return init_transducer(jax.random.PRNGKey(0), CFG)


def test_transducer_loss_finite_and_trains(model):
    rng = np.random.RandomState(0)
    enc = jnp.asarray(rng.randn(2, 10, 16), jnp.float32)
    enc_lens = jnp.array([10, 8])
    labels = jnp.asarray(rng.randint(1, 20, (2, 4)), jnp.int32)
    lab_lens = jnp.array([4, 3])

    def loss(p):
        return transducer_loss(p, enc, enc_lens, labels, lab_lens, CFG)

    l0 = float(loss(model))
    assert np.isfinite(l0) and l0 > 0
    grads = jax.grad(loss)(model)
    gmax = max(jax.tree.leaves(jax.tree.map(
        lambda g: float(jnp.abs(g).max()), grads)))
    assert np.isfinite(gmax) and gmax > 0


def test_predictor_step_matches_forward(model):
    for kind in ('rnn', 'embedding', 'conv'):
        cfg = TransducerConfig(vocab_size=20, encoder_output_size=16,
                               predictor_embed_size=16,
                               predictor_hidden_size=16, predictor_layers=1,
                               predictor=kind)
        params = init_transducer(jax.random.PRNGKey(1), cfg)
        ys = jnp.asarray([[0, 3, 7, 2]], jnp.int32)
        full = predictor_forward(params['predictor'], ys, cfg)
        state = predictor_init_state(cfg, 1)
        outs = []
        for i in range(4):
            out, state = predictor_step(params['predictor'], ys[:, i], state,
                                        cfg)
            outs.append(out)
        step_out = jnp.stack(outs, axis=1)
        np.testing.assert_allclose(np.asarray(step_out), np.asarray(full),
                                   rtol=1e-4, atol=1e-5, err_msg=kind)


def test_greedy_and_beam_search(model):
    rng = np.random.RandomState(2)
    enc = jnp.asarray(rng.randn(2, 8, 16), jnp.float32)
    enc_lens = np.array([8, 6])
    res = transducer_greedy_search(model, enc, enc_lens, CFG)
    assert len(res) == 2
    assert all(t != 0 for t in res[0].tokens)
    res2 = transducer_beam_search(model, enc, enc_lens, CFG, beam_size=3)
    assert len(res2) == 2
    assert np.isfinite(res2[0].score)


def test_reverse_sequence_3d():
    from reverb_tpu.utils.common import reverse_sequence
    x = np.arange(2 * 4 * 3, dtype=np.float32).reshape(2, 4, 3)
    lens = np.array([4, 2])
    out = np.asarray(reverse_sequence(jnp.asarray(x), jnp.asarray(lens), 0.0))
    np.testing.assert_allclose(out[0], x[0, ::-1])
    np.testing.assert_allclose(out[1, :2], x[1, 1::-1])
    np.testing.assert_allclose(out[1, 2:], 0.0)


def test_bitransducer_bundle_loss_and_grads():
    """BiTransducer: 0.7 L2R + 0.3 R2L over reversed features/labels
    (transducer_espnet/bitransducer.py:12-110)."""
    from reverb_tpu.models.registry import init_model
    conf = {
        'input_dim': 80, 'output_dim': 30,
        'model': 'bitransducer',
        'encoder': 'conformer',
        'encoder_conf': {'output_size': 16, 'attention_heads': 2,
                         'linear_units': 32, 'num_blocks': 2,
                         'input_layer': 'conv2d',
                         'pos_enc_layer_type': 'rel_pos',
                         'selfattention_layer_type': 'rel_selfattn',
                         'macaron_style': True, 'use_cnn_module': True,
                         'cnn_module_kernel': 7},
        'decoder': 'transformer',
        'decoder_conf': {'attention_heads': 2, 'linear_units': 32,
                         'num_blocks': 1},
        'model_conf': {'ctc_weight': 0.2, 'transducer_weight': 0.8},
        'predictor': 'rnn',
        'predictor_conf': {'predictor_embed_size': 16,
                           'predictor_hidden_size': 16,
                           'predictor_layers': 1, 'join_dim': 16},
    }
    bundle = init_model(conf, jax.random.PRNGKey(0))
    assert bundle.kind == 'bitransducer'
    assert 'predictor_r' in bundle.params and 'joint_r' in bundle.params
    B, T = 2, 23
    batch = {'feats': jnp.asarray(
                 np.random.RandomState(0).randn(B, T, 80).astype(np.float32)),
             'feats_lengths': jnp.array([T, T - 7]),
             'target': jnp.array([[1, 2, 3], [4, 5, -1]]),
             'target_lengths': jnp.array([3, 2])}
    out = bundle.loss_fn(bundle.params, batch)
    assert np.isfinite(float(out['loss']))
    g = jax.grad(lambda p: bundle.loss_fn(p, batch)['loss'])(bundle.params)
    gnorm_r = sum(float(jnp.sum(jnp.abs(x)))
                  for x in jax.tree.leaves(g['predictor_r']))
    assert gnorm_r > 0.0   # reverse branch participates in the loss
