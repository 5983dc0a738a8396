"""ESPnet-style transducer search variants vs a brute-force oracle.

On a tiny blank-dominant lattice (the realistic regime), every variant must
find the MAP label sequence, and — except NSC, whose prefix-alpha
recombination over-counts slightly by design (beam_search_transducer.py:
165-199) — the reported score must equal the true total log P(y|x) from the
exact RNN-T forward (all alignments of a short sequence fit in the beam)."""

import itertools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reverb_tpu.decode.transducer_search import beam_search_transducer
from reverb_tpu.models.transducer import (TransducerConfig, init_transducer,
                                          joint_forward, predictor_forward,
                                          rnnt_loss)

V, D, T = 4, 8, 3


@pytest.fixture(scope='module')
def tiny():
    cfg = TransducerConfig(vocab_size=V, encoder_output_size=D,
                           predictor='embedding', predictor_embed_size=D,
                           predictor_kernel=2, join_dim=8)
    params = init_transducer(jax.random.PRNGKey(3), cfg)
    # blank-dominant joint (realistic ASR regime; keeps the Graves loop tame)
    params['joint']['ffn_out']['weight'] = \
        params['joint']['ffn_out']['weight'] * 3.0
    params['joint']['ffn_out']['bias'] = \
        params['joint']['ffn_out']['bias'].at[0].add(2.0)
    enc = np.random.RandomState(0).randn(1, T, D).astype(np.float32) * 1.5
    log_p = _brute_force(cfg, params, enc)
    best_y = max(log_p, key=lambda y: log_p[y] / max(len(y), 1))
    return cfg, params, enc, log_p, best_y


def _brute_force(cfg, params, enc):
    """Exact log P(y|x) for every label sequence with len <= T (one batched
    rnnt_loss call)."""
    seqs = []
    for U in range(0, T + 1):
        seqs.extend(itertools.product(range(1, V), repeat=U))
    N = len(seqs)
    labels = np.zeros((N, T), np.int32)
    lens = np.zeros((N,), np.int32)
    for i, y in enumerate(seqs):
        labels[i, :len(y)] = y
        lens[i] = len(y)
    labels = jnp.asarray(labels)
    ys_in = jnp.concatenate([jnp.zeros((N, 1), jnp.int32), labels], axis=1)
    pred = predictor_forward(params['predictor'], ys_in, cfg)
    encN = jnp.broadcast_to(jnp.asarray(enc), (N, T, enc.shape[-1]))
    logits = joint_forward(params['joint'], encN[:, :, None, :],
                           pred[:, None, :, :], cfg)
    nll = np.asarray(rnnt_loss(logits, jnp.full((N,), T), labels,
                               jnp.asarray(lens)))
    return {seqs[i]: float(-nll[i]) for i in range(N)}


@pytest.mark.parametrize('search_type,kwargs,exact_score', [
    ('default', {}, True),
    ('tsd', {'max_sym_exp': 3}, True),
    ('alsd', {'u_max_ratio': 1.0}, True),
    ('nsc', {'nstep': 3}, False),          # prefix-alpha over-counts
    ('maes', {'nstep': 3, 'expansion_gamma': 10.0}, True),
])
def test_variant_finds_map_sequence(tiny, search_type, kwargs, exact_score):
    cfg, params, enc, log_p, best_y = tiny
    res = beam_search_transducer(params, cfg, enc, np.array([T]),
                                 search_type=search_type, beam_size=6,
                                 **kwargs)
    got = tuple(res[0][0].tokens)
    assert got == best_y, f'{search_type}: got {got}, want {best_y}'
    if exact_score:
        # generous beam on a tiny lattice captures every alignment
        assert abs(res[0][0].score - log_p[got]) < 5e-3, \
            (res[0][0].score, log_p[got])


@pytest.mark.slow
def test_default_terminates_on_pathological_joint(tiny):
    """The expansion cap must bound the Graves loop even when labels beat
    blank everywhere."""
    cfg, params, enc, *_ = tiny
    bad = jax.tree.map(lambda x: x, params)
    bad['joint']['ffn_out']['bias'] = \
        params['joint']['ffn_out']['bias'].at[0].add(-12.0)
    res = beam_search_transducer(bad, cfg, enc, np.array([T]),
                                 search_type='default', beam_size=2)
    assert np.isfinite(res[0][0].score)


def test_nbest_and_batch(tiny):
    cfg, params, enc, *_ = tiny
    enc2 = np.concatenate([enc, enc], axis=0)
    res = beam_search_transducer(params, cfg, enc2, np.array([T, 2]),
                                 search_type='alsd', beam_size=4, nbest=3,
                                 u_max_ratio=1.0)
    assert len(res) == 2 and 1 <= len(res[0]) <= 3
    s = [r.score / max(len(r.tokens), 1) for r in res[0]]
    assert s == sorted(s, reverse=True)


def test_unknown_search_type_raises(tiny):
    cfg, params, enc, *_ = tiny
    with pytest.raises(ValueError):
        beam_search_transducer(params, cfg, enc, np.array([T]),
                               search_type='bogus')


# ---------------- device TSD (lax.scan) vs host TSD ----------------

def _hyp_dict(hyps):
    return {tuple(y): s for y, s in hyps}


@pytest.mark.parametrize('predictor', ['embedding', 'rnn', 'conv'])
def test_tsd_device_matches_host(predictor):
    """The single-program lax.scan TSD must reproduce the host algorithm's
    hypothesis set (prefixes AND scores) on every predictor family, over a
    batch with uneven lengths."""
    from reverb_tpu.decode.transducer_device import tsd_device_host
    from reverb_tpu.decode.transducer_search import time_sync_decoding
    rng = np.random.RandomState(predictor == 'rnn')
    Tl, Dv, Vv = 12, 8, 6
    cfg = TransducerConfig(vocab_size=Vv, encoder_output_size=Dv,
                           predictor=predictor, predictor_embed_size=Dv,
                           predictor_hidden_size=8, predictor_layers=1,
                           predictor_kernel=2, join_dim=8)
    params = init_transducer(jax.random.PRNGKey(11), cfg)
    # blank-leaning joint: the regime real models live in
    params['joint']['ffn_out']['bias'] = \
        params['joint']['ffn_out']['bias'].at[cfg.blank_id].add(1.5)
    enc = rng.randn(2, Tl, Dv).astype(np.float32) * 1.2
    lens = np.array([Tl, Tl - 5], np.int32)
    dev = tsd_device_host(params, cfg, enc, lens, beam_size=4, max_sym_exp=3)
    for b in range(2):
        host = time_sync_decoding(params, cfg, enc[b, :lens[b]],
                                  beam_size=4, max_sym_exp=3)
        hd = _hyp_dict(dev[b])
        hh = {h.ys: h.score for h in host}
        assert set(hd) == set(hh), (predictor, b, hd, hh)
        for y, s in hh.items():
            assert abs(hd[y] - s) < 2e-3, (predictor, b, y, hd[y], s)
        # best-first order agrees on the winner (score/len normalized)
        assert dev[b][0][0] == host[0].ys
