"""ONMT-style attention decoding (GNMT global scorer) tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reverb_tpu.decode.onmt_beam import (gnmt_coverage_penalty,
                                         gnmt_length_penalty,
                                         onmt_attention_decoding)
from reverb_tpu.models.asr_model import ModelConfig, init_params
from tests.test_model_forward import TINY


@pytest.fixture(scope='module')
def model():
    cfg = ModelConfig.from_config(TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_length_penalties():
    # penalties.py:92-105: wu = ((5+len)/6)^alpha, avg = len^alpha
    np.testing.assert_allclose(gnmt_length_penalty(7, 0.7, 'wu'),
                               ((5 + 7) / 6.0) ** 0.7, rtol=1e-6)
    np.testing.assert_allclose(gnmt_length_penalty(9, 1.0, 'avg'), 9.0)
    np.testing.assert_allclose(gnmt_length_penalty(9, 0.0, 'avg'), 1.0)
    np.testing.assert_allclose(gnmt_length_penalty(3, 1.0, 'none'), 1.0)


def test_coverage_penalties():
    cov = jnp.array([[0.5, 1.5, 1.0]])
    # wu: -sum(log(min(cov,1)))*beta  (penalties.py:64-77)
    np.testing.assert_allclose(
        gnmt_coverage_penalty(cov, 2.0, 'wu')[0],
        -2.0 * (np.log(0.5) + np.log(1.0) + np.log(1.0)), rtol=1e-5)
    # summary: (sum(max(cov,1)) - T)*beta (penalties.py:79-83)
    np.testing.assert_allclose(
        gnmt_coverage_penalty(cov, 2.0, 'summary')[0],
        2.0 * ((1.0 + 1.5 + 1.0) - 3), rtol=1e-6)
    np.testing.assert_allclose(gnmt_coverage_penalty(cov, 0.0, 'wu')[0], 0.0)


def test_onmt_decoding_runs(model):
    cfg, params = model
    rng = np.random.RandomState(0)
    B, T, D = 2, 10, 32
    enc = rng.randn(B, T, D).astype(np.float32)
    res = onmt_attention_decoding(params, cfg, enc, np.array([T, 7]),
                                  beam_size=3, max_steps=6)
    assert len(res) == B
    for r in res:
        assert all(0 <= t < cfg.vocab_size for t in r.tokens)
        assert np.isfinite(r.score)


def test_onmt_decoding_with_coverage(model):
    cfg, params = model
    rng = np.random.RandomState(1)
    enc = rng.randn(1, 8, 32).astype(np.float32)
    res = onmt_attention_decoding(params, cfg, enc, np.array([8]),
                                  beam_size=2, max_steps=5,
                                  beta=0.5, coverage_penalty='wu')
    assert len(res) == 1 and np.isfinite(res[0].score)


def test_onmt_mode_via_decode_api(model):
    cfg, params = model
    from reverb_tpu.decode.api import decode
    rng = np.random.RandomState(2)
    feats = rng.randn(1, 67, 80).astype(np.float32)
    out = decode(params, cfg, ['onmt_attention_decoding'], feats,
                 np.array([67]), beam_size=2, cat_embs=[1.0, 0.0])
    assert 'onmt_attention_decoding' in out
    assert len(out['onmt_attention_decoding']) == 1
