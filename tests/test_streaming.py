"""Streaming encoder: chunk-by-chunk forward matches the full forward with a
chunk-causal mask (SURVEY.md §5 long-context strategy / encoder.py:231-402)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reverb_tpu.models.asr_model import ModelConfig, init_params
from reverb_tpu.models.encoder import (encoder_forward,
                                       encoder_forward_chunk,
                                       encoder_forward_chunk_by_chunk,
                                       init_stream_caches, subsampled_len)
from tests.test_model_forward import TINY


@pytest.fixture(scope='module')
def causal_model():
    conf = dict(TINY)
    conf['encoder_conf'] = dict(conf['encoder_conf'])
    conf['encoder_conf'].update({'causal': True, 'use_dynamic_chunk': False,
                                 'static_chunk_size': 4})
    cfg = ModelConfig.from_config(conf)
    params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_chunked_matches_full(causal_model):
    cfg, params = causal_model
    ecfg = cfg.encoder
    c = 4                       # decoding chunk (subsampled frames)
    n_chunks = 3
    sub = ecfg.subsampling_rate
    T = n_chunks * c * sub + 7  # enough raw frames for n_chunks windows
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(1, T, 80), dtype=jnp.float32)
    cat = jnp.array([1.0, 0.0])

    full, _ = encoder_forward(params['encoder'], feats, jnp.array([T]), ecfg,
                              cat_embs=cat, decoding_chunk_size=c,
                              num_decoding_left_chunks=-1)
    ys, _ = encoder_forward_chunk_by_chunk(params['encoder'], feats, ecfg,
                                           decoding_chunk_size=c,
                                           cat_embs=cat)
    n = min(full.shape[1], ys.shape[1])
    np.testing.assert_allclose(np.asarray(ys[0, :n]),
                               np.asarray(full[0, :n]), rtol=2e-3, atol=2e-3)


def test_stream_step_is_static_shape(causal_model):
    cfg, params = causal_model
    ecfg = cfg.encoder
    c = 4
    sub = ecfg.subsampling_rate
    window = (c - 1) * sub + 7
    att, cnn = init_stream_caches(ecfg, cache_t=8)
    step = jax.jit(lambda x, off, a, cn: encoder_forward_chunk(
        params['encoder'], x, off, ecfg, a, cn,
        cat_embs=jnp.array([1.0, 0.0])))
    rng = np.random.RandomState(1)
    x1 = jnp.asarray(rng.randn(1, window, 80), jnp.float32)
    y1, att, cnn = step(x1, jnp.asarray(0), att, cnn)
    y2, att2, cnn2 = step(x1, jnp.asarray(c), att, cnn)
    assert y1.shape == (1, c, 32)
    assert att.shape == att2.shape
    assert cnn.shape == cnn2.shape
