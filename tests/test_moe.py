"""MoE FFN tests (positionwise_feed_forward.py:58-121 semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from reverb_tpu.models.asr_model import (ModelConfig, _init_moe_ffn,
                                         init_params)
from reverb_tpu.models.encoder import EncoderConfig, moe_feed_forward
from tests.test_model_forward import TINY


def _np_moe_oracle(p, x, k):
    """Reference semantics: top-k router, softmax over selected, only the
    selected experts contribute."""
    B, L, D = x.shape
    xs = x.reshape(-1, D)
    gate_w = np.asarray(p['gate']['weight'])
    router = xs @ gate_w.T
    out = np.zeros_like(xs)
    for n in range(xs.shape[0]):
        idx = np.argsort(router[n])[::-1][:k]
        logits = router[n][idx]
        w = np.exp(logits - logits.max())
        w = w / w.sum()
        for j, e in enumerate(idx):
            ep = p['experts'][e]
            h = xs[n] @ np.asarray(ep['w_1']['weight']).T + \
                np.asarray(ep['w_1']['bias'])
            h = h * (1.0 / (1.0 + np.exp(-h)))                  # swish
            h = h @ np.asarray(ep['w_2']['weight']).T + \
                np.asarray(ep['w_2']['bias'])
            out[n] += w[j] * h
    return out.reshape(B, L, D)


def test_moe_matches_topk_oracle():
    D, H, E, K = 16, 32, 4, 2
    cfg = EncoderConfig(output_size=D, linear_units=H, n_expert=E,
                        n_expert_per_token=K, dropout_rate=0.0,
                        positionwise_layer_type='moe')
    p = _init_moe_ffn(jax.random.PRNGKey(0), D, H, E)
    x = np.random.RandomState(0).randn(2, 5, D).astype(np.float32)
    got = np.asarray(moe_feed_forward(p, jnp.asarray(x), cfg))
    want = _np_moe_oracle(p, x, K)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_moe_encoder_forward_and_grads():
    conf = {k: (dict(v) if isinstance(v, dict) else v) for k, v in TINY.items()}
    conf['encoder_conf'] = dict(conf['encoder_conf'])
    conf['encoder_conf'].update(positionwise_layer_type='moe', n_expert=3,
                                n_expert_per_token=2)
    cfg = ModelConfig.from_config(conf)
    params = init_params(jax.random.PRNGKey(0), cfg)
    # every conformer FFN should now carry gate+experts
    lp = params['encoder']['encoders'][0]
    assert 'experts' in lp['feed_forward'] and 'gate' in lp['feed_forward']
    from reverb_tpu.models.asr_model import forward_encoder
    feats = jnp.asarray(np.random.RandomState(1).randn(2, 35, 80), jnp.float32)
    lens = jnp.array([35, 20])
    cat = jnp.array([1.0, 0.0])

    def loss(params):
        out, mask = forward_encoder(params, cfg, feats, lens, cat_embs=cat)
        return jnp.sum(jnp.where(mask[:, 0, :, None], out, 0.0) ** 2)

    g = jax.grad(loss)(params)
    gleaf = g['encoder']['encoders'][0]['feed_forward']['gate']['weight']
    assert np.isfinite(np.asarray(gleaf)).all()
    assert float(jnp.abs(gleaf).sum()) > 0.0
