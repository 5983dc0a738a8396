"""LoRA injection/merge + teacher-student distillation tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reverb_tpu.models.asr_model import (ModelConfig, forward_encoder,
                                         init_params)
from reverb_tpu.train.lora import (inject_lora, lora_trainable_mask,
                                   merge_lora)
from reverb_tpu.train.teacher_student import TSConfig, decay_ts_weight, ts_loss
from tests.test_model_forward import TINY


@pytest.fixture(scope='module')
def model():
    cfg = ModelConfig.from_config(TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _feats(seed=0, B=1, T=43):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(B, T, 80), jnp.float32),
            jnp.array([T] * B))


def test_lora_inject_zero_init_is_identity(model):
    cfg, params = model
    feats, lens = _feats()
    cat = jnp.array([1.0, 0.0])
    base, _ = forward_encoder(params, cfg, feats, lens, cat_embs=cat)
    lp = inject_lora(params, jax.random.PRNGKey(1), rank=4, alpha=8)
    assert 'lora_A' in lp['encoder']['encoders'][0]['self_attn']['linear_q']
    out, _ = forward_encoder(lp, cfg, feats, lens, cat_embs=cat)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-5)


def test_lora_merge_matches_adapter(model):
    cfg, params = model
    lp = inject_lora(params, jax.random.PRNGKey(1), rank=4, alpha=8)
    # make B nonzero so the adapter actually does something
    def bump(node):
        if isinstance(node, dict):
            if 'lora_B' in node:
                node = dict(node)
                node['lora_B'] = jnp.ones_like(node['lora_B']) * 0.01
                return node
            return {k: bump(v) for k, v in node.items()}
        if isinstance(node, list):
            return [bump(v) for v in node]
        return node
    lp = bump(lp)
    feats, lens = _feats(1)
    cat = jnp.array([1.0, 0.0])
    with_adapter, _ = forward_encoder(lp, cfg, feats, lens, cat_embs=cat)
    merged = merge_lora(lp)
    assert 'lora_A' not in merged['encoder']['encoders'][0]['self_attn'][
        'linear_q']
    merged_out, _ = forward_encoder(merged, cfg, feats, lens, cat_embs=cat)
    np.testing.assert_allclose(np.asarray(merged_out),
                               np.asarray(with_adapter), atol=1e-4)
    mask = lora_trainable_mask(lp)
    leaves = jax.tree.leaves(mask)
    assert any(leaves) and not all(leaves)


def test_ts_loss(model):
    cfg, params = model
    teacher = init_params(jax.random.PRNGKey(9), cfg)
    rng = np.random.RandomState(2)
    batch = {
        'feats': jnp.asarray(rng.randn(2, 43, 80), jnp.float32),
        'feats_lengths': jnp.array([43, 43]),
        'target': jnp.array([[3, 4, 5, -1], [6, 7, -1, -1]]),
        'target_lengths': jnp.array([3, 2]),
        'cat_embs': jnp.array([[1.0, 0.0], [1.0, 0.0]]),
    }
    ts = TSConfig(ts_weight=0.5, top_k_entries=4)
    out = ts_loss(params, teacher, cfg, cfg, batch, ts)
    for k in ('loss', 'kl_enc_loss', 'kl_dec_loss', 'student_loss'):
        assert np.isfinite(float(out[k])), k
    assert float(out['kl_enc_loss']) > 0
    # distilling against an identical teacher → zero KL
    out_same = ts_loss(params, params, cfg, cfg, batch, ts)
    assert abs(float(out_same['kl_enc_loss'])) < 1e-4
    # decay schedule
    w = decay_ts_weight(0.5, TSConfig(min_ts_weight=0.1,
                                      decrease_factor=0.5))
    assert abs(w - 0.3) < 1e-9
