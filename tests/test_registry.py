"""init_model registry: every family builds from YAML-shape configs and its
loss_fn returns finite, differentiable losses."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reverb_tpu.models.registry import init_model

BASE_ENC = {'output_size': 32, 'attention_heads': 2, 'linear_units': 48,
            'num_blocks': 2, 'dropout_rate': 0.0}
BASE_DEC = {'attention_heads': 2, 'linear_units': 48, 'num_blocks': 1,
            'r_num_blocks': 0}


def _batch(B=2, T=40, U=4, V=50):
    rng = np.random.RandomState(0)
    return {
        'feats': jnp.asarray(rng.randn(B, T, 80), jnp.float32),
        'feats_lengths': jnp.array([T, T - 10]),
        'target': jnp.asarray(rng.randint(1, V - 2, (B, U)), jnp.int32),
        'target_lengths': jnp.array([U, U - 1]),
    }


def _check(bundle, batch=None):
    batch = batch or _batch()
    out = bundle.loss_fn(bundle.params, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(out['loss'])), out
    g = jax.grad(lambda p: bundle.loss_fn(p, batch,
                                          jax.random.PRNGKey(0))['loss'])(
        bundle.params)
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    return out


def test_asr_model_default():
    conf = {'input_dim': 80, 'output_dim': 50, 'encoder': 'conformer',
            'encoder_conf': BASE_ENC, 'decoder': 'bitransformer',
            'decoder_conf': dict(BASE_DEC, r_num_blocks=1),
            'model_conf': {'ctc_weight': 0.3}}
    b = init_model(conf, jax.random.PRNGKey(0))
    assert b.kind == 'asr_model'
    _check(b)


@pytest.mark.parametrize('enc', ['branchformer', 'e_branchformer',
                                 'squeezeformer', 'efficient_conformer'])
def test_alt_encoders(enc):
    enc_conf = {'output_size': 32, 'num_blocks': 2, 'dropout_rate': 0.0}
    if 'branchformer' in enc:
        enc_conf.update(cgmlp_linear_units=48, cgmlp_conv_kernel=7,
                        attention_heads=2, ffn_units=48)
    else:
        enc_conf.update(attention_heads=2, linear_units=48,
                        cnn_module_kernel=7)
    if enc == 'efficient_conformer':
        enc_conf.update(stride_layer_idx=[1], stride=[2], group_size=2)
    conf = {'input_dim': 80, 'output_dim': 50, 'encoder': enc,
            'encoder_conf': enc_conf, 'decoder': 'transformer',
            'decoder_conf': BASE_DEC, 'model_conf': {'ctc_weight': 0.3}}
    b = init_model(conf, jax.random.PRNGKey(0))
    assert b.kind == enc
    _check(b)


def test_transducer_family():
    conf = {'input_dim': 80, 'output_dim': 50, 'encoder': 'conformer',
            'encoder_conf': BASE_ENC, 'decoder': 'transformer',
            'decoder_conf': BASE_DEC, 'model': 'transducer',
            'predictor': 'embedding',
            'predictor_conf': {'predictor_embed_size': 32,
                               'predictor_kernel': 2},
            'joint_conf': {'join_dim': 32},
            'model_conf': {'transducer_weight': 0.7, 'ctc_weight': 0.3}}
    b = init_model(conf, jax.random.PRNGKey(0))
    out = _check(b, _batch(T=24, U=3))
    assert np.isfinite(float(out['loss_rnnt']))


def test_paraformer_family():
    conf = {'input_dim': 80, 'output_dim': 50, 'encoder': 'conformer',
            'encoder_conf': BASE_ENC, 'decoder': 'transformer',
            'decoder_conf': BASE_DEC, 'model': 'paraformer'}
    b = init_model(conf, jax.random.PRNGKey(0))
    _check(b)


def test_bestrq_family():
    conf = {'input_dim': 80, 'output_dim': 50, 'encoder': 'conformer',
            'encoder_conf': BASE_ENC, 'decoder': 'transformer',
            'decoder_conf': BASE_DEC, 'model': 'bestrq',
            'bestrq_conf': {'codebook_size': 64, 'codebook_dim': 8,
                            'mask_prob': 0.1}}
    b = init_model(conf, jax.random.PRNGKey(0))
    out = b.loss_fn(b.params, _batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(out['loss']))


def test_whisper_family():
    conf = {'model': 'whisper',
            'whisper_conf': {'n_mels': 80, 'n_audio_state': 32,
                             'n_audio_head': 2, 'n_audio_layer': 1,
                             'n_text_state': 32, 'n_text_head': 2,
                             'n_text_layer': 1, 'n_vocab': 60,
                             'n_audio_ctx': 100, 'n_text_ctx': 20}}
    b = init_model(conf, jax.random.PRNGKey(0))
    batch = _batch(T=100, U=4, V=60)
    out = b.loss_fn(b.params, batch, None)
    assert np.isfinite(float(out['loss']))


def test_ctl_family():
    conf = {'input_dim': 80, 'output_dim': 50, 'encoder': 'conformer',
            'encoder_conf': dict(BASE_ENC, use_dynamic_chunk=True),
            'decoder': 'bitransformer',
            'decoder_conf': dict(BASE_DEC, r_num_blocks=1),
            'model': 'ctl_model', 'model_conf': {'ctc_weight': 0.3}}
    b = init_model(conf, jax.random.PRNGKey(0))
    out = b.loss_fn(b.params, _batch(), jax.random.PRNGKey(0))
    assert np.isfinite(float(out['loss']))


def test_unknown_model_raises():
    with pytest.raises(ValueError):
        init_model({'model': 'bogus'}, jax.random.PRNGKey(0))


def test_wav2vec2_family():
    conf = {'input_dim': 80, 'output_dim': 50, 'encoder': 'conformer',
            'encoder_conf': BASE_ENC, 'decoder': 'transformer',
            'decoder_conf': BASE_DEC, 'model': 'wav2vec2',
            'wav2vec2_conf': {'num_embeddings': 16, 'num_codebooks': 2,
                              'mask_prob': 0.2, 'num_negatives': 10}}
    b = init_model(conf, jax.random.PRNGKey(0))
    batch = _batch()
    out = b.loss_fn(b.params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(out['loss']))
    assert float(out['num_masked']) > 0
    assert float(out['code_ppl']) > 0
    # quantizer must receive gradient (trainable VQ, unlike bestrq); so must
    # the trained mask embedding
    g = jax.grad(lambda p: b.loss_fn(p, batch,
                                     jax.random.PRNGKey(1))['loss'])(b.params)
    assert float(jnp.abs(g['vq_codebook']).sum()) > 0
    assert float(jnp.abs(g['mask_emb']).sum()) > 0


def test_w2vbert_family():
    conf = {'input_dim': 80, 'output_dim': 50, 'encoder': 'conformer',
            'encoder_conf': BASE_ENC, 'decoder': 'transformer',
            'decoder_conf': BASE_DEC, 'model': 'w2vbert',
            'wav2vec2_conf': {'num_embeddings': 16, 'num_codebooks': 1,
                              'mask_prob': 0.2, 'num_negatives': 10},
            'w2vbert_conf': {'contrastive_blocks': 1, 'masked_blocks': 1,
                             'warmup_steps': 10}}
    b = init_model(conf, jax.random.PRNGKey(0))
    batch = dict(_batch(), steps=5)
    out = b.loss_fn(b.params, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(out['loss']))
    assert 'loss_mlm' in out and 'loss_contrastive' in out
    assert float(out['codes_acc']) >= 0
    # mlm head gets gradient through the masked branch
    g = jax.grad(lambda p: b.loss_fn(p, batch,
                                     jax.random.PRNGKey(2))['loss'])(b.params)
    assert float(jnp.abs(g['top_n_out']).sum()) > 0
