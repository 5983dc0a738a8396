"""Alternative model families: branchformer, squeezeformer, paraformer (CIF),
BestRQ, whisper."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reverb_tpu.models.encoders_alt import (BranchformerConfig,
                                            SqueezeformerConfig,
                                            branchformer_forward,
                                            grouped_rel_pos_mha,
                                            init_branchformer,
                                            init_squeezeformer,
                                            squeezeformer_forward)
from reverb_tpu.models.paraformer import (CifConfig, ParaformerConfig,
                                          cif_alphas, cif_fire,
                                          init_paraformer_head,
                                          paraformer_greedy_decode,
                                          paraformer_loss)
from reverb_tpu.models.ssl import (BestRQConfig, bestrq_loss, bestrq_targets,
                                   init_bestrq)
from reverb_tpu.models.whisper import (WhisperConfig, init_whisper,
                                       whisper_decode, whisper_encode)

RNG = np.random.RandomState(0)


def test_branchformer_forward():
    cfg = BranchformerConfig(output_size=32, attention_heads=2, num_blocks=2,
                             cgmlp_linear_units=64, cgmlp_conv_kernel=7)
    params = init_branchformer(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(RNG.randn(2, 43, 80), jnp.float32)
    out, masks = branchformer_forward(params, x, jnp.array([43, 30]), cfg)
    assert out.shape == (2, 10, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_e_branchformer_forward():
    cfg = BranchformerConfig(output_size=32, attention_heads=2, num_blocks=2,
                             cgmlp_linear_units=64, cgmlp_conv_kernel=7,
                             e_branchformer=True, ffn_units=64)
    params = init_branchformer(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(RNG.randn(1, 43, 80), jnp.float32)
    out, _ = branchformer_forward(params, x, jnp.array([43]), cfg)
    assert out.shape == (1, 10, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_squeezeformer_forward():
    cfg = SqueezeformerConfig(output_size=32, attention_heads=2,
                              linear_units=64, num_blocks=4, reduce_idx=1,
                              recover_idx=3, cnn_module_kernel=7)
    params = init_squeezeformer(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(RNG.randn(2, 43, 80), jnp.float32)
    out, masks = squeezeformer_forward(params, x, jnp.array([43, 43]), cfg)
    assert out.shape == (2, 10, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_grouped_attention():
    from reverb_tpu.models.asr_model import _init_mha
    from reverb_tpu.models.modules import xavier_uniform
    p = _init_mha(jax.random.PRNGKey(0), 32, True, True, 2)
    # grouped attention uses (h, d_k*g) pos biases (attention.py:38-46)
    p['pos_bias_u'] = xavier_uniform(jax.random.PRNGKey(1), (2, 16 * 3))
    p['pos_bias_v'] = xavier_uniform(jax.random.PRNGKey(2), (2, 16 * 3))
    x = jnp.asarray(RNG.randn(1, 12, 32), jnp.float32)
    pos = jnp.asarray(RNG.randn(1, 12, 32), jnp.float32)
    mask = jnp.ones((1, 12, 12), bool)
    out = grouped_rel_pos_mha(p, x, mask, pos, 2, group_size=3)
    assert out.shape == (1, 12, 32)
    # T not divisible by the group: pad + trim path
    x2 = jnp.asarray(RNG.randn(1, 11, 32), jnp.float32)
    out2 = grouped_rel_pos_mha(p, x2, jnp.ones((1, 11, 11), bool),
                               pos[:, :11], 2, group_size=3)
    assert out2.shape == (1, 11, 32)


def test_cif_fire_counts():
    # α = 0.5 per frame → one token every 2 frames
    enc = jnp.asarray(RNG.randn(1, 8, 4), jnp.float32)
    alphas = jnp.full((1, 8), 0.5)
    fired, n = cif_fire(enc, alphas, max_tokens=6)
    assert int(n[0]) == 4
    # fired embedding 0 = 0.5*h0 + 0.5*h1
    np.testing.assert_allclose(np.asarray(fired[0, 0]),
                               np.asarray(0.5 * enc[0, 0] + 0.5 * enc[0, 1]),
                               rtol=1e-5)


def test_paraformer_loss_and_decode():
    cfg = ParaformerConfig(vocab_size=30, encoder_output_size=16,
                           cif=CifConfig(idim=16))
    params = init_paraformer_head(jax.random.PRNGKey(0), cfg)
    enc = jnp.asarray(RNG.randn(2, 12, 16), jnp.float32)
    mask = jnp.ones((2, 1, 12), bool)
    labels = jnp.asarray([[3, 4, 5, -1], [6, 7, -1, -1]], jnp.int32)
    lens = jnp.array([3, 2])
    out = paraformer_loss(params, enc, mask, labels, lens, cfg)
    assert np.isfinite(float(out['loss']))
    g = jax.grad(lambda p: paraformer_loss(p, enc, mask, labels, lens,
                                           cfg)['loss'])(params)
    assert max(jax.tree.leaves(jax.tree.map(
        lambda v: float(jnp.abs(v).max()), g))) > 0
    toks, n = paraformer_greedy_decode(params, enc, mask, cfg, max_tokens=8)
    assert toks.shape == (2, 8)


def test_bestrq():
    cfg = BestRQConfig(input_dim=20, encoder_output_size=16,
                       codebook_size=32, codebook_dim=8, stack_frames=2,
                       stride=2, mask_prob=0.2, mask_length=4)
    params = init_bestrq(jax.random.PRNGKey(0), cfg)
    feats = jnp.asarray(RNG.randn(2, 24, 20), jnp.float32)
    tgt = bestrq_targets(params, feats, cfg)
    assert tgt.shape == (2, 12, 1)
    assert int(tgt.max()) < 32

    proj = {'w': jax.random.normal(jax.random.PRNGKey(1), (20, 16)) * 0.1}

    def encoder_apply(x, lens):
        out = x @ proj['w']
        return out[:, ::cfg.stack_frames], jnp.ones(
            (x.shape[0], 1, out.shape[1] // cfg.stack_frames + 1), bool)[
            :, :, :out[:, ::cfg.stack_frames].shape[1]]

    out = bestrq_loss(params, encoder_apply, feats, jnp.array([24, 24]),
                      jax.random.PRNGKey(2), cfg)
    assert np.isfinite(float(out['loss']))
    # frozen quantizer: targets don't depend on trainable head
    assert 'head' in params


def test_whisper_tiny_random():
    cfg = WhisperConfig(n_mels=20, n_audio_state=32, n_audio_head=2,
                        n_audio_layer=2, n_vocab=100, n_text_ctx=16,
                        n_text_state=32, n_text_head=2, n_text_layer=2)
    params = init_whisper(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(RNG.randn(1, 24, 20), jnp.float32)
    feats = whisper_encode(params['encoder'], mel, cfg)
    assert feats.shape == (1, 12, 32)
    toks = jnp.asarray([[5, 6, 7]], jnp.int32)
    logits = whisper_decode(params['decoder'], toks, feats, cfg)
    assert logits.shape == (1, 3, 100)
    assert np.isfinite(np.asarray(logits)).all()


def test_whisper_hf_converter_mapping():
    """Converter key mapping works on a synthetic HF-style state dict."""
    import torch
    from reverb_tpu.models.whisper import convert_hf_whisper
    d = 8
    state = {}

    def add_lin(prefix, bias=True):
        state[f'{prefix}.weight'] = torch.randn(d, d)
        if bias:
            state[f'{prefix}.bias'] = torch.randn(d)

    state['model.encoder.conv1.weight'] = torch.randn(d, 4, 3)
    state['model.encoder.conv1.bias'] = torch.randn(d)
    state['model.encoder.conv2.weight'] = torch.randn(d, d, 3)
    state['model.encoder.conv2.bias'] = torch.randn(d)
    state['model.encoder.embed_positions.weight'] = torch.randn(10, d)
    for i in range(2):
        for name in ('q_proj', 'v_proj', 'out_proj'):
            add_lin(f'model.encoder.layers.{i}.self_attn.{name}')
        add_lin(f'model.encoder.layers.{i}.self_attn.k_proj', bias=False)
        add_lin(f'model.encoder.layers.{i}.fc1')
        add_lin(f'model.encoder.layers.{i}.fc2')
        for name in ('self_attn_layer_norm', 'final_layer_norm'):
            state[f'model.encoder.layers.{i}.{name}.weight'] = torch.ones(d)
            state[f'model.encoder.layers.{i}.{name}.bias'] = torch.zeros(d)
    state['model.encoder.layer_norm.weight'] = torch.ones(d)
    state['model.encoder.layer_norm.bias'] = torch.zeros(d)
    state['model.decoder.embed_tokens.weight'] = torch.randn(50, d)
    state['model.decoder.embed_positions.weight'] = torch.randn(10, d)
    for i in range(1):
        for attn in ('self_attn', 'encoder_attn'):
            for name in ('q_proj', 'v_proj', 'out_proj'):
                add_lin(f'model.decoder.layers.{i}.{attn}.{name}')
            add_lin(f'model.decoder.layers.{i}.{attn}.k_proj', bias=False)
        add_lin(f'model.decoder.layers.{i}.fc1')
        add_lin(f'model.decoder.layers.{i}.fc2')
        for name in ('self_attn_layer_norm', 'encoder_attn_layer_norm',
                     'final_layer_norm'):
            state[f'model.decoder.layers.{i}.{name}.weight'] = torch.ones(d)
            state[f'model.decoder.layers.{i}.{name}.bias'] = torch.zeros(d)
    state['model.decoder.layer_norm.weight'] = torch.ones(d)
    state['model.decoder.layer_norm.bias'] = torch.zeros(d)

    params = convert_hf_whisper({k: v.numpy() for k, v in state.items()})
    assert len(params['encoder']['blocks']) == 2
    assert len(params['decoder']['blocks']) == 1
    assert 'cross_attn' in params['decoder']['blocks'][0]
    assert 'bias' not in params['encoder']['blocks'][0]['self_attn'][
        'linear_k']


def test_whisper_greedy_static_matches_host_loop():
    """The single-compile while_loop greedy decode must produce the same
    tokens as a naive grow-the-buffer host loop (VERDICT r1 item 8)."""
    from reverb_tpu.models.whisper import whisper_greedy_decode
    cfg = WhisperConfig(n_mels=20, n_audio_state=32, n_audio_head=2,
                        n_audio_layer=2, n_vocab=50, n_text_ctx=24,
                        n_text_state=32, n_text_head=2, n_text_layer=2)
    params = init_whisper(jax.random.PRNGKey(3), cfg)
    mel = jnp.asarray(RNG.randn(2, 24, 20), jnp.float32)
    sot, eot = [1, 2], 0
    out = whisper_greedy_decode(params, mel, cfg, sot, eot, max_len=8)

    # naive reference loop (the pre-fix semantics)
    feats = whisper_encode(params['encoder'], mel, cfg)
    toks = np.tile(np.asarray(sot, np.int32)[None], (2, 1))
    finished = np.zeros((2,), bool)
    for _ in range(8):
        logits = np.asarray(whisper_decode(params['decoder'],
                                           jnp.asarray(toks), feats, cfg))
        nxt = logits[:, -1].argmax(-1).astype(np.int32)
        nxt = np.where(finished, eot, nxt)
        toks = np.concatenate([toks, nxt[:, None]], axis=1)
        finished |= nxt == eot
        if finished.all():
            break
    ref = toks[:, len(sot):]
    # static version pads with eot past the finish point
    assert out.shape[1] >= ref.shape[1]
    np.testing.assert_array_equal(out[:, :ref.shape[1]], ref)
    assert (out[:, ref.shape[1]:] == eot).all()
