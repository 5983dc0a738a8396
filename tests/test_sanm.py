"""Ali-Paraformer SANM stack: LFR oracle, fsmn attention shapes, full
glancing-sampler training bundle (paraformer/layers.py, attention.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from reverb_tpu.models.sanm import (SanmConfig, init_sanm_decoder,
                                    init_sanm_encoder, lfr,
                                    sanm_decoder_forward,
                                    sanm_encoder_forward, sanm_greedy_decode)


def _lfr_oracle(x, lens, m, n):
    """Reference semantics (layers.py:23-91): head-pad ⌈(m-1)/2⌉ copies of
    frame 0, tail-pad with the last valid frame, window (m, stride n)."""
    B, T, D = x.shape
    left = (m - 1) // 2
    outs, new_lens = [], []
    for b in range(B):
        L = int(lens[b])
        seq = x[b, :L]
        n_out = -(-L // n)
        head = np.repeat(seq[:1], left, axis=0)
        tail = np.repeat(seq[-1:], m + n * n_out, axis=0)
        padded = np.concatenate([head, seq, tail], axis=0)
        rows = [padded[t * n:t * n + m].reshape(-1) for t in range(n_out)]
        outs.append(np.stack(rows))
        new_lens.append(n_out)
    U = max(o.shape[0] for o in outs)
    out = np.zeros((B, U, m * D), x.dtype)
    for b, o in enumerate(outs):
        out[b, :o.shape[0]] = o
    return out, np.array(new_lens)


def test_lfr_matches_oracle():
    rng = np.random.RandomState(0)
    x = rng.randn(3, 25, 4).astype(np.float32)
    lens = np.array([25, 13, 7])
    for m, n in ((7, 6), (5, 3), (1, 1)):
        got, got_lens = lfr(jnp.asarray(x), jnp.asarray(lens), m, n)
        want, want_lens = _lfr_oracle(x, lens, m, n)
        got = np.asarray(got)
        np.testing.assert_array_equal(np.asarray(got_lens), want_lens)
        for b in range(3):
            np.testing.assert_allclose(got[b, :want_lens[b]],
                                       want[b, :want_lens[b]], rtol=1e-6)


CFG = SanmConfig(input_size=8 * 3, output_size=16, attention_heads=2,
                 linear_units=32, num_blocks=2, decoder_blocks=2,
                 vocab_size=30, kernel_size=5, dropout_rate=0.0,
                 lfr_m=3, lfr_n=2)


def test_sanm_encoder_decoder_shapes_and_masking():
    enc_p = init_sanm_encoder(jax.random.PRNGKey(0), CFG)
    dec_p = init_sanm_decoder(jax.random.PRNGKey(1), CFG)
    B, T = 2, 21
    feats = jnp.asarray(np.random.RandomState(0).randn(B, T, 8), jnp.float32)
    lens = jnp.array([T, 9])
    enc, mask = sanm_encoder_forward(enc_p, feats, lens, CFG)
    assert enc.shape == (B, -(-T // CFG.lfr_n), CFG.output_size)
    assert int(mask[1, 0].sum()) == -(-9 // CFG.lfr_n)
    assert np.isfinite(np.asarray(enc)).all()

    # padded frames must not affect valid outputs
    feats2 = feats.at[1, 9:].set(99.0)
    enc2, _ = sanm_encoder_forward(enc_p, feats2, lens, CFG)
    v = int(mask[1, 0].sum())
    np.testing.assert_allclose(np.asarray(enc2[1, :v]),
                               np.asarray(enc[1, :v]), rtol=1e-4, atol=1e-5)

    sem = jnp.asarray(np.random.RandomState(1)
                      .randn(B, 5, CFG.output_size), jnp.float32)
    out = sanm_decoder_forward(dec_p, enc, mask, sem, jnp.array([5, 3]), CFG)
    assert out.shape == (B, 5, CFG.vocab_size)
    assert np.isfinite(np.asarray(out)).all()


def test_sanm_paraformer_bundle_trains():
    from reverb_tpu.models.registry import init_model
    conf = {
        'input_dim': 8, 'output_dim': 30,
        'model': 'paraformer',
        'encoder': 'sanm_encoder',
        'encoder_conf': {'output_size': 16, 'attention_heads': 2,
                         'linear_units': 32, 'num_blocks': 2,
                         'kernel_size': 5, 'dropout_rate': 0.0},
        'decoder': 'sanm_decoder',
        'decoder_conf': {'num_blocks': 2},
        'lfr_conf': {'lfr_m': 3, 'lfr_n': 2},
        'model_conf': {'ctc_weight': 0.1, 'sampling_ratio': 0.75,
                       'lsm_weight': 0.1},
    }
    bundle = init_model(conf, jax.random.PRNGKey(0))
    assert bundle.kind == 'paraformer'
    assert 'encoders0' in bundle.params['encoder']
    B, T = 2, 21
    batch = {'feats': jnp.asarray(
                 np.random.RandomState(0).randn(B, T, 8), jnp.float32),
             'feats_lengths': jnp.array([T, 15]),
             'target': jnp.array([[1, 2, 3], [4, 5, -1]]),
             'target_lengths': jnp.array([3, 2])}
    out = bundle.loss_fn(bundle.params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(out['loss']))
    assert 'loss_quantity' in out and 'loss_ctc' in out
    g = jax.grad(lambda p: bundle.loss_fn(p, batch,
                                          jax.random.PRNGKey(1))['loss'])(
        bundle.params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # decoder + predictor + encoder all receive gradient
    for key in ('encoder', 'decoder', 'predictor'):
        gn = sum(float(jnp.sum(jnp.abs(l)))
                 for l in jax.tree.leaves(g[key]))
        assert gn > 0.0, key

    toks, n = sanm_greedy_decode(
        bundle.params, batch['feats'], batch['feats_lengths'], CFG,
        __import__('reverb_tpu.models.paraformer',
                   fromlist=['CifConfig']).CifConfig(idim=16), max_tokens=8)
    assert toks.shape[0] == B
