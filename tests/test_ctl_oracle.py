"""CTL model parity vs the reference torch implementation
(asr/wenet/ctl_model/asr_model_ctl.py) on shared weights: the dual-view
losses (full / chunk), the sampled-negative InfoNCE term with injected
negative indices, and the combined total."""

import os

import numpy as np
import pytest

REF = '/root/reference/asr'
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason='reference tree not mounted')


@pytest.fixture(scope='module')
def wenet():
    from tests.test_reference_parity import import_wenet
    return import_wenet()


def test_ctl_loss_parity(wenet):
    import torch
    import jax.numpy as jnp
    from wenet.ctl_model.asr_model_ctl import CTLModel
    from wenet.ctl_model.encoder import DualConformerEncoder
    from wenet.transformer.decoder import BiTransformerDecoder
    from wenet.transformer.ctc import CTC
    from tests.test_reference_parity import _TINY_ENC, _to_ours
    from tests.test_model_forward import TINY
    from reverb_tpu.models.asr_model import ModelConfig
    from reverb_tpu.models.ctl import ctl_compute_loss

    torch.manual_seed(11)
    V, N_NEG = 50, 5
    # DualConformerEncoder's positional super().__init__ passthrough predates
    # the fork's LoRA params, so its num_langs lands in lora_rank and the dual
    # encoder is de-facto always non-LSL (ctl_model/encoder.py:162-170 vs
    # transformer/encoder.py ConformerEncoder signature) — parity-test the
    # configuration the reference can actually build: plain conformer, no
    # cat_embs.
    enc_kw = dict(_TINY_ENC, static_chunk_size=4)
    enc = DualConformerEncoder(num_langs=0, **enc_kw)
    assert not any('lang' in k or 'lora' in k for k in
                   enc.state_dict().keys())
    dec = BiTransformerDecoder(
        vocab_size=V, encoder_output_size=32, attention_heads=2,
        linear_units=64, num_blocks=3, r_num_blocks=1, dropout_rate=0.0,
        positional_dropout_rate=0.0, self_attention_dropout_rate=0.0,
        src_attention_dropout_rate=0.0)
    ctc = CTC(V, 32)
    ref = CTLModel(vocab_size=V, encoder=enc, decoder=dec, ctc=ctc,
                   ctc_weight=0.3, reverse_weight=0.0, lsm_weight=0.1,
                   ignore_id=-1, logit_temp=0.1, n_negatives=N_NEG,
                   ctl_weight=0.7)
    ref.lsl_enc = False
    ref.lsl_dec = False
    ref.add_cat_embs = False
    ref.eval()

    rng = np.random.RandomState(0)
    B, T, L = 2, 131, 7
    feats = rng.randn(B, T, 80).astype(np.float32)
    lens = np.array([131, 90], np.int64)
    tgt = rng.randint(1, V - 2, (B, L)).astype(np.int64)
    tgt[1, 5:] = -1
    tgt_lens = np.array([7, 5], np.int64)

    with torch.no_grad():
        loss_full, full_out, _, _, _ = ref.forward_full(
            torch.from_numpy(feats), torch.from_numpy(lens),
            torch.from_numpy(tgt), torch.from_numpy(tgt_lens))
        loss_chunk, chunk_out, lens_chunk, chunk_mask, _ = ref.forward_chunk(
            torch.from_numpy(feats), torch.from_numpy(lens),
            torch.from_numpy(tgt), torch.from_numpy(tgt_lens))

        # shared negative draw (post-collision-shift indices), applied to
        # the reference exactly as its sample_negatives gather does
        # (asr_model_ctl.py:248-254)
        Tz = full_out.shape[1]
        idx = np.stack([rng.randint(0, int(lens_chunk[b]) - 1,
                                    (Tz, N_NEG)) for b in range(B)])
        t_col = np.arange(Tz)[None, :, None]
        idx = np.where(idx >= t_col, idx + 1, idx).astype(np.int64)
        flat = torch.from_numpy(idx).reshape(B, -1) \
            + torch.arange(B).unsqueeze(1) * Tz
        negs = full_out.reshape(-1, full_out.shape[-1])[flat.view(-1)]
        negs = negs.view(B, Tz, N_NEG, -1).permute(2, 0, 1, 3)
        want_ctl = ref.CTL(chunk_out, full_out, negs, chunk_mask)
        want_total = loss_full + loss_chunk + 0.7 * want_ctl

    conf = {k: (dict(v) if isinstance(v, dict) else v)
            for k, v in TINY.items()}
    del conf['dataset_conf']          # no cat_embs → non-LSL, like the ref
    conf['encoder_conf'] = dict(conf['encoder_conf'], static_chunk_size=4,
                                dropout_rate=0.0,
                                positional_dropout_rate=0.0)
    conf['decoder_conf'] = dict(conf['decoder_conf'], dropout_rate=0.0)
    conf['model_conf'] = {'ctc_weight': 0.3, 'reverse_weight': 0.0,
                          'lsm_weight': 0.1}
    cfg = ModelConfig.from_config(conf)
    params = {'encoder': _to_ours(ref.encoder),
              'decoder': _to_ours(ref.decoder),
              'ctc': _to_ours(ref.ctc)}
    batch = {'feats': jnp.asarray(feats),
             'feats_lengths': jnp.asarray(lens.astype(np.int32)),
             'target': jnp.asarray(tgt.astype(np.int32)),
             'target_lengths': jnp.asarray(tgt_lens.astype(np.int32))}
    got = ctl_compute_loss(params, cfg, batch, rng=None, ctl_weight=0.7,
                           temperature=0.1, n_negatives=N_NEG,
                           neg_idxs=jnp.asarray(idx))

    np.testing.assert_allclose(float(got['loss_full']), float(loss_full),
                               rtol=2e-4)
    np.testing.assert_allclose(float(got['loss_chunk']), float(loss_chunk),
                               rtol=2e-4)
    np.testing.assert_allclose(float(got['loss_ctl']), float(want_ctl),
                               rtol=2e-4)
    np.testing.assert_allclose(float(got['loss']), float(want_total),
                               rtol=2e-4)
    print(f"ctl parity: full {float(got['loss_full']):.5f} chunk "
          f"{float(got['loss_chunk']):.5f} ctl {float(got['loss_ctl']):.5f}")
