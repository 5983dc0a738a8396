"""Paraformer serving parity vs the reference torch implementation:
CIF predictor (V3, incl. the timestamp branch), greedy/beam search,
CIF-peak timestamps, and the beautify text joiner.

Oracle pattern as in test_reference_parity.py: the reference modules run
with the same weights/inputs; no reference code is copied.
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = '/root/reference/asr'
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason='reference tree not mounted')


@pytest.fixture(scope='module')
def wenet():
    import sys
    import typing

    from tests.test_reference_parity import import_wenet
    w = import_wenet()
    # reference quirk: cif.py does `from torchaudio.compliance.kaldi import
    # Tuple` — satisfy it on the stub module
    k = sys.modules['torchaudio.compliance.kaldi']
    if not hasattr(k, 'Tuple'):
        k.Tuple = typing.Tuple
    return w


def _predictor_to_ours(ref):
    """wenet.paraformer.paraformer.Predictor state → our param tree."""
    from tests.test_reference_parity import _torch_lstm_to_ours
    sd = {k: v.detach() for k, v in ref.state_dict().items()}
    return {
        'cif_conv1d': {'weight': sd['predictor.cif_conv1d.weight'].numpy(),
                       'bias': sd['predictor.cif_conv1d.bias'].numpy()},
        'cif_output': {'weight': sd['predictor.cif_output.weight'].numpy(),
                       'bias': sd['predictor.cif_output.bias'].numpy()},
        'tp_upsample_cnn': {
            'weight': sd['tp_upsample_cnn.weight'].numpy(),
            'bias': sd['tp_upsample_cnn.bias'].numpy()},
        'tp_blstm': {'fwd': _torch_lstm_to_ours(sd, 'tp_blstm.', 0, False),
                     'bwd': _torch_lstm_to_ours(sd, 'tp_blstm.', 0, True)},
        'tp_output': {'weight': sd['tp_output.weight'].numpy(),
                      'bias': sd['tp_output.bias'].numpy()},
    }


@pytest.mark.parametrize('residual,groups', [(False, 1), (True, 0)])
def test_cif_predictor_parity(wenet, residual, groups):
    """Predictor forward (paraformer.py:76-102): α, tail handling, fired
    embeddings, cif peaks, tp_alphas — all vs the reference module."""
    import torch
    from wenet.paraformer.paraformer import Predictor
    from wenet.utils.mask import make_pad_mask as ref_make_pad_mask
    from reverb_tpu.models.paraformer import (CifConfig, cif_alphas,
                                              cif_fire, cif_peaks_from_tp,
                                              cif_tail_process,
                                              tp_alphas_forward)

    torch.manual_seed(3)
    D = 12
    ref = Predictor(idim=D, l_order=1, r_order=1, dropout=0.0,
                    residual=residual, cnn_groups=groups)
    ref.eval()
    B, T = 2, 19
    hidden = torch.randn(B, T, D)
    lens = torch.tensor([19, 11])
    mask = ~ref_make_pad_mask(lens, T).unsqueeze(1)          # (B,1,T)
    with torch.no_grad():
        acoustic, token_num, alphas_t, cif_peak, tp_alphas_t, _ = ref(
            hidden, mask=mask)

    cfg = CifConfig(idim=D, residual=residual, cnn_groups=groups)
    p = _predictor_to_ours(ref)
    mask_j = jnp.asarray(mask.numpy())
    alphas = cif_alphas(p, jnp.asarray(hidden.numpy()), mask_j, cfg)
    hid2, alphas2, tok = cif_tail_process(
        jnp.asarray(hidden.numpy()), alphas, mask_j[:, 0, :],
        cfg.tail_threshold)
    # reference returns the TAIL-EXTENDED alphas + floored token count
    np.testing.assert_allclose(np.asarray(alphas2), alphas_t.numpy(),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(jnp.floor(tok)),
                                  np.floor(token_num.numpy()))

    U = acoustic.shape[1]
    fired, n_fired = cif_fire(hid2, alphas2, max(U, 1), cfg.threshold)
    np.testing.assert_allclose(np.asarray(fired)[:, :U], acoustic.numpy(),
                               atol=1e-5, rtol=1e-4)

    # fires trace parity (cif_peak covers the extended T+1 frames)
    from reverb_tpu.models.paraformer import cif_fires
    fires = cif_fires(alphas2, cfg.threshold)
    np.testing.assert_allclose(np.asarray(fires), cif_peak.numpy(),
                               atol=1e-5, rtol=1e-4)

    tp = tp_alphas_forward(p, jnp.asarray(hidden.numpy()), mask_j, cfg)
    np.testing.assert_allclose(np.asarray(tp), tp_alphas_t.numpy(),
                               atol=1e-5, rtol=1e-4)

    # forward_cif_peaks (paraformer.py:319-326)
    import wenet.paraformer.cif as ref_cif
    tok_i = torch.tensor(np.asarray(tok), dtype=torch.float32)
    with torch.no_grad():
        want_peaks = ref_cif.cif_without_hidden(
            tp_alphas_t / (tp_alphas_t.sum(-1) / tok_i).unsqueeze(1),
            ref.predictor.threshold - 1e-4)
    got_peaks = cif_peaks_from_tp(tp, jnp.asarray(np.asarray(tok)),
                                  cfg.threshold)
    np.testing.assert_allclose(np.asarray(got_peaks), want_peaks.numpy(),
                               atol=1e-5, rtol=1e-4)


def test_paraformer_greedy_search_parity(wenet):
    import torch
    from wenet.paraformer.search import \
        paraformer_greedy_search as ref_greedy
    from reverb_tpu.decode.paraformer_search import paraformer_greedy_search

    torch.manual_seed(4)
    B, U, V, Tp = 3, 7, 20, 40
    decoder_out = torch.log_softmax(torch.randn(B, U, V), dim=-1)
    lens = torch.tensor([7, 4, 6])
    # peaks: enough >1-1e-4 crossings per row for every decoded token
    peaks = torch.rand(B, Tp) * 0.9
    for b, n in enumerate([7, 4, 6]):
        idx = torch.linspace(2, Tp - 2, n).long()
        peaks[b, idx] = 1.0
    want = ref_greedy(decoder_out, lens, cif_peaks=peaks)
    got = paraformer_greedy_search(decoder_out.numpy(), lens.numpy(),
                                   cif_peaks=peaks.numpy())
    for w, g in zip(want, got):
        assert g.tokens == w.tokens
        assert g.times == w.times
        np.testing.assert_allclose(g.confidence, w.confidence, rtol=1e-6)
        np.testing.assert_allclose(g.tokens_confidence, w.tokens_confidence,
                                   rtol=1e-6)


def test_paraformer_beam_search_parity(wenet):
    import torch
    from wenet.paraformer.search import paraformer_beam_search as ref_beam
    from reverb_tpu.decode.paraformer_search import paraformer_beam_search

    torch.manual_seed(5)
    B, U, V = 3, 9, 25
    decoder_out = torch.log_softmax(torch.randn(B, U, V), dim=-1)
    lens = torch.tensor([9, 5, 1])
    want = ref_beam(decoder_out, lens, beam_size=6, eos=V - 1)
    got = paraformer_beam_search(decoder_out.numpy(), lens.numpy(),
                                 beam_size=6, eos=V - 1)
    for w, g in zip(want, got):
        assert g.tokens == w.tokens


def test_timestamps_and_beautify_parity(wenet):
    from wenet.paraformer.search import (gen_timestamps_from_peak as ref_ts,
                                         paraformer_beautify_result as
                                         ref_beautify)
    from reverb_tpu.decode.paraformer_search import (
        gen_timestamps_from_peak, paraformer_beautify_result)

    for peaks, nf in [([3, 8, 12, 30], 33),      # long tail → extra segment
                      ([2, 5, 9], 11),           # short tail → extended end
                      ([1, 20], 25)]:            # > MAX_TOKEN_DURATION split
        assert gen_timestamps_from_peak(peaks, nf) == ref_ts(peaks, nf)

    cases = [
        ['你', '好', '世', '界'],
        ['hel@@', 'lo', 'wor@@', 'ld', "it's"],
        ['你', 'hel@@', 'lo', '好', 'ok', '!'],
        ['<sos>', '你', '<eos>', '9', '@'],
        ['¿', 'mixed', '你'],
    ]
    for toks in cases:
        assert paraformer_beautify_result(toks) == ref_beautify(toks), toks


def _tiny_wenet_paraformer(wenet):
    import torch
    from wenet.paraformer.layers import SanmDecoder, SanmEncoder
    from wenet.paraformer.paraformer import Paraformer, Predictor
    from wenet.transformer.ctc import CTC

    torch.manual_seed(11)
    V, D = 40, 16
    enc = SanmEncoder(input_size=80 * 7, output_size=D, attention_heads=2,
                      linear_units=32, num_blocks=2, dropout_rate=0.0,
                      positional_dropout_rate=0.0,
                      attention_dropout_rate=0.0, kernel_size=5)
    dec = SanmDecoder(vocab_size=V, encoder_output_size=D,
                      attention_heads=2, linear_units=32, num_blocks=2,
                      dropout_rate=0.0, positional_dropout_rate=0.0,
                      self_attention_dropout_rate=0.0,
                      src_attention_dropout_rate=0.0, att_layer_num=2,
                      kernel_size=5)
    pred = Predictor(idim=D, l_order=1, r_order=1, dropout=0.0,
                     cnn_groups=1, residual=False)
    ctc = CTC(V, D)
    model = Paraformer(V, enc, dec, pred, ctc, ctc_weight=0.0,
                       special_tokens={'<sos>': V - 1, '<eos>': V - 1})
    model.eval()
    return model, V, D


_TINY_PARA_CONF = {
    'input_dim': 80,
    'encoder': 'sanm_encoder',
    'encoder_conf': {'output_size': 16, 'attention_heads': 2,
                     'linear_units': 32, 'num_blocks': 2, 'kernel_size': 5,
                     'dropout_rate': 0.0},
    'decoder': 'sanm_decoder',
    'decoder_conf': {'num_blocks': 2},
    'predictor_conf': {'l_order': 1, 'r_order': 1, 'cnn_groups': 1,
                       'residual': False},
    'lfr_conf': {'lfr_m': 7, 'lfr_n': 6},
    'model': 'paraformer',
}


def test_forward_paraformer_parity_via_converter(wenet):
    """Full NAR forward through the checkpoint converter: wenet state_dict →
    load_paraformer_checkpoint → sanm_forward_paraformer must match
    _forward_paraformer (decoder_out / lens / tp_alphas)."""
    import torch
    from reverb_tpu.convert.torch_ckpt import (convert_torch_state_dict,
                                               fixup_paraformer_predictor,
                                               nest_state_dict)
    from reverb_tpu.models.registry import sanm_configs
    from reverb_tpu.models.sanm import sanm_forward_paraformer

    model, V, D = _tiny_wenet_paraformer(wenet)
    feats = torch.randn(1, 70, 80)
    lens = torch.tensor([70])
    # _forward_paraformer (paraformer.py:329-356) with the encoder layers
    # driven directly — this fork's BaseEncoder.forward passes cat_embs the
    # Ali layer rejects (same workaround as test_sanm_encoder_decoder_parity)
    from wenet.utils.mask import make_pad_mask as ref_make_pad_mask
    with torch.no_grad():
        feats_l, lens_l = model.lfr(feats, lens)
        mask = ~ref_make_pad_mask(lens_l, feats_l.size(1)).unsqueeze(1)
        xs, pos, mask = model.encoder.embed(feats_l, mask)
        xs = model.encoder.forward_layers(xs, mask, pos, mask)
        enc = model.encoder.after_norm(xs)
        acoustic, token_num, _, _, tp_alphas_t, _ = model.predictor(
            enc, mask=mask)
        token_num = token_num.floor().to(lens.dtype)
        decoder_out, _, _ = model.decoder(enc, mask, acoustic, token_num)
        res = {'decoder_out': decoder_out.log_softmax(dim=-1),
               'decoder_out_lens': token_num, 'tp_alphas': tp_alphas_t}

    conf = dict(_TINY_PARA_CONF, output_dim=V)
    scfg, cif = sanm_configs(conf)
    params = fixup_paraformer_predictor(
        nest_state_dict(convert_torch_state_dict(model.state_dict())))
    logp, out_lens, tp = sanm_forward_paraformer(
        params, jnp.asarray(feats.numpy()), jnp.asarray(lens.numpy()),
        scfg, cif, max_tokens=16)

    want_lens = res['decoder_out_lens'].numpy()
    np.testing.assert_array_equal(np.asarray(out_lens), want_lens)
    U = res['decoder_out'].shape[1]
    n = int(want_lens[0])
    np.testing.assert_allclose(np.asarray(logp)[0, :n],
                               res['decoder_out'].numpy()[0, :n],
                               atol=5e-4, rtol=2e-3)
    want_tp = res['tp_alphas'].numpy()
    np.testing.assert_allclose(np.asarray(tp)[:, :want_tp.shape[1]],
                               want_tp, atol=1e-5, rtol=1e-4)


def test_paraformer_cli_end_to_end(wenet, tmp_path):
    """cli/paraformer_model.py + `transcribe --paraformer` drive a saved
    wenet-format checkpoint dir to a result dict with timestamps."""
    import torch
    import yaml

    from tests.helpers import write_wav

    model, V, D = _tiny_wenet_paraformer(wenet)
    mdir = tmp_path / 'para'
    mdir.mkdir()
    torch.save(model.state_dict(), mdir / 'final.pt')
    with open(mdir / 'config.yaml', 'w') as f:
        yaml.safe_dump(dict(_TINY_PARA_CONF, output_dim=V), f)
    with open(mdir / 'units.txt', 'w') as f:
        for i in range(V):
            f.write(f'tk{i} {i}\n')
    wav = write_wav(tmp_path / 'a.wav', seconds=1.1)

    from reverb_tpu.cli import transcribe as tcli
    result = tcli.main([str(wav), '-m', str(mdir), '--paraformer', '-t'])
    assert set(result) >= {'text', 'confidence', 'tokens'}
    assert isinstance(result['text'], str)
    assert 0.0 <= result['confidence'] <= 1.0
    for tok in result['tokens']:
        assert tok['end'] >= tok['start'] >= 0.0
        assert 0.0 <= tok['confidence'] <= 1.0
    assert len(result['tokens']) > 0
