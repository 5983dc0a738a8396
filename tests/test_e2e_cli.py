"""End-to-end smoke: tiny random model + synthetic WAV → transcribe_modes +
CLI main producing CTM files (SURVEY.md §7 build step 4)."""

import os

import numpy as np
import pytest

from tests.helpers import build_tiny_model_dir, write_wav


@pytest.fixture(scope='module')
def model_dir(tmp_path_factory):
    return build_tiny_model_dir(tmp_path_factory.mktemp('tinymodel'))


@pytest.fixture(scope='module')
def wav(tmp_path_factory):
    return write_wav(tmp_path_factory.mktemp('audio') / 'test.wav',
                     seconds=1.2)


def test_load_model_and_transcribe(model_dir, wav):
    from reverb_tpu.cli.reverb import load_model
    model = load_model(str(model_dir))
    out = model.transcribe(str(wav), chunk_size=64, batch_size=2)
    assert isinstance(out, str)  # random weights → any (likely short) text


def test_transcribe_modes_all(model_dir, wav):
    from reverb_tpu.cli.reverb import load_model
    model = load_model(str(model_dir))
    modes = ['ctc_greedy_search', 'ctc_prefix_beam_search',
             'attention_rescoring', 'attention']
    outs = model.transcribe_modes(str(wav), modes, format='ctm',
                                  chunk_size=64, batch_size=2, beam_size=4)
    assert len(outs) == 4
    for o in outs:
        for line in o.splitlines():
            parts = line.split()
            assert len(parts) == 6, line
            assert parts[1] == '0'
            float(parts[2]), float(parts[3]), float(parts[5])


def test_verbatimicity_flag(model_dir, wav):
    from reverb_tpu.cli.reverb import load_model
    model = load_model(str(model_dir))
    # should run without error at both extremes
    model.transcribe(str(wav), verbatimicity=0.0, chunk_size=64)
    model.transcribe(str(wav), verbatimicity=1.0, chunk_size=64)


def test_cli_main(model_dir, wav, tmp_path):
    from reverb_tpu.cli.recognize_wav import main
    result_dir = tmp_path / 'results'
    main(['--audio_file', str(wav), '--model', str(model_dir),
          '--result_dir', str(result_dir), '--modes', 'ctc_greedy_search',
          'ctc_prefix_beam_search', '--chunk_size', '64', '--beam_size', '3'])
    for mode in ('ctc_greedy_search', 'ctc_prefix_beam_search'):
        path = result_dir / mode / 'test.ctm'
        assert path.exists()


def test_tokenizer_roundtrip(model_dir):
    from reverb_tpu.text.tokenizer import init_tokenizer
    import yaml
    with open(model_dir / 'config.yaml') as f:
        configs = yaml.safe_load(f)
    for key in ('symbol_table_path', 'bpe_path'):
        configs['tokenizer_conf'][key] = str(
            model_dir / configs['tokenizer_conf'][key])
    tok = init_tokenizer(configs)
    tokens, ids = tok.tokenize('ab a c')
    assert all(isinstance(i, int) for i in ids)
    text, toks = tok.detokenize(ids)
    assert text.replace(' ', '') == 'abac'
    # <sw> removal (rev_bpe_tokenizer.py:46-47)
    t2, _ = tok.tokenize('a <sw> b')
    assert '<sw>' not in ''.join(t2)


def test_auto_batch_matches_batch1(model_dir, wav):
    """Default (auto) chunk batching must produce byte-identical CTM output
    to the one-chunk-at-a-time path (VERDICT r1 item 10)."""
    from reverb_tpu.cli.reverb import load_model
    model = load_model(str(model_dir))
    auto = model.transcribe_modes(str(wav), ['ctc_prefix_beam_search'],
                                  format='ctm', chunk_size=32, beam_size=4)
    one = model.transcribe_modes(str(wav), ['ctc_prefix_beam_search'],
                                 format='ctm', chunk_size=32, batch_size=1,
                                 beam_size=4)
    assert auto == one


def test_feats_batcher_device_matches_numpy(model_dir):
    """feats_batcher must produce identical batches from a device array and
    from its host copy (transcribe_modes feeds it device-resident fbank)."""
    import jax.numpy as jnp

    from reverb_tpu.cli.reverb import load_model
    model = load_model(str(model_dir))
    rng = np.random.RandomState(0)
    feats = rng.randn(537, 16).astype(np.float32)
    a = list(model.feats_batcher(feats, chunk_size=100, batch_size=3))
    b = list(model.feats_batcher(jnp.asarray(feats), chunk_size=100,
                                 batch_size=3))
    assert len(a) == len(b)
    for (fa, la), (fb, lb) in zip(a, b):
        np.testing.assert_array_equal(fa, np.asarray(fb))
        np.testing.assert_array_equal(la, lb)
