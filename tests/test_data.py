"""Data pipeline: raw/shard sources, transforms, batching, padding."""

import json
import tarfile
import wave as wave_mod

import numpy as np
import pytest

from reverb_tpu.data.dataset import Dataset
from reverb_tpu.data import processor, rev_processor
from reverb_tpu.data.pipeline import from_list
from tests.helpers import build_tiny_model_dir, write_wav


def _make_raw_list(tmp_path, n=6):
    paths = []
    for i in range(n):
        wav = write_wav(tmp_path / f'utt{i}.wav', seconds=0.5 + 0.1 * i,
                        freq=300 + 50 * i)
        paths.append(wav)
    list_file = tmp_path / 'data.list'
    with open(list_file, 'w') as f:
        for i, p in enumerate(paths):
            f.write(json.dumps({'key': f'job{i % 2}_utt{i}',
                                'wav': str(p), 'txt': 'a b ab c'}) + '\n')
    return list_file


def _make_shard(tmp_path, n=4):
    shard = tmp_path / 'shard0.tar'
    with tarfile.open(shard, 'w') as tar:
        for i in range(n):
            wav_path = write_wav(tmp_path / f's{i}.wav', seconds=0.4)
            tar.add(wav_path, arcname=f'key{i}.wav')
            txt_path = tmp_path / f's{i}.txt'
            txt_path.write_text('a b')
            tar.add(txt_path, arcname=f'key{i}.txt')
    list_file = tmp_path / 'shards.list'
    list_file.write_text(str(shard) + '\n')
    return list_file


@pytest.fixture(scope='module')
def tokenizer(tmp_path_factory):
    import yaml
    d = build_tiny_model_dir(tmp_path_factory.mktemp('tok'))
    from reverb_tpu.text.tokenizer import init_tokenizer
    with open(d / 'config.yaml') as f:
        configs = yaml.safe_load(f)
    for key in ('symbol_table_path', 'bpe_path'):
        configs['tokenizer_conf'][key] = str(
            d / configs['tokenizer_conf'][key])
    return init_tokenizer(configs)


CONF = {
    'filter_conf': {'max_length': 2000, 'min_length': 5},
    'resample_conf': {'resample_rate': 16000},
    'fbank_conf': {'num_mel_bins': 80, 'frame_length': 25,
                   'frame_shift': 10, 'dither': 0.0},
    'spec_aug': True,
    'spec_aug_conf': {'num_t_mask': 2, 'num_f_mask': 2, 'max_t': 10,
                      'max_f': 5},
    'shuffle': True, 'shuffle_conf': {'shuffle_size': 16},
    'sort': True, 'sort_conf': {'sort_size': 8},
    'pass_cat_emb': True,
    'cat_emb_conf': {'field': 'style', 'emb_len': 2,
                     'one_hot_ids': {'v': 0, 'nv': 1}},
    'batch_conf': {'batch_type': 'static', 'batch_size': 3},
}


def test_raw_dataset(tmp_path, tokenizer):
    list_file = _make_raw_list(tmp_path)
    ds = Dataset('raw', list_file, tokenizer, CONF, partition=False, seed=0)
    batches = list(ds)
    assert batches
    total = sum(b['feats'].shape[0] for b in batches)
    assert total == 6
    b = batches[0]
    assert b['feats'].ndim == 3 and b['feats'].shape[2] == 80
    assert b['target'].ndim == 2
    assert (b['target'][0][:b['target_lengths'][0]] >= 0).all()
    assert b['cat_embs'].shape == (b['feats'].shape[0], 2)
    # nonverbatim default: one-hot index 1
    np.testing.assert_allclose(b['cat_embs'][0], [0.0, 1.0])
    # feats sorted desc within batch
    assert (np.diff(b['feats_lengths']) <= 0).all()


def test_shard_dataset(tmp_path, tokenizer):
    list_file = _make_shard(tmp_path)
    conf = dict(CONF)
    conf['batch_conf'] = {'batch_type': 'dynamic', 'max_frames_in_batch': 100}
    ds = Dataset('shard', list_file, tokenizer, conf, partition=False)
    batches = list(ds)
    assert sum(b['feats'].shape[0] for b in batches) == 4


def test_distribute_batch_one_utt_per_job(tmp_path, tokenizer):
    list_file = _make_raw_list(tmp_path)
    conf = dict(CONF)
    conf['shuffle'] = False
    conf['sort'] = False
    conf['batch_conf'] = {'batch_type': 'distribute',
                          'max_frames_in_batch': 100000,
                          'distrib_one_utt_per_job': True}
    ds = Dataset('raw', list_file, tokenizer, conf, partition=False)
    for b in ds:
        jobs = [k.rsplit('_', 1)[0] for k in b['keys']]
        assert len(jobs) == len(set(jobs)), jobs  # one utt per job per batch


def test_special_tokens_handler():
    h = rev_processor.SpecialTokensHandler(
        {'reject_on': ['<bad>'], 'remove': ['<sw>'],
         'relabel': [['<um>', 'um']], 'remove_trailing_dash': True})
    s = h.transform({'txt': 'hello <sw> wor- <um> ld'})
    assert s['txt'] == 'hello wor um ld'
    assert h.transform({'txt': 'x <bad> y'}) is None
    assert h.transform({'txt': '<sw>'}) is None


def test_speed_perturb_changes_length():
    wav = np.random.RandomState(0).randn(1, 16000).astype(np.float32)
    s = {'wav': wav.copy(), 'sample_rate': 16000}
    out = processor.speed_perturb(dict(s), speeds=[0.9])
    assert abs(out['wav'].shape[1] - 16000 / 0.9) < 20


def test_telephony_and_rir():
    rng = np.random.RandomState(0)
    wav = rng.randn(1, 16000).astype(np.float32) * 0.1
    s = {'wav': wav.copy(), 'sample_rate': 16000}
    out = rev_processor.apply_telephony(dict(s), prob=1.1)
    assert out['wav'].shape[1] <= 16000
    assert not np.allclose(out['wav'][0][:1000], wav[0][:1000])
    rir = np.zeros(100, np.float32)
    rir[0] = 1.0
    rir[50] = 0.5
    eng = rev_processor.RIREngine({'prob': 1.1, 'rir_list': [rir]})
    out2 = eng.apply_rir({'wav': wav.copy(), 'sample_rate': 16000})
    assert out2['wav'].shape == wav.shape


def test_speaker_switch():
    sr = 16000
    samples = [
        {'key': f'spk{i // 2}-utt{i}',
         'wav': np.ones((1, int(sr * 1.5)), np.float32) * i,
         'txt': f'w{i}', 'sample_rate': sr}
        for i in range(4)]
    out = list(rev_processor.generate_speaker_switch_utterances(
        iter(samples), {}))
    assert len(out) < 4
    joined = ' '.join(o['txt'] for o in out)
    assert '<sw>' in joined


def test_pad_len_multiple():
    feats = [np.ones((37, 4), np.float32), np.ones((25, 4), np.float32)]
    data = [{'key': 'a', 'feat': feats[0], 'label': [1, 2],
             'wav': np.ones((1, 100), np.float32)},
            {'key': 'b', 'feat': feats[1], 'label': [3],
             'wav': np.ones((1, 80), np.float32)}]
    b = processor.padding(data, pad_len_multiple=32)
    assert b['feats'].shape[1] == 64   # 37 → 64
