"""Experiment-tracking backends: JSONL metrics, artifact manifests, fan-out.

Parity: wandb/tensorboard integration (asr/wenet/utils/train_utils.py:495-533,
712-764; utils/checkpoint.py:180-190) — here backend-pluggable with an
always-on offline JSONL tracker.
"""

import json
import os

from reverb_tpu.utils.tracking import (JsonlTracker, MultiTracker, Tracker,
                                       init_tracking)


def test_jsonl_tracker_metrics_and_artifacts(tmp_path):
    t = JsonlTracker(str(tmp_path))
    t.add_scalar('train/loss', 1.5, 10)
    t.add_scalar('train/lr', 1e-3, 10)
    t.add_scalar('train/loss', 1.2, 20)
    t.finish()
    lines = [json.loads(l) for l in
             open(tmp_path / 'metrics.jsonl').read().splitlines()]
    assert len(lines) == 2
    assert lines[0]['step'] == 10 and lines[0]['train/loss'] == 1.5
    assert lines[0]['train/lr'] == 1e-3
    assert lines[1]['step'] == 20 and lines[1]['train/loss'] == 1.2

    f = tmp_path / 'data.list'
    f.write_text('hello\n')
    t.log_artifact('training_data_list', 'train_dataset',
                   {'train.list': str(f)})
    art = json.loads(open(tmp_path / 'artifacts.jsonl').read())
    assert art['artifact'] == 'training_data_list'
    assert art['files'][0]['name'] == 'train.list'
    assert art['files'][0]['bytes'] == 6
    assert len(art['files'][0]['sha256']) == 64


def test_multi_tracker_fans_out(tmp_path):
    a = JsonlTracker(str(tmp_path / 'a'))
    b = JsonlTracker(str(tmp_path / 'b'))
    m = MultiTracker([a, b])
    m.log_metrics({'loss': 2.0, 'skipped': None}, 5)
    m.finish()
    for d in ('a', 'b'):
        rec = json.loads(open(tmp_path / d / 'metrics.jsonl').read())
        assert rec['loss'] == 2.0 and 'skipped' not in rec


def test_init_tracking_launch_artifacts(tmp_path):
    train_list = tmp_path / 'train.list'
    train_list.write_text('x\n')
    conf = {'tokenizer_conf': {}}
    tr = init_tracking(str(tmp_path / 'model'), conf,
                       train_data=str(train_list))
    assert not isinstance(tr, Tracker) or hasattr(tr, 'log_artifact')
    tr.finish()
    manifest = (tmp_path / 'model' / 'artifacts.jsonl').read_text()
    arts = [json.loads(l) for l in manifest.splitlines()]
    names = {a['artifact'] for a in arts}
    assert 'reverb-tpu-tree' in names      # code snapshot
    assert 'training_data_list' in names
