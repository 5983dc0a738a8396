"""bin/train.py: teacher-student distillation path + registry-family path."""

import pytest
import json

import numpy as np
import yaml

from tests.helpers import build_tiny_model_dir, write_wav


def _data(tmp_path, n=4):
    lines = []
    for i in range(n):
        wav = write_wav(tmp_path / f'u{i}.wav', seconds=0.5,
                        freq=300 + 40 * i)
        lines.append(json.dumps({'key': f'u{i}', 'wav': str(wav),
                                 'txt': 'a b'}))
    lst = tmp_path / 'train.list'
    lst.write_text('\n'.join(lines) + '\n')
    return lst


def _base_configs(mdir):
    with open(mdir / 'config.yaml') as f:
        configs = yaml.safe_load(f)
    configs['dataset_conf'].update({
        'shuffle': False, 'sort': False,
        'batch_conf': {'batch_type': 'static', 'batch_size': 2}})
    configs.update({'optim': 'adam', 'optim_conf': {'lr': 1e-3},
                    'scheduler': 'warmuplr',
                    'scheduler_conf': {'warmup_steps': 2},
                    'max_epoch': 1, 'accum_grad': 1, 'grad_clip': 50.0})
    configs['tokenizer_conf']['symbol_table_path'] = str(mdir /
                                                         'tk.units.txt')
    configs['tokenizer_conf']['bpe_path'] = str(mdir / 'tk.model')
    configs['cmvn_conf']['cmvn_file'] = str(mdir / 'global_cmvn')
    return configs


@pytest.mark.slow
def test_train_teacher_student(tmp_path):
    mdir = build_tiny_model_dir(tmp_path / 'init')
    lst = _data(tmp_path)
    configs = _base_configs(mdir)
    configs['ts_conf'] = {'teacher_yaml': str(tmp_path / 'teacher.yaml'),
                          'teacher_checkpoint': str(mdir / 'model.npz'),
                          'ts_weight': 0.5, 'top_k_entries': 5}
    with open(tmp_path / 'teacher.yaml', 'w') as f:
        yaml.safe_dump(configs, f)
    cfg_path = tmp_path / 'train.yaml'
    with open(cfg_path, 'w') as f:
        yaml.safe_dump(configs, f)
    from reverb_tpu.bin.train import main
    main(['--config', str(cfg_path), '--train_data', str(lst),
          '--cv_data', str(lst), '--model_dir', str(tmp_path / 'exp'),
          '--max_epoch', '1', '--log_interval', '1'])
    assert (tmp_path / 'exp' / 'epoch_0.npz').exists()
    with open(tmp_path / 'exp' / 'epoch_0.yaml') as f:
        info = yaml.safe_load(f)
    assert np.isfinite(info['cv_loss'])


@pytest.mark.slow
def test_train_registry_transducer(tmp_path):
    mdir = build_tiny_model_dir(tmp_path / 'init')
    lst = _data(tmp_path)
    configs = _base_configs(mdir)
    configs.update({'model': 'transducer', 'predictor': 'embedding',
                    'predictor_conf': {'predictor_embed_size': 32,
                                       'predictor_kernel': 2},
                    'joint_conf': {'join_dim': 32},
                    'model_conf': {'transducer_weight': 0.7,
                                   'ctc_weight': 0.3}})
    cfg_path = tmp_path / 'train.yaml'
    with open(cfg_path, 'w') as f:
        yaml.safe_dump(configs, f)
    from reverb_tpu.bin.train import main
    main(['--config', str(cfg_path), '--train_data', str(lst),
          '--cv_data', str(lst), '--model_dir', str(tmp_path / 'exp'),
          '--max_epoch', '1', '--log_interval', '1'])
    assert (tmp_path / 'exp' / 'epoch_0.npz').exists()
    with open(tmp_path / 'exp' / 'epoch_0.yaml') as f:
        info = yaml.safe_load(f)
    assert np.isfinite(info['cv_loss'])
