"""End-to-end training entrypoint smoke: 2 epochs on synthetic raw data."""

import json

import numpy as np
import pytest
import yaml

from tests.helpers import build_tiny_model_dir, write_wav


def test_train_main(tmp_path):
    model_src = build_tiny_model_dir(tmp_path / 'init')
    # data
    data_dir = tmp_path / 'data'
    data_dir.mkdir()
    lines = []
    for i in range(6):
        wav = write_wav(data_dir / f'u{i}.wav', seconds=0.5, freq=300 + 40 * i)
        lines.append(json.dumps({'key': f'u{i}', 'wav': str(wav),
                                 'txt': 'a b ab c'}))
    train_list = data_dir / 'train.list'
    train_list.write_text('\n'.join(lines) + '\n')
    cv_list = data_dir / 'cv.list'
    cv_list.write_text('\n'.join(lines[:2]) + '\n')

    # training config = model config + dataset/optim sections
    with open(model_src / 'config.yaml') as f:
        configs = yaml.safe_load(f)
    configs['dataset_conf'].update({
        'filter_conf': {'max_length': 2000, 'min_length': 5},
        'spec_aug': True,
        'spec_aug_conf': {'num_t_mask': 1, 'num_f_mask': 1, 'max_t': 5,
                          'max_f': 3},
        'shuffle': False, 'sort': False,
        'batch_conf': {'batch_type': 'static', 'batch_size': 3},
    })
    configs.update({'optim': 'adam', 'optim_conf': {'lr': 1e-3},
                    'scheduler': 'warmuplr',
                    'scheduler_conf': {'warmup_steps': 4},
                    'max_epoch': 2, 'accum_grad': 1, 'grad_clip': 50.0})
    cfg_path = tmp_path / 'train_config.yaml'
    with open(cfg_path, 'w') as f:
        yaml.safe_dump(configs, f)
    for name in ('tk.units.txt', 'tk.model', 'global_cmvn'):
        (tmp_path / name).write_bytes((model_src / name).read_bytes())
    # tokenizer paths are relative to cwd in the test config; make absolute
    configs['tokenizer_conf']['symbol_table_path'] = str(
        model_src / 'tk.units.txt')
    configs['tokenizer_conf']['bpe_path'] = str(model_src / 'tk.model')
    configs['cmvn_conf']['cmvn_file'] = str(model_src / 'global_cmvn')
    with open(cfg_path, 'w') as f:
        yaml.safe_dump(configs, f)

    model_dir = tmp_path / 'exp'
    from reverb_tpu.bin.train import main
    main(['--config', str(cfg_path), '--train_data', str(train_list),
          '--cv_data', str(cv_list), '--model_dir', str(model_dir),
          '--max_epoch', '2', '--log_interval', '1'])

    assert (model_dir / 'epoch_0.npz').exists()
    assert (model_dir / 'epoch_1.npz').exists()
    assert (model_dir / 'train.yaml').exists()
    with open(model_dir / 'epoch_1.yaml') as f:
        info = yaml.safe_load(f)
    assert np.isfinite(info['cv_loss'])
    assert info['step'] == 4  # 6 utts / batch 3 = 2 steps/epoch × 2 epochs

    # resume from epoch_0 and keep training
    main(['--config', str(cfg_path), '--train_data', str(train_list),
          '--cv_data', str(cv_list), '--model_dir', str(model_dir),
          '--max_epoch', '2', '--checkpoint',
          str(model_dir / 'epoch_0.npz'), '--log_interval', '1'])
