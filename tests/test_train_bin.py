"""End-to-end training entrypoint smoke: 2 epochs on synthetic raw data."""

import json

import numpy as np
import pytest
import yaml

from tests.helpers import build_tiny_model_dir, write_wav


@pytest.mark.slow
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

    # GlobalCMVN stats must be IN the trained checkpoint (init_model.py:
    # 102-104): a model trained without them normalizes differently from
    # the serving CLI (which injects the stats from cmvn_file) and decodes
    # garbage — the exact silent train/serve mismatch train_smoke caught
    from reverb_tpu.convert.torch_ckpt import load_npz
    from reverb_tpu.frontend.cmvn import load_cmvn
    trained, _ = load_npz(model_dir / 'epoch_0.npz')
    assert 'global_cmvn' in trained['encoder']
    mean, istd = load_cmvn(str(model_src / 'global_cmvn'), True)
    np.testing.assert_allclose(trained['encoder']['global_cmvn']['mean'],
                               mean, rtol=1e-6)
    np.testing.assert_allclose(trained['encoder']['global_cmvn']['istd'],
                               istd, rtol=1e-6)
    with open(model_dir / 'epoch_1.yaml') as f:
        info = yaml.safe_load(f)
    assert np.isfinite(info['cv_loss'])
    assert info['step'] == 4  # 6 utts / batch 3 = 2 steps/epoch × 2 epochs

    # resume from epoch_0 and keep training
    main(['--config', str(cfg_path), '--train_data', str(train_list),
          '--cv_data', str(cv_list), '--model_dir', str(model_dir),
          '--max_epoch', '2', '--checkpoint',
          str(model_dir / 'epoch_0.npz'), '--log_interval', '1'])


def test_rolling_snapshots(tmp_path):
    """snapshot_saving_conf.use_named_snapshots=False overwrites one rolling
    snapshot[_and_optimizer] file instead of step-tagged checkpoints, and
    run_tag lands in the sidecar metadata (checkpoint.py:153-168)."""
    import jax
    import jax.numpy as jnp
    from reverb_tpu.models.asr_model import ModelConfig, init_params
    from reverb_tpu.models.presets import reverb_tiny
    from reverb_tpu.train.executor import Executor
    from reverb_tpu.train.trainer import (TrainConfig, build_optimizer,
                                          make_train_step, make_eval_step)
    conf = reverb_tiny()
    cfg = ModelConfig.from_config(conf)
    tc = TrainConfig.from_config(conf)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tx, schedule = build_optimizer(tc)
    opt_state = tx.init(params)
    rng = np.random.RandomState(0)
    B, T, L = 2, 67, 4
    batch = {
        'feats': rng.randn(B, T, 80).astype(np.float32),
        'feats_lengths': np.full((B,), T, np.int32),
        'target': rng.randint(1, cfg.vocab_size - 2, (B, L)).astype(np.int32),
        'target_lengths': np.full((B,), L, np.int32),
        'cat_embs': np.tile(np.array([[1.0, 0.0]], np.float32), (B, 1)),
    }
    mdir = tmp_path / 'exp'
    mdir.mkdir()
    ex = Executor(train_step=jax.jit(make_train_step(cfg, tx)),
                  eval_step=jax.jit(make_eval_step(cfg)),
                  model_dir=str(mdir), log_interval=100,
                  save_interval=1, save_optimizer_every=2,
                  schedule=schedule, use_named_snapshots=False,
                  run_tag='exp-rolling')
    ex.train(params, opt_state, [batch] * 3, epoch=0,
             rng=jax.random.PRNGKey(1))
    names = sorted(p.name for p in mdir.glob('*.npz'))
    assert names == ['snapshot.npz', 'snapshot_and_optimizer.npz',
                     'snapshot_and_optimizer.opt.npz'], names
    import yaml as _yaml
    with open(mdir / 'snapshot.yaml') as f:
        info = _yaml.safe_load(f)
    assert info['run_tag'] == 'exp-rolling'
    assert info['step'] == 3   # last odd snapshot (1,3) overwrote step 1


@pytest.mark.slow
def test_train_main_mesh_axes_cli(tmp_path):
    """reverb-train exposes the full mesh: --num_devices_model/seq/expert/
    pipe.  DP2+TP2+PP2 on the 8-virtual-device CPU mesh trains end-to-end
    (pipeline region active: num_blocks=6 leaves a 4-layer homogeneous
    middle for 2 stages; batch 4 splits into 2 microbatches)."""
    import jax
    import yaml as _yaml
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    model_src = build_tiny_model_dir(tmp_path / 'init')
    data_dir = tmp_path / 'data'
    data_dir.mkdir()
    lines = []
    for i in range(8):
        wav = write_wav(data_dir / f'u{i}.wav', seconds=0.5,
                        freq=300 + 40 * i)
        lines.append(json.dumps({'key': f'u{i}', 'wav': str(wav),
                                 'txt': 'a b ab c'}))
    train_list = data_dir / 'train.list'
    train_list.write_text('\n'.join(lines) + '\n')
    cv_list = data_dir / 'cv.list'
    cv_list.write_text('\n'.join(lines[:2]) + '\n')

    with open(model_src / 'config.yaml') as f:
        configs = _yaml.safe_load(f)
    configs['encoder_conf']['num_blocks'] = 6
    configs['dataset_conf'].update({
        'filter_conf': {'max_length': 2000, 'min_length': 5},
        'shuffle': False, 'sort': False,
        'batch_conf': {'batch_type': 'static', 'batch_size': 4},
    })
    configs.update({'optim': 'adam', 'optim_conf': {'lr': 1e-3},
                    'scheduler': 'warmuplr',
                    'scheduler_conf': {'warmup_steps': 4},
                    'max_epoch': 1, 'accum_grad': 1, 'grad_clip': 50.0})
    configs['tokenizer_conf']['symbol_table_path'] = str(
        model_src / 'tk.units.txt')
    configs['tokenizer_conf']['bpe_path'] = str(model_src / 'tk.model')
    configs['cmvn_conf']['cmvn_file'] = str(model_src / 'global_cmvn')
    cfg_path = tmp_path / 'train_config.yaml'
    with open(cfg_path, 'w') as f:
        _yaml.safe_dump(configs, f)

    model_dir = tmp_path / 'exp'
    from reverb_tpu.bin.train import main
    main(['--config', str(cfg_path), '--train_data', str(train_list),
          '--cv_data', str(cv_list), '--model_dir', str(model_dir),
          '--max_epoch', '1', '--log_interval', '1',
          '--num_devices_model', '2', '--num_devices_pipe', '2',
          '--pipeline_microbatches', '2'])
    assert (model_dir / 'epoch_0.npz').exists()
    with open(model_dir / 'epoch_0.yaml') as f:
        info = _yaml.safe_load(f)
    assert np.isfinite(info['cv_loss'])
