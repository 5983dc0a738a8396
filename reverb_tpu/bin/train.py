"""Training entrypoint.

Parity: asr/wenet/bin/train.py:64-216 — config load + overrides → tokenizer →
datasets → model init (or resume / partial init) → optimizer/scheduler (with
set_step resume) → epoch loop {train, cv, save epoch ckpt + yaml} → final
dataset drop-stat dump.

SPMD replaces torchrun: one python process drives the whole
('data','model') mesh; multi-host runs call jax.distributed.initialize
(--coordinator) and keep the same code path (jax arrays become globally
sharded).  Gradient allreduce is XLA's, not a DDP hook.
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml


def get_args(argv=None):
    p = argparse.ArgumentParser(description='train a reverb-tpu model')
    p.add_argument('--config', required=True)
    p.add_argument('--data_type', default='raw', choices=['raw', 'shard'])
    p.add_argument('--train_data', required=True)
    p.add_argument('--cv_data', required=True)
    p.add_argument('--model_dir', required=True)
    p.add_argument('--checkpoint', default=None,
                   help='resume/init checkpoint (.npz or torch .pt)')
    p.add_argument('--override_config', action='append', default=[])
    p.add_argument('--max_epoch', type=int, default=None)
    p.add_argument('--steps_per_epoch', type=int, default=None)
    p.add_argument('--num_devices_model', type=int, default=1,
                   help='tensor-parallel mesh axis size')
    p.add_argument('--num_devices_seq', type=int, default=1,
                   help="sequence-parallel 'seq' mesh axis size (encoder "
                        'time dim sharded for long-form batches)')
    p.add_argument('--num_devices_expert', type=int, default=1,
                   help="expert-parallel 'expert' mesh axis size (MoE FFN)")
    p.add_argument('--num_devices_pipe', type=int, default=1,
                   help="GPipe pipeline 'pipe' mesh axis size: the "
                        'homogeneous middle conformer stack runs as '
                        'N stages (sets encoder_conf.pipeline_stages '
                        'unless the config pins it)')
    p.add_argument('--pipeline_microbatches', type=int, default=None,
                   help='GPipe microbatches (default '
                        'encoder_conf.pipeline_microbatches or 2)')
    p.add_argument('--zero3', action='store_true',
                   help="ZeRO-3: shard params over 'data' (gather-on-use); "
                        'each device stores 1/N of the weights')
    p.add_argument('--stall_timeout_s', type=float, default=1800.0,
                   help='straggler watchdog: abort/diagnose when no step '
                        'completes for this long (0 disables; '
                        'REVERB_STALL_EXIT=1 hard-exits for supervisor '
                        'restart — the wenet_join timeout equivalent)')
    p.add_argument('--coordinator', default=None,
                   help='jax.distributed coordinator addr for multi-host')
    p.add_argument('--num_processes', type=int, default=1)
    p.add_argument('--process_id', type=int, default=0)
    p.add_argument('--tensorboard_dir', default=None)
    p.add_argument('--seed', type=int, default=777)
    p.add_argument('--prng_impl', default='auto',
                   choices=['auto', 'threefry2x32', 'rbg'],
                   help='dropout PRNG; auto = rbg on TPU (threefry mask '
                        'generation is ~900x slower there)')
    p.add_argument('--log_interval', type=int, default=100)
    p.add_argument('--enc_init', default=None,
                   help='partial-init checkpoint (load_trained_modules)')
    p.add_argument('--enc_init_mods', default='encoder.',
                   help='comma-separated module prefixes for --enc_init')
    p.add_argument('--profile_dir', default=None,
                   help='write a jax.profiler xplane trace here')
    p.add_argument('--profile_start_step', type=int, default=10)
    p.add_argument('--profile_num_steps', type=int, default=5)
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    logging.basicConfig(
        level=logging.INFO,
        format='%(asctime)s %(filename)s %(levelname)s: %(message)s')

    if args.coordinator:
        jax.distributed.initialize(args.coordinator, args.num_processes,
                                   args.process_id)

    from reverb_tpu.data.dataset import Dataset
    from reverb_tpu.models.asr_model import ModelConfig, init_params
    from reverb_tpu.parallel.mesh import (make_mesh, opt_state_shardings,
                                          param_shardings)
    from reverb_tpu.text.tokenizer import init_tokenizer
    from reverb_tpu.train.checkpoint import (load_checkpoint,
                                             load_trained_modules,
                                             save_checkpoint)
    from reverb_tpu.train.executor import Executor
    from reverb_tpu.train.trainer import (TrainConfig, build_optimizer,
                                          make_eval_step, make_train_step,
                                          train_prng_key)
    from reverb_tpu.utils.config import (check_modify_and_save_config,
                                         override_config)

    with open(args.config) as f:
        configs = yaml.safe_load(f)
    configs = override_config(configs, args.override_config)
    if args.num_devices_pipe > 1:
        # the GPipe region activates when encoder_conf.pipeline_stages
        # matches the mesh's 'pipe' axis (models/encoder.py)
        enc_conf = dict(configs.get('encoder_conf', {}))
        enc_conf.setdefault('pipeline_stages', args.num_devices_pipe)
        if args.pipeline_microbatches:
            enc_conf['pipeline_microbatches'] = args.pipeline_microbatches
        configs['encoder_conf'] = enc_conf

    tokenizer = init_tokenizer(configs)
    configs = check_modify_and_save_config(args, configs,
                                           tokenizer.symbol_table)

    rank = jax.process_index()
    world = jax.process_count()
    ds_conf = configs['dataset_conf']
    cv_conf = dict(ds_conf)
    # CV disables augmentation (train_utils.py:301-349)
    for k in ('spec_aug', 'spec_sub', 'spec_trim', 'speed_perturb',
              'apply_telephony', 'apply_rir'):
        cv_conf[k] = False
    cv_conf['shuffle'] = False
    cv_conf['cycle'] = 1

    def make_train_ds(epoch):
        return Dataset(args.data_type, args.train_data, tokenizer, ds_conf,
                       partition=True, rank=rank, world_size=world,
                       seed=args.seed + epoch).prefetch(8)

    def make_cv_ds():
        return Dataset(args.data_type, args.cv_data, tokenizer, cv_conf,
                       partition=False)

    cfg = ModelConfig.from_config(configs)
    tc = TrainConfig.from_config(configs)
    loss_fn = None

    model_kind = configs.get('model', 'asr_model')
    alt_encoders = ('branchformer', 'e_branchformer', 'squeezeformer',
                    'efficient_conformer')
    if model_kind != 'asr_model' or configs.get('encoder') in alt_encoders:
        # registry-constructed family (transducer/paraformer/ssl/alt
        # encoders): uniform loss_fn bundle (init_model.py parity)
        from reverb_tpu.models.registry import init_model
        bundle = init_model(configs, jax.random.PRNGKey(args.seed))
        params = bundle.params
        loss_fn = bundle.loss_fn
        logging.info('training registry model %r', bundle.kind)
    else:
        # GlobalCMVN stats live IN the params from construction
        # (init_model.py:102-104): trained checkpoints must normalize with
        # the same stats the serving CLI applies
        from reverb_tpu.frontend.cmvn import load_cmvn_from_configs
        params = init_params(jax.random.PRNGKey(args.seed), cfg,
                             cmvn=load_cmvn_from_configs(configs))

    if configs.get('ts_conf'):
        # teacher-student distillation (init_model.py:125-135,
        # bin/train.teacher-student.py): frozen teacher from its own yaml+ckpt
        from reverb_tpu.convert.torch_ckpt import (load_npz,
                                                   load_reverb_checkpoint)
        from reverb_tpu.train.teacher_student import TSConfig, ts_loss
        import dataclasses as _dc
        ts_c = configs['ts_conf']
        with open(ts_c['teacher_yaml']) as f:
            t_configs = yaml.safe_load(f)
        teacher_cfg = ModelConfig.from_config(t_configs)
        t_ckpt = ts_c['teacher_checkpoint']
        teacher_params = (load_npz(t_ckpt)[0] if t_ckpt.endswith('.npz')
                          else load_reverb_checkpoint(t_ckpt))
        teacher_params = jax.tree.map(jnp.asarray, teacher_params)
        ts_fields = {f.name for f in _dc.fields(TSConfig)}
        tsc = TSConfig(**{k: v for k, v in ts_c.items() if k in ts_fields})

        def loss_fn(p, batch, rng):          # noqa: F811
            # distillation defines the full objective (student reg included)
            return ts_loss(p, teacher_params, cfg, teacher_cfg, batch, tsc,
                           rng=rng)
        logging.info('teacher-student distillation enabled (teacher=%s)',
                     t_ckpt)

    if args.enc_init:
        params = load_trained_modules(params, args.enc_init,
                                      args.enc_init_mods.split(','))
    tx, schedule = build_optimizer(tc, params)
    opt_state = tx.init(params)

    start_epoch, start_step = 0, 0
    if args.checkpoint:
        params, restored_opt, info = load_checkpoint(args.checkpoint,
                                                     opt_state)
        if restored_opt is not None:
            opt_state = restored_opt
        start_epoch = int(info.get('epoch', 0))
        start_step = int(info.get('step', 0))     # scheduler.set_step resume
        logging.info('resumed from %s at epoch %d step %d', args.checkpoint,
                     start_epoch, start_step)

    mesh = make_mesh(model=args.num_devices_model,
                     seq=args.num_devices_seq,
                     expert=args.num_devices_expert,
                     pipe=args.num_devices_pipe)
    # keep Pallas kernels (flash attention fwd/bwd) live under the mesh:
    # they shard_map themselves over ('data','model') when shapes divide
    from reverb_tpu.ops.pallas_mesh import set_pallas_mesh
    set_pallas_mesh(mesh)
    p_shard = param_shardings(params, mesh, zero3=args.zero3)
    o_shard = opt_state_shardings(opt_state, params, mesh)
    params = jax.device_put(params, p_shard)
    opt_state = jax.device_put(opt_state, o_shard)

    # dataset_conf.device_feats: fbank + SpecAugment on device inside the
    # step (frontend/device_feats.py) — host pipeline ships raw PCM only
    from reverb_tpu.frontend.device_feats import frontend_from_configs
    frontend = frontend_from_configs(configs)
    train_step = jax.jit(make_train_step(cfg, tx, tc.accum_grad,
                                         loss_fn=loss_fn,
                                         grad_clip=tc.grad_clip,
                                         frontend=frontend),
                         donate_argnums=(0, 1))
    eval_step = jax.jit(make_eval_step(cfg, loss_fn=loss_fn,
                                       frontend=frontend))

    # experiment tracking (wandb/tensorboard/jsonl; train_utils.py:495-533)
    from reverb_tpu.utils.tracking import init_tracking
    tracker = init_tracking(args.model_dir, configs,
                            train_data=args.train_data, cv_data=args.cv_data,
                            tensorboard_dir=args.tensorboard_dir)

    snap_conf = configs.get('snapshot_saving_conf', {}) or {}
    ex = Executor(train_step=train_step, eval_step=eval_step,
                  model_dir=args.model_dir,
                  log_interval=args.log_interval,
                  save_interval=snap_conf.get('save_interval', 0),
                  save_optimizer_every=snap_conf.get('save_optimizer_every',
                                                     4),
                  schedule=schedule, writer=tracker,
                  save_to_tracker=bool(snap_conf.get('save_to_wandb')),
                  use_named_snapshots=bool(
                      snap_conf.get('use_named_snapshots', True)),
                  run_tag=snap_conf.get('run_tag'),
                  mesh=mesh,
                  step=start_step)
    if args.stall_timeout_s > 0:
        from reverb_tpu.train.watchdog import StepWatchdog
        ex.watchdog = StepWatchdog(args.stall_timeout_s)
    if args.profile_dir:
        from reverb_tpu.utils.profiling import ProfileWindow
        ex.profiler = ProfileWindow(args.profile_dir,
                                    args.profile_start_step,
                                    args.profile_num_steps)

    max_epoch = args.max_epoch or configs.get('max_epoch', 100)
    rng = train_prng_key(args.seed, args.prng_impl)   # rbg on TPU
    with jax.set_mesh(mesh):
        for epoch in range(start_epoch, max_epoch):
            rng, sub = jax.random.split(rng)
            params, opt_state = ex.train(
                params, opt_state, make_train_ds(epoch), epoch, sub,
                cv_dataset=make_cv_ds() if snap_conf.get('save_interval')
                else None,
                max_steps=(args.steps_per_epoch * (epoch + 1)
                           if args.steps_per_epoch else None))
            from reverb_tpu.train.watchdog import epoch_barrier
            epoch_barrier(f'epoch_{epoch}')
            cv_metrics = ex.cv(params, make_cv_ds())
            logging.info('epoch %d CV: %s', epoch, cv_metrics)
            if rank == 0:
                save_checkpoint(
                    args.model_dir, f'epoch_{epoch}', params, opt_state,
                    {'epoch': epoch, 'step': ex.step,
                     'frames_seen': ex.frames_seen,
                     'lr': float(schedule(ex.step)),
                     'cv_loss': cv_metrics.get('loss')})
    tracker.finish()
    from reverb_tpu.data.pipeline import mystats
    logging.info('dataset statistics: %s', dict(mystats))


if __name__ == '__main__':
    main()
