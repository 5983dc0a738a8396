"""Training executor: epoch loop, CV, snapshots, telemetry.

Parity targets:
  - Executor.train/cv                asr/wenet/utils/executor.py:51-285
    (mid-epoch step snapshots every save_interval with CV run, full snapshot
     every save_optimizer_every-th, frames-seen telemetry, straggler-safe
     fixed-steps semantics instead of gloo join)
  - epoch loop / ckpt metadata yaml  asr/wenet/bin/train.py:140-196
  - log_per_step                     utils/train_utils.py:712-764

Straggler/uneven-data handling: the reference joins ranks via gloo
monitored_barrier (train_utils.py:569-595).  Under SPMD there is one program
and the input pipeline is rank-sharded host-side; uneven data is handled by
cycling the dataset and stopping on a step budget — no join barrier needed.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from reverb_tpu.data.pipeline import mystats
from reverb_tpu.train.checkpoint import (save_checkpoint,
                                         should_force_snapshot)


def _device_batch(batch: Dict, mesh=None) -> Dict:
    """Drop host-only fields; ship arrays to the mesh as globally-sharded
    arrays (multi-process: each process contributes its local slice via
    jax.make_array_from_process_local_data — parallel/mesh.py put_batch)."""
    from reverb_tpu.parallel.mesh import put_batch
    keep = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    return put_batch(keep, mesh)


@dataclass
class Executor:
    train_step: Callable
    eval_step: Callable
    model_dir: str
    log_interval: int = 100
    save_interval: int = 0              # mid-epoch snapshot cadence (steps)
    save_optimizer_every: int = 4       # every Nth snapshot keeps optimizer
    schedule: Optional[Callable] = None
    writer: Optional[object] = None     # tensorboard-like .add_scalar
    save_to_tracker: bool = False       # snapshot_saving_conf.save_to_wandb
    # snapshot_saving_conf.use_named_snapshots (checkpoint.py:157-168):
    # True → one checkpoint per step tag; False → overwrite a single rolling
    # 'snapshot[_and_optimizer]' file (bounded disk)
    use_named_snapshots: bool = True
    run_tag: Optional[str] = None       # snapshot_saving_conf.run_tag
    mesh: Optional[object] = None       # jax Mesh for global batch placement
    step: int = 0
    frames_seen: float = 0.0
    snapshots_taken: int = 0
    profiler: Optional[object] = None   # utils.profiling.ProfileWindow
    # multi-host stall detection (train/watchdog.py — the wenet_join
    # monitored_barrier equivalent); None disables
    watchdog: Optional[object] = None

    def train(self, params, opt_state, dataset: Iterable, epoch: int,
              rng, cv_dataset: Optional[Iterable] = None,
              max_steps: Optional[int] = None):
        """The step counter and PRNG chain live ON DEVICE across steps:
        make_train_step returns them as reserved '_next_step'/'_next_rng'
        metrics, so the steady-state loop issues exactly ONE dispatch per
        step (a host-side scalar upload, `+1` add, or key split each cost
        a full RPC round-trip over a remote-TPU link — together ~30 ms of
        the flagship's 213 ms step before this)."""
        t0 = time.time()
        step_dev = None
        sub = None
        for batch in dataset:
            if max_steps is not None and self.step >= max_steps:
                break
            if self.watchdog is not None:
                self.watchdog.check()
            if self.profiler is not None:
                self.profiler.maybe_start(self.step)
            db = _device_batch(batch, self.mesh)
            if sub is None:
                rng, sub = jax.random.split(rng)
            if step_dev is None:
                step_dev = jnp.asarray(self.step, jnp.int32)
            params, opt_state, metrics = self.train_step(
                params, opt_state, db, step_dev, sub)
            step_dev = metrics.pop('_next_step', None)
            sub = metrics.pop('_next_rng', None)
            if self.profiler is not None:
                self.profiler.maybe_stop(self.step)
            self.step += 1
            if self.watchdog is not None:
                self.watchdog.beat(self.step)
            self.frames_seen += float(np.sum(batch['feats_lengths']))
            if self.step % self.log_interval == 0:
                self._log('TRAIN', epoch, metrics, t0)
                t0 = time.time()
            if self.save_interval and self.step % self.save_interval == 0:
                self._snapshot(params, opt_state, epoch, cv_dataset)
        if self.profiler is not None:
            self.profiler.close()
        return params, opt_state

    def cv(self, params, dataset: Iterable) -> Dict[str, float]:
        tot: Dict[str, float] = {}
        n = 0
        for batch in dataset:
            db = _device_batch(batch, self.mesh)
            m = self.eval_step(params, db)
            bs = batch['feats'].shape[0]
            for k, v in m.items():
                tot[k] = tot.get(k, 0.0) + float(v) * bs
            n += bs
        return {k: v / max(n, 1) for k, v in tot.items()}

    # ------------------------------ internals ------------------------------

    def _snapshot(self, params, opt_state, epoch, cv_dataset):
        self.snapshots_taken += 1
        with_opt = (self.save_optimizer_every > 0 and
                    self.snapshots_taken % self.save_optimizer_every == 0)
        if should_force_snapshot(self.model_dir):
            with_opt = True
        info = {'step': self.step, 'epoch': epoch,
                'frames_seen': self.frames_seen,
                'lr': float(self.schedule(self.step)) if self.schedule
                else None,
                'tag': f'step_{self.step}'}
        if self.run_tag:
            info['run_tag'] = self.run_tag
        if cv_dataset is not None:
            cv_metrics = self.cv(params, cv_dataset)
            info['cv_loss'] = cv_metrics.get('loss')
            logging.info('CV at step %d: %s', self.step, cv_metrics)
        name = (f'step_{self.step}' if self.use_named_snapshots
                else ('snapshot_and_optimizer' if with_opt else 'snapshot'))
        path = save_checkpoint(self.model_dir, name, params,
                               opt_state if with_opt else None, info)
        if self.save_to_tracker and hasattr(self.writer, 'log_artifact'):
            # ckpt artifact upload (utils/checkpoint.py:180-190)
            self.writer.log_artifact(f'ckpt-step_{self.step}', 'checkpoint',
                                     {path.name: str(path),
                                      f'{name}.yaml':
                                      str(path.with_suffix('.yaml'))})

    def _log(self, tag, epoch, metrics, t0):
        lr = float(self.schedule(self.step)) if self.schedule else float('nan')
        msg = {k: round(float(v), 4) for k, v in metrics.items()}
        logging.info('%s epoch %d step %d lr %.3e %s (%.2fs/%d steps, '
                     'stats %s)', tag, epoch, self.step, lr, msg,
                     time.time() - t0, self.log_interval, dict(mystats))
        if self.writer is not None:
            for k, v in metrics.items():
                self.writer.add_scalar(f'{tag.lower()}/{k}', float(v),
                                       self.step)
            self.writer.add_scalar('train/lr', lr, self.step)
