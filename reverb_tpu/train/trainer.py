"""pjit training step: optimizer, grad-accum, clipping, freeze rules.

Parity targets:
  - init_optimizer_and_scheduler (adam/adamw/novograd × schedules, resume)
      asr/wenet/utils/train_utils.py:394-469
  - batch_forward/batch_backward amp bf16          train_utils.py:598-656
  - update_parameter_and_lr: clip grad 50, skip non-finite grad norms
      train_utils.py:659-709
  - gradient accumulation (`accum_grad` with no_sync) utils/executor.py:168-174
      → here a lax.scan over micro-batches inside ONE jitted step (no DDP
      no_sync needed: the psum happens once, after accumulation, by design)
  - freeze policies / restrict_learning regex rules  utils/executor.py:57-88,
      287-323 → optax.masked zeroing updates by param-path regex

The whole train step (fwd+bwd+accum+clip+update) is one pjit program over a
('data','model') mesh; gradients reduce over ICI automatically via GSPMD.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import optax

from reverb_tpu.models.asr_model import ModelConfig, compute_loss
from reverb_tpu.parallel.mesh import _path_str
from reverb_tpu.train.scheduler import build_scheduler


def train_prng_key(seed: int, impl: str = 'auto'):
    """Step-loop PRNG key for dropout.

    'auto' picks the partitionable 'rbg' generator on TPU — threefry mask
    generation is VPU-bound and measured ~900x slower than rbg in isolation;
    on the full flagship train step (B=16, T=512) rbg cuts step time
    480→438 ms in f32 and 180→141 ms (22%) in the bf16 AMP path.  rbg is
    the documented JAX choice for TPU training.
    Weight INIT keys stay threefry (seed-stable checkpoints).
    """
    if impl == 'auto':
        impl = 'rbg' if jax.default_backend() == 'tpu' else 'threefry2x32'
    return jax.random.key(seed, impl=impl)


@dataclasses.dataclass
class TrainConfig:
    optim: str = 'adam'
    optim_conf: Dict = dataclasses.field(default_factory=lambda: {'lr': 1e-3})
    scheduler: str = 'warmuplr'
    scheduler_conf: Dict = dataclasses.field(
        default_factory=lambda: {'warmup_steps': 25000})
    grad_clip: float = 50.0
    accum_grad: int = 1
    freeze_modules: List[str] = dataclasses.field(default_factory=list)
    restrict_learning: Optional[List[Dict[str, str]]] = None

    @staticmethod
    def from_config(configs: Dict) -> 'TrainConfig':
        return TrainConfig(
            optim=configs.get('optim', 'adam'),
            optim_conf=dict(configs.get('optim_conf', {'lr': 1e-3})),
            scheduler=configs.get('scheduler', 'warmuplr'),
            scheduler_conf=dict(configs.get('scheduler_conf', {}) or {}),
            grad_clip=configs.get('grad_clip', 50.0),
            accum_grad=configs.get('accum_grad', 1),
            freeze_modules=list(configs.get('freeze_modules', []) or []),
            restrict_learning=configs.get('restrict_learning'))


def trainable_mask(params, tc: TrainConfig):
    """Boolean pytree: False → parameter frozen.

    Implements both `freeze_modules` prefixes and the Rev `restrict_learning`
    include/exclude regex list (executor.py:295-323: a param trains if it
    matches any include rule and no exclude rule that precedes it; we apply
    rules in order, first match wins, default trainable)."""
    rules = []
    for item in (tc.restrict_learning or []):
        if 'include' in item:
            rules.append((re.compile(item['include']), True))
        if 'exclude' in item:
            rules.append((re.compile(item['exclude']), False))

    def decide(path, leaf):
        s = _path_str(path)
        # buffers, not weights (torch registers these as non-trainable):
        # CMVN stats must stay exactly what the serving CLI loads from
        # cmvn_file, or train/serve normalization silently diverges
        if 'global_cmvn' in s:
            return False
        for prefix in tc.freeze_modules:
            if s.startswith(prefix):
                return False
        for pat, keep in rules:
            if pat.search(s):
                return keep
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def build_optimizer(tc: TrainConfig, params=None):
    """optax chain: adam/adamw/novograd → scheduled lr, with frozen-param
    masking.  Global-norm clipping lives in make_train_step (single norm
    pass).  Returns (optimizer, schedule_fn)."""
    lr = tc.optim_conf.get('lr', 1e-3)
    schedule = build_scheduler(tc.scheduler, lr, tc.scheduler_conf)
    kwargs = {}
    if 'betas' in tc.optim_conf:
        b1, b2 = tc.optim_conf['betas']
        kwargs.update(b1=b1, b2=b2)
    if 'eps' in tc.optim_conf:
        kwargs.update(eps=tc.optim_conf['eps'])
    # optim_conf.mu_dtype (e.g. 'bfloat16'): store adam's FIRST moment in
    # reduced precision.  The optimizer pass is pure HBM traffic (~28 B/param
    # f32 — measured ~21 ms of the flagship step, already bandwidth-bound);
    # bf16 mu cuts 4 B/param read+write.  nu stays f32 (second-moment
    # precision drives the update's rsqrt).  Standard practice at scale; the
    # learning-loop gate (tools/train_smoke.py) pins convergence.
    if tc.optim_conf.get('mu_dtype'):
        kwargs.update(mu_dtype=tc.optim_conf['mu_dtype'])
    wd = tc.optim_conf.get('weight_decay', 0.0)
    name = tc.optim.lower()
    if name == 'adam':
        base = optax.adam(schedule, **kwargs) if wd == 0 else \
            optax.adamw(schedule, weight_decay=wd, **kwargs)
    elif name == 'adamw':
        base = optax.adamw(schedule, weight_decay=wd, **kwargs)
    elif name == 'novograd':
        base = optax.novograd(schedule, weight_decay=wd,
                              **{k: v for k, v in kwargs.items()})
    else:
        raise ValueError(f'unknown optimizer {tc.optim!r}')
    # clipping happens inside make_train_step with a SINGLE global-norm
    # pass (the norm is also needed for the non-finite skip + metric; a
    # clip_by_global_norm in the chain would read all grads a second time —
    # measured 12 ms/step on the flagship)
    tx = base
    if params is not None:
        # zero the FINAL updates of frozen params (so adamw weight decay
        # can't touch them either); always applied — buffers like the CMVN
        # stats are frozen even with no user freeze rules
        mask = trainable_mask(params, tc)
        frozen = jax.tree.map(lambda b: not b, mask)
        if not jax.tree.all(mask):
            tx = optax.chain(tx, optax.masked(optax.set_to_zero(), frozen))
    return tx, schedule


def make_train_step(cfg: ModelConfig, tx, accum_grad: int = 1,
                    loss_fn=None, grad_clip: float = 0.0, frontend=None):
    """Returns train_step(params, opt_state, batch, step, rng) → (params,
    opt_state, metrics).

    grad_clip > 0 applies global-norm clipping (optax semantics: scale by
    clip/‖g‖ when ‖g‖ ≥ clip) reusing the one norm pass shared with the
    non-finite skip and the grad_norm metric.

    loss_fn(params, batch, rng) → metrics dict with 'loss' — defaults to the
    hybrid CTC/attention compute_loss; teacher-student distillation and the
    registry's other model families plug in here.

    With accum_grad>1 the batch's leading dim is (accum·micro_b) and a
    lax.scan accumulates micro-batch grads before ONE optimizer update —
    numerically the reference's loss/accum_grad + no_sync pattern
    (train_utils.py:629-656)."""
    if loss_fn is None:
        def loss_fn(params, batch, rng):     # noqa: F811
            return compute_loss(params, cfg, batch, rng=rng)

    def wrapped(params, batch, rng):
        if frontend is not None:
            # device-side fbank + SpecAugment (dataset_conf.device_feats,
            # frontend/device_feats.py) under the step's own PRNG
            from reverb_tpu.frontend.device_feats import apply_frontend
            fe_rng = None
            if rng is not None:
                rng, fe_rng = jax.random.split(rng)
            batch = apply_frontend(batch, frontend, fe_rng)
        # sequence parallelism: hint the feature time axis over the mesh's
        # Auto 'seq' axis; XLA propagates through the encoder (halo exchange
        # for the subsample convs, all-gathers for attention scores) — no-op
        # on meshes without a >1 'seq' axis.
        from reverb_tpu.parallel.mesh import constrain
        if 'feats' in batch:
            batch = dict(batch, feats=constrain(batch['feats'],
                                                None, 'seq', None))
        out = loss_fn(params, batch, rng)
        metrics = {k: (v if v is not None else jnp.zeros(()))
                   for k, v in out.items()}
        return out['loss'], metrics

    grad_fn = jax.value_and_grad(wrapped, has_aux=True)
    # NOTE (measured non-result): batching the ~900 per-leaf global-norm
    # reductions (concat small leaves → one reduce, vdot per big leaf) made
    # the step 10× SLOWER at B=16 — the concat adds a materialization
    # barrier XLA's scheduler pays for dearly.  optax.global_norm's
    # per-leaf reduces fuse into the surrounding grad pipeline; keep them.

    def train_step(params, opt_state, batch, step, rng):
        # the step counter and PRNG advance INSIDE the compiled program
        # (reserved '_next_step'/'_next_rng' metrics): a separate scalar
        # add / key split per step is an extra tiny dispatch the training
        # loop pays for at host-RPC latency (~3 ms each over a remote-TPU
        # link; 213.6 → 184.3 ms/step measured on the B=32 flagship)
        next_rng = None
        if rng is not None:
            next_rng, rng = jax.random.split(rng)
        if accum_grad == 1:
            (loss, metrics), grads = grad_fn(params, batch, rng)
        else:
            def split(x):
                return x.reshape((accum_grad, x.shape[0] // accum_grad)
                                 + x.shape[1:])
            micro = jax.tree.map(split, batch)
            has_rng = rng is not None
            rngs = (jax.random.split(rng, accum_grad) if has_rng
                    else jnp.zeros((accum_grad, 2), jnp.uint32))

            def body(acc_g, inp):
                mb, r = inp
                (l, m), g = grad_fn(params, mb, r if has_rng else None)
                return jax.tree.map(jnp.add, acc_g, g), m

            zero_g = jax.tree.map(jnp.zeros_like, params)
            grads, mstack = jax.lax.scan(body, zero_g, (micro, rngs))
            grads = jax.tree.map(lambda g: g / accum_grad, grads)
            metrics = jax.tree.map(lambda m: jnp.mean(m, axis=0), mstack)

        grad_norm = optax.global_norm(grads)
        finite = jnp.isfinite(grad_norm)
        # clip + zero-on-non-finite in one fused per-leaf elementwise pass
        # (train_utils.py:659-709: clip 50.0 then skip non-finite norms)
        ratio = jnp.where(grad_norm < grad_clip, 1.0,
                          grad_clip / grad_norm) if grad_clip > 0.0 else 1.0
        scale = jnp.where(finite, ratio, 0.0)
        safe_grads = jax.tree.map(lambda g: g * scale.astype(g.dtype), grads)
        updates, new_opt = tx.update(safe_grads, opt_state, params)
        # masked updates: params stay put on skip without a revert pass
        updates = jax.tree.map(
            lambda u: jnp.where(finite, u, jnp.zeros_like(u)), updates)
        new_params = optax.apply_updates(params, updates)
        # optimizer moments/count must not advance on a skipped step
        new_opt = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old), new_opt, opt_state)
        metrics = dict(metrics)
        metrics['grad_norm'] = grad_norm
        metrics['skipped'] = (~finite).astype(jnp.float32)
        metrics['_next_step'] = step + 1
        if next_rng is not None:
            metrics['_next_rng'] = next_rng
        return new_params, new_opt, metrics

    return train_step


def make_eval_step(cfg: ModelConfig, loss_fn=None, frontend=None):
    if loss_fn is None:
        def loss_fn(params, batch, rng):     # noqa: F811
            return compute_loss(params, cfg, batch, rng=rng)

    def eval_step(params, batch):
        if frontend is not None:
            # rng=None: deterministic CV features (no dither / SpecAugment),
            # matching the host pipeline's cv_conf
            from reverb_tpu.frontend.device_feats import apply_frontend
            batch = apply_frontend(batch, frontend, None)
        out = loss_fn(params, batch, None)
        return {k: (v if v is not None else jnp.zeros(()))
                for k, v in out.items()}
    return eval_step
