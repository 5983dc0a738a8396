"""LR schedules as pure step→lr functions (optax-compatible callables).

Parity targets (asr/wenet/utils/scheduler.py):
  - WarmupLR (:28-73):  lr · warmup^0.5 · min(step^-0.5, step·warmup^-1.5)
  - NoamHoldAnnealing (:625-718): noam warmup, hold plateau, ^-decay anneal
  - CosineAnnealing (:498-540)
  - SteadyLR (:721-757): constant after warmup
All support `set_step` resume semantics trivially (stateless functions of
step).  Steps are 1-based like the torch _LRScheduler convention.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def warmup_lr(lr: float, warmup_steps: int = 25000) -> Callable:
    def schedule(step):
        s = jnp.maximum(step + 1, 1).astype(jnp.float32)
        return lr * warmup_steps ** 0.5 * jnp.minimum(
            s ** -0.5, s * warmup_steps ** -1.5)
    return schedule


def steady_lr(lr: float, warmup_steps: int = 25000) -> Callable:
    """Constant lr.  The reference SteadyLR (scheduler.py:721-757) accepts
    warmup_steps but its get_lr ignores it and always returns base lr —
    matched exactly (verified in tests/test_reference_parity.py)."""
    del warmup_steps
    def schedule(step):
        return jnp.full((), lr, jnp.float32)
    return schedule


def noam_hold_annealing(lr: float, warmup_steps: int, hold_steps: int,
                        decay_rate: float = 0.5, min_lr: float = 0.0,
                        max_steps: int = 1_000_000) -> Callable:
    """Exact reference semantics (scheduler.py:434-442, 625-718): linear
    warmup lr·(s+1)/(warmup+1), hold at peak through warmup+hold, then noam
    polynomial decay lr·warmup^decay/(s−hold)^decay clamped at min_lr;
    min_lr after max_steps (WarmupPolicy.get_lr:119-125).  Verified
    step-for-step vs the reference in tests/test_reference_parity.py."""
    def schedule(step):
        s = jnp.maximum(step, 0).astype(jnp.float32)
        warm = lr * (s + 1.0) / (warmup_steps + 1.0)
        t_warm = max(1.0, warmup_steps ** decay_rate)
        decay = lr * t_warm / jnp.maximum(s - hold_steps, 1.0) ** decay_rate
        decay = jnp.maximum(decay, min_lr)
        out = jnp.where(s <= warmup_steps, warm,
                        jnp.where(s <= warmup_steps + hold_steps, lr, decay))
        return jnp.where(s > max_steps, min_lr, out)
    return schedule


def cosine_annealing(lr: float, warmup_steps: int, max_steps: int,
                     min_lr: float = 0.0) -> Callable:
    def schedule(step):
        s = jnp.maximum(step + 1, 1).astype(jnp.float32)
        warm = lr * s / jnp.maximum(warmup_steps, 1)
        t = jnp.clip((s - warmup_steps) / jnp.maximum(
            max_steps - warmup_steps, 1), 0.0, 1.0)
        cos = min_lr + 0.5 * (lr - min_lr) * (1 + jnp.cos(math.pi * t))
        return jnp.where(s <= warmup_steps, warm, cos)
    return schedule


def build_scheduler(name: str, lr: float, conf: dict) -> Callable:
    """Dispatch on configs['scheduler'] (train_utils.py:420-429)."""
    name = name.lower()
    conf = conf or {}
    if name == 'warmuplr':
        return warmup_lr(lr, conf.get('warmup_steps', 25000))
    if name == 'steadylr':
        return steady_lr(lr, conf.get('warmup_steps', 25000))
    if name == 'noamholdannealing':
        return noam_hold_annealing(
            lr, conf.get('warmup_steps', 25000),
            conf.get('hold_steps', 0),
            conf.get('decay_rate', 0.5), conf.get('min_lr', 0.0),
            conf.get('max_steps', 1_000_000))
    if name == 'cosineannealing':
        return cosine_annealing(lr, conf.get('warmup_steps', 25000),
                                conf.get('max_steps', 1_000_000),
                                conf.get('min_lr', 0.0))
    raise ValueError(f'unknown scheduler {name!r}')
