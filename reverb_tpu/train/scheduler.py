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
    def schedule(step):
        s = jnp.maximum(step + 1, 1).astype(jnp.float32)
        return lr * jnp.minimum(1.0, s / warmup_steps)
    return schedule


def noam_hold_annealing(lr: float, warmup_steps: int, hold_steps: int,
                        decay_rate: float = 0.5, min_lr: float = 0.0,
                        max_steps: int = 1_000_000) -> Callable:
    """NeMo-style: warmup ∝ step/warmup, hold flat, then (step)^-decay."""
    def schedule(step):
        s = jnp.maximum(step + 1, 1).astype(jnp.float32)
        warm = s / warmup_steps
        hold_end = warmup_steps + hold_steps
        # anneal: lr · ((s - hold) / (max - hold)) ^ -decay … NeMo uses
        # plateau-relative polynomial decay
        t = jnp.clip((s - hold_end) / jnp.maximum(max_steps - hold_end, 1),
                     1e-8, 1.0)
        anneal = (1.0 - t) ** decay_rate
        out = jnp.where(s <= warmup_steps, lr * warm,
                        jnp.where(s <= hold_end, lr, lr * anneal))
        return jnp.maximum(out, min_lr)
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
