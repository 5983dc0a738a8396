"""LoRA fine-tuning as a pure param-tree transform.

Parity: asr/wenet/finetune/lora/layers.py:101-174 + encoder wrappers
(lora/encoder.py:37-91) and the CLI knobs (utils/train_utils.py:134-159) —
rank-r adapters on attention q/k/v/o projections.

Design: instead of wrapper modules, `inject_lora` adds {lora_A, lora_B,
lora_scale} entries into the targeted Linear param dicts; `modules.linear`
applies them transparently; `merge_lora` folds ΔW = scale·BᵀA… into the base
weight for deployment; `lora_trainable_mask` freezes everything else.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_TARGETS = ('linear_q', 'linear_k', 'linear_v', 'linear_out')


def _walk(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, path + (k,))
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            yield from _walk(v, path + (str(i),))
    else:
        yield path, tree


def inject_lora(params, rng, rank: int = 8, alpha: int = 8,
                targets: List[str] = DEFAULT_TARGETS):
    """Add LoRA adapters to every Linear whose parent key is in `targets`."""
    def visit_child(node, key):
        if isinstance(node, dict):
            if key in targets and 'weight' in node and \
                    getattr(node.get('weight'), 'ndim', 0) == 2 and \
                    'lora_A' not in node:
                w = node['weight']
                out_f, in_f = w.shape
                nonlocal rng
                rng, sub = jax.random.split(rng)
                node = dict(node)
                node['lora_A'] = jax.random.normal(
                    sub, (rank, in_f), jnp.float32) * (1.0 / rank)
                node['lora_B'] = jnp.zeros((out_f, rank), jnp.float32)
                node['lora_scale'] = jnp.asarray(alpha / rank, jnp.float32)
                return node
            return {k: visit_child(v, k) for k, v in node.items()}
        if isinstance(node, list):
            return [visit_child(v, str(i)) for i, v in enumerate(node)]
        return node

    return visit_child(params, '')


def merge_lora(params):
    """Fold adapters into base weights (deployment)."""
    def visit(node):
        if isinstance(node, dict):
            if 'lora_A' in node:
                node = dict(node)
                delta = (node['lora_B'] @ node['lora_A']) * node['lora_scale']
                node['weight'] = node['weight'] + delta
                for k in ('lora_A', 'lora_B', 'lora_scale'):
                    node.pop(k)
                return node
            return {k: visit(v) for k, v in node.items()}
        if isinstance(node, list):
            return [visit(v) for v in node]
        return node
    return visit(params)


def lora_trainable_mask(params):
    """True only for lora_A/lora_B leaves (freeze the base model)."""
    def visit(node, key):
        if isinstance(node, dict):
            return {k: visit(v, k) for k, v in node.items()}
        if isinstance(node, list):
            return [visit(v, key) for v in node]
        return key in ('lora_A', 'lora_B')
    return visit(params, '')
