"""Checkpointing: save/load params (+ optimizer state) with sidecar yaml.

Parity targets (asr/wenet/utils/checkpoint.py):
  - ckpt = {model0, optimizer0} + sibling `.yaml` metadata (step, epoch, lr,
    frames seen)                       checkpoint.py:114-176
  - load_checkpoint / partial init (load_trained_modules)  :218-239
  - operator-triggered full snapshot via a `force_full_snapshot` flag file in
    model_dir                          :241-264
  - checkpoint averaging (best/last N) bin/average_model.py

Format here: flat .npz of dotted param paths (convert/torch_ckpt.py) — fast,
dependency-free, and byte-stable; orbax-style async sharded saving can layer
on top for multi-host later.
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Dict, List, Optional

import jax
import numpy as np
import yaml

from reverb_tpu.convert.torch_ckpt import (flatten_params, load_npz,
                                           nest_state_dict, save_npz)

FORCE_SNAPSHOT_FLAG = 'force_full_snapshot'


def save_checkpoint(model_dir, tag: str, params, opt_state=None,
                    info: Optional[Dict] = None):
    """Write `<model_dir>/<tag>.npz` (+ `<tag>.opt.npz`) + `<tag>.yaml`."""
    model_dir = Path(model_dir)
    model_dir.mkdir(parents=True, exist_ok=True)
    params = jax.device_get(params)
    save_npz(model_dir / f'{tag}.npz', params)
    if opt_state is not None:
        flat = {}
        leaves, treedef = jax.tree.flatten(jax.device_get(opt_state))
        for i, leaf in enumerate(leaves):
            flat[f'leaf_{i}'] = np.asarray(leaf)
        np.savez(model_dir / f'{tag}.opt.npz', **flat)
    with open(model_dir / f'{tag}.yaml', 'w') as f:
        yaml.safe_dump(info or {}, f)
    return model_dir / f'{tag}.npz'


def load_checkpoint(path, opt_state_template=None):
    """Load `<tag>.npz` → (params, opt_state|None, info dict)."""
    path = Path(path)
    params, _ = load_npz(path)
    info = {}
    ypath = path.with_suffix('.yaml')
    if ypath.exists():
        with open(ypath) as f:
            info = yaml.safe_load(f) or {}
    opt_state = None
    opath = path.with_suffix('.opt.npz')
    if opt_state_template is not None and opath.exists():
        data = np.load(opath)
        leaves, treedef = jax.tree.flatten(opt_state_template)
        new_leaves = [data[f'leaf_{i}'] for i in range(len(leaves))]
        opt_state = jax.tree.unflatten(treedef, new_leaves)
    return params, opt_state, info


def load_trained_modules(params, ckpt_path, module_prefixes: List[str]):
    """Partial init: overwrite only params under the given dotted prefixes
    (checkpoint.py:218-239)."""
    loaded, _ = load_npz(ckpt_path) if str(ckpt_path).endswith('.npz') else \
        (None, None)
    if loaded is None:
        from reverb_tpu.convert.torch_ckpt import load_reverb_checkpoint
        loaded = load_reverb_checkpoint(ckpt_path)
    flat_cur = flatten_params(params)
    flat_new = flatten_params(loaded)
    for k in flat_cur:
        if any(k.startswith(p) for p in module_prefixes) and k in flat_new:
            flat_cur[k] = flat_new[k]
    return nest_state_dict(flat_cur)


def should_force_snapshot(model_dir) -> bool:
    """Operator drops a `force_full_snapshot` file → next save includes the
    optimizer (checkpoint.py:241-264); the flag file is consumed."""
    flag = Path(model_dir) / FORCE_SNAPSHOT_FLAG
    if flag.exists():
        try:
            flag.unlink()
        except OSError:
            pass
        return True
    return False


def average_checkpoints(paths: List, out_path):
    """Average N checkpoints (bin/average_model.py best-N semantics; the
    best-N selection by CV loss happens in the caller)."""
    assert paths
    acc = None
    for p in paths:
        params, _ = load_npz(p)
        flat = flatten_params(params)
        if acc is None:
            acc = {k: v.astype(np.float64) for k, v in flat.items()}
        else:
            for k in acc:
                acc[k] += flat[k]
    n = len(paths)
    avg = {k: (v / n).astype(np.float32) for k, v in acc.items()}
    save_npz(out_path, nest_state_dict(avg))
    return out_path


def find_best_checkpoints(model_dir, n: int, key: str = 'cv_loss'
                          ) -> List[Path]:
    """Pick the N checkpoints with lowest `key` from their sidecar yamls."""
    scored = []
    for y in Path(model_dir).glob('*.yaml'):
        with open(y) as f:
            info = yaml.safe_load(f) or {}
        if key in info and y.with_suffix('.npz').exists():
            scored.append((float(info[key]), y.with_suffix('.npz')))
    scored.sort()
    return [p for _, p in scored[:n]]
