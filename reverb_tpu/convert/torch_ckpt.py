"""reverb_asr_v1.pt ↔ JAX param-pytree conversion.

Checkpoint format (SURVEY.md Appendix B, asr/wenet/utils/checkpoint.py:29-64,
:114-190): torch.save of either a raw state_dict or {'model0': state_dict,
'optimizer0': ...}; keys follow module paths like
`encoder.encoders.3.self_attn.linear_q.weight`.

Our param tree uses the SAME key structure (dict-of-dicts, with python lists
for `encoders` / `decoders` / `language_layers`), so conversion is a pure
key-walk.  Also provides flat npz save/load for native checkpoints.
"""

from __future__ import annotations

import io
import re
from typing import Dict

import numpy as np

# dict keys whose children are integer-indexed module lists in our tree
_LIST_KEYS = {'encoders', 'decoders', 'language_layers',
              'encoders0', 'decoders3', 'experts'}
# torch buffer/bookkeeping keys to drop
_SKIP_SUFFIXES = ('num_batches_tracked',)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pt checkpoint → flat {dotted_key: np.ndarray} on host."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(ckpt, dict) and 'model0' in ckpt:
        ckpt = ckpt['model0']
    if isinstance(ckpt, dict) and 'state_dict' in ckpt:
        ckpt = ckpt['state_dict']
    return convert_torch_state_dict(ckpt)


def convert_torch_state_dict(ckpt) -> Dict[str, np.ndarray]:
    """In-memory torch state_dict → flat remapped numpy dict."""
    import torch
    out = {}
    for k, v in ckpt.items():
        if not hasattr(v, 'numpy'):
            continue
        k = k.removeprefix('module.')
        # ESPnet-style cmvn remap (checkpoint.py:43-55)
        k = k.replace('normalize.mean', 'global_cmvn.mean')
        k = k.replace('normalize.std', 'global_cmvn.istd')
        # our conformer layer keeps the conv-module params flat in the layer
        # dict (models/asr_model.py _init_conformer_layer); reference paths
        # nest them under .conv_module. (SURVEY App. B)
        k = k.replace('.conv_module.', '.')
        if k.endswith(_SKIP_SUFFIXES):
            continue
        out[k] = v.detach().to(torch.float32).numpy() \
            if v.dtype.is_floating_point else v.detach().numpy()
    return out


def nest_state_dict(flat: Dict[str, np.ndarray]):
    """Flat dotted keys → nested dict tree (lists for module lists)."""
    tree: Dict = {}
    for key, val in flat.items():
        parts = key.split('.')
        node = tree
        for i, p in enumerate(parts[:-1]):
            nxt_is_index = parts[i + 1].isdigit() and p in _LIST_KEYS
            if p not in node:
                node[p] = {}
            node = node[p]
        node[parts[-1]] = val
    return _listify(tree)


def _listify(node):
    if not isinstance(node, dict):
        return node
    out = {}
    for k, v in node.items():
        if k in _LIST_KEYS and isinstance(v, dict) and \
                all(kk.isdigit() for kk in v):
            out[k] = [_listify(v[str(i)]) for i in range(len(v))]
        else:
            out[k] = _listify(v)
    return out


def flatten_params(tree, prefix: str = '') -> Dict[str, np.ndarray]:
    """Inverse of nest_state_dict: pytree → flat dotted dict."""
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(flatten_params(v, f'{prefix}{k}.'))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            flat.update(flatten_params(v, f'{prefix}{i}.'))
    else:
        flat[prefix[:-1]] = np.asarray(tree)
    return flat


def load_reverb_checkpoint(path: str):
    """reverb .pt → params pytree ready for reverb_tpu.models forwards."""
    flat = load_torch_state_dict(path)
    return nest_state_dict(flat)


def fixup_paraformer_predictor(tree):
    """Reshape a generically-converted wenet-paraformer `predictor` subtree
    to our layout: the reference nests the Cif head under
    `predictor.predictor.*` (paraformer.py:56) and stores the tp BiLSTM as
    flat torch-LSTM keys — flatten the former, split the latter into
    fwd/bwd {w_ih, w_hh, b} (bias = b_ih + b_hh)."""
    pred = tree.get('predictor')
    if not isinstance(pred, dict):
        return tree
    inner = pred.pop('predictor', None)
    if isinstance(inner, dict):
        pred.update(inner)
    bl = pred.get('tp_blstm')
    if isinstance(bl, dict) and 'weight_ih_l0' in bl:
        pred['tp_blstm'] = {
            'fwd': {'w_ih': bl['weight_ih_l0'],
                    'w_hh': bl['weight_hh_l0'],
                    'b': bl['bias_ih_l0'] + bl['bias_hh_l0']},
            'bwd': {'w_ih': bl['weight_ih_l0_reverse'],
                    'w_hh': bl['weight_hh_l0_reverse'],
                    'b': (bl['bias_ih_l0_reverse']
                          + bl['bias_hh_l0_reverse'])},
        }
    return tree


def load_paraformer_checkpoint(path: str):
    """wenet-converted Ali-Paraformer .pt (the output of the reference's
    convert_paraformer_to_wenet_config_and_ckpt.py) → params pytree for
    models/sanm.py forwards."""
    return fixup_paraformer_predictor(load_reverb_checkpoint(path))


def check_param_compat(loaded, initialized) -> list:
    """Compare a converted tree to an init_params tree; returns mismatches."""
    a = flatten_params(loaded)
    b = flatten_params(initialized)
    problems = []
    for k in sorted(set(a) | set(b)):
        if k not in a:
            problems.append(f'missing in checkpoint: {k}')
        elif k not in b:
            problems.append(f'unexpected in checkpoint: {k}')
        elif tuple(a[k].shape) != tuple(np.asarray(b[k]).shape):
            problems.append(
                f'shape mismatch {k}: ckpt {a[k].shape} vs model '
                f'{np.asarray(b[k]).shape}')
    return problems


def save_npz(path: str, tree, **metadata):
    flat = flatten_params(tree)
    meta = {f'__meta__{k}': np.asarray(v) for k, v in metadata.items()}
    np.savez(path, **flat, **meta)


def load_npz(path: str):
    data = np.load(path, allow_pickle=False)
    flat = {}
    meta = {}
    for k in data.files:
        if k.startswith('__meta__'):
            meta[k[len('__meta__'):]] = data[k]
        else:
            flat[k] = data[k]
    return nest_state_dict(flat), meta
