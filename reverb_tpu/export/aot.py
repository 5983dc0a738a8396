"""AOT export: the TPU-native analogue of the reference export layer.

Parity intent (SURVEY.md §2.8): the reference exports TorchScript
(bin/export_jit.py) and encoder/ctc/decoder ONNX subgraphs with explicit
cache tensors (bin/export_onnx_*.py) for its C++ runtimes.  Here the served
artifact set is the same three subgraphs — streaming encoder chunk step with
static ring caches, CTC activation, batched rescoring decoder — AOT-lowered
with fixed shapes via jax.jit(...).lower().compile(), plus a persistent XLA
compilation cache so production processes never compile online.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def enable_persistent_cache(cache_dir: str):
    """Turn on XLA's persistent compilation cache (serving-process warm
    start; replaces shipping compiled .zip/.onnx artifacts)."""
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)


def maybe_enable_default_cache():
    """Opt-out persistent compile cache for CLI/serving entry points.

    Serving compiles are expensive (tens of seconds per program shape, and
    the remote-TPU compile service degrades under repeated heavy load), so
    model-loading entry points default the XLA persistent cache ON at
    ``~/.cache/reverb/xla``.  Override the directory with
    ``REVERB_XLA_CACHE_DIR``; set it to ``''`` or ``0`` to disable.
    Returns the cache dir in effect, or None when disabled/unavailable.
    """
    d = os.environ.get('REVERB_XLA_CACHE_DIR',
                       os.path.join(os.path.expanduser('~'),
                                    '.cache', 'reverb', 'xla'))
    if d in ('', '0', 'none'):
        return None
    try:
        enable_persistent_cache(d)
    except Exception as e:  # cache is an optimization, never fatal
        import logging
        logging.warning('persistent compile cache unavailable: %s', e)
        return None
    return d


def export_serving_functions(params, model_config,
                             chunk_size: int = 16,
                             num_left_chunks: int = 16,
                             batch_size: int = 1,
                             rescoring_nbest: int = 10,
                             max_hyp_len: int = 64):
    """Build + AOT-compile the serving function set (export_onnx_cpu.py:79,
    274, 324 equivalents). Returns dict name → jax.stages.Compiled."""
    from reverb_tpu.models import ctc as ctc_mod
    from reverb_tpu.models.asr_model import forward_attention_decoder
    from reverb_tpu.models.encoder import (encoder_forward_chunk,
                                           init_stream_caches)

    ecfg = model_config.encoder
    sub = ecfg.subsampling_rate
    context = {1: 1, 4: 7, 6: 11, 8: 15}[sub]
    window = (chunk_size - 1) * sub + context
    cache_t = chunk_size * num_left_chunks
    att0, cnn0 = init_stream_caches(ecfg, cache_t, batch_size)
    cat = jnp.zeros((2,), jnp.float32)
    feats = jnp.zeros((batch_size, window, ecfg.input_size), jnp.float32)

    def encoder_chunk(params, feats, offset, att_cache, cnn_cache, cat_embs):
        return encoder_forward_chunk(params['encoder'], feats, offset, ecfg,
                                     att_cache, cnn_cache, cat_embs)

    def ctc_activation(params, encoder_out):
        return ctc_mod.ctc_logprobs(params['ctc'], encoder_out, 0.0,
                                    model_config.blank_id)

    def attention_decoder(params, hyps, hyps_lens, encoder_out):
        return forward_attention_decoder(params, model_config, hyps,
                                         hyps_lens, encoder_out,
                                         model_config.reverse_weight)

    T_enc = chunk_size
    enc_out = jnp.zeros((batch_size, T_enc, ecfg.output_size), jnp.float32)
    enc_full = jnp.zeros((1, cache_t, ecfg.output_size), jnp.float32)
    hyps = jnp.zeros((rescoring_nbest, max_hyp_len), jnp.int32)
    hyps_lens = jnp.ones((rescoring_nbest,), jnp.int32)

    compiled = {
        'encoder_chunk': jax.jit(encoder_chunk).lower(
            params, feats, jnp.asarray(0), att0, cnn0, cat).compile(),
        'ctc_activation': jax.jit(ctc_activation).lower(
            params, enc_out).compile(),
        'attention_decoder': jax.jit(attention_decoder).lower(
            params, hyps, hyps_lens, enc_full).compile(),
    }
    return compiled, {'att_cache': att0, 'cnn_cache': cnn0,
                      'window': window, 'cache_t': cache_t}


def serialize_serving_functions(params, model_config, out_dir: str,
                                **kwargs) -> Dict[str, str]:
    """Write the serving function set as portable serialized StableHLO
    artifacts — the file-based analogue of the reference's ONNX export
    (bin/export_onnx_cpu.py:79,274,324: one file per subgraph + metadata).

    Each `<name>.stablehlo` embeds the weights as constants (like an ONNX
    initializer) and round-trips through `load_serialized` into a callable
    that runs on any JAX backend.  Returns name → file path.
    """
    import json

    from jax import export as jexport

    from reverb_tpu.models import ctc as ctc_mod
    from reverb_tpu.models.asr_model import forward_attention_decoder
    from reverb_tpu.models.encoder import (encoder_forward_chunk,
                                           init_stream_caches)

    # params are closed over (baked in as constants); numpy leaves from the
    # npz loader must become jax arrays to be indexable by tracers
    params = jax.tree.map(jnp.asarray, params)

    ecfg = model_config.encoder
    chunk_size = kwargs.get('chunk_size', 16)
    num_left_chunks = kwargs.get('num_left_chunks', 16)
    batch_size = kwargs.get('batch_size', 1)
    rescoring_nbest = kwargs.get('rescoring_nbest', 10)
    max_hyp_len = kwargs.get('max_hyp_len', 64)

    sub = ecfg.subsampling_rate
    context = {1: 1, 4: 7, 6: 11, 8: 15}[sub]
    window = (chunk_size - 1) * sub + context
    cache_t = chunk_size * num_left_chunks
    att0, cnn0 = init_stream_caches(ecfg, cache_t, batch_size)
    cat = jnp.zeros((2,), jnp.float32)
    feats = jnp.zeros((batch_size, window, ecfg.input_size), jnp.float32)
    enc_out = jnp.zeros((batch_size, chunk_size, ecfg.output_size),
                        jnp.float32)
    enc_full = jnp.zeros((1, cache_t, ecfg.output_size), jnp.float32)
    hyps = jnp.zeros((rescoring_nbest, max_hyp_len), jnp.int32)
    hyps_lens = jnp.ones((rescoring_nbest,), jnp.int32)

    # params closed over → baked into the artifact as constants
    fns = {
        'encoder_chunk': (
            lambda f, o, a, c, ce: encoder_forward_chunk(
                params['encoder'], f, o, ecfg, a, c, ce),
            (feats, jnp.asarray(0), att0, cnn0, cat)),
        'ctc_activation': (
            lambda e: ctc_mod.ctc_logprobs(params['ctc'], e, 0.0,
                                           model_config.blank_id),
            (enc_out,)),
        'attention_decoder': (
            lambda h, hl, e: forward_attention_decoder(
                params, model_config, h, hl, e,
                model_config.reverse_weight),
            (hyps, hyps_lens, enc_full)),
    }
    os.makedirs(out_dir, exist_ok=True)
    paths: Dict[str, str] = {}
    meta = {'chunk_size': chunk_size, 'num_left_chunks': num_left_chunks,
            'batch_size': batch_size, 'window': window, 'cache_t': cache_t,
            'subsampling_rate': sub, 'right_context': context - 1,
            'inputs': {}}
    for name, (fn, args) in fns.items():
        exp = jexport.export(jax.jit(fn))(*args)
        path = os.path.join(out_dir, f'{name}.stablehlo')
        with open(path, 'wb') as f:
            f.write(exp.serialize())
        paths[name] = path
        meta['inputs'][name] = [
            [list(a.shape), str(a.dtype)] if a is not None else None
            for a in args]
    with open(os.path.join(out_dir, 'manifest.json'), 'w') as f:
        json.dump(meta, f, indent=2)
    return paths


def load_serialized(path: str):
    """Deserialize a `.stablehlo` artifact into a callable."""
    from jax import export as jexport
    with open(path, 'rb') as f:
        return jexport.deserialize(f.read()).call


def scriptability_check(params, model_config) -> bool:
    """Train-time jit-export check (train_utils.py:472-483 `--jit`): the
    model must trace + lower with static shapes; raises on failure."""
    from reverb_tpu.decode.api import encode_and_ctc
    feats = jnp.zeros((1, 67, model_config.encoder.input_size), jnp.float32)
    lens = jnp.array([67], jnp.int32)
    cat = jnp.zeros((2,), jnp.float32)
    jax.jit(lambda p, f, l, c: encode_and_ctc(p, model_config, f, l, c)
            ).lower(params, feats, lens, cat)
    return True
