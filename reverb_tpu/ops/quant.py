"""Post-training int8 quantization for serving.

No reference counterpart (the reference serves fp32/fp16 via ONNX/TensorRT,
`bin/recognize_onnx_gpu.py`); this is the TPU-native analogue of its INT8
TensorRT option: v5e's MXU runs int8×int8→int32 at ~2× the bf16 rate, so
the MXU-bound encoder gets real speedup where HBM and quant overhead allow
(~1.25× measured per matmul including dynamic activation quant).

Scheme (standard serving PTQ):
  - weights: symmetric per-output-channel int8, scale = absmax/127, stored
    as `weight_q8` (int8) + `w_scale` (f32, per out channel); `linear()` in
    models/modules.py dispatches on the key, so every call site — attention
    q/k/v/out/pos, FFN, decoders — picks it up without code changes.
  - activations: dynamic symmetric per-token int8 (absmax/127 along the
    feature axis), computed inline; accumulate int32, rescale to bf16.

Quantize with `quantize_params_int8(params)`; keys whose path matches
`skip` regexes keep full precision (defaults keep norms/bias/cmvn/embedding
and the CTC projection, whose log-softmax feeds beam scores directly).

Static activation scales (the standard fix for dynamic-quant overhead —
the TensorRT int8 calibration analogue): `calibrate_activation_scales`
replays N representative batches through the quantized model and records
each int8 call site's activation absmax as extra jit OUTPUTS (site →
running max on the host), then `apply_activation_scales` writes an
`a_scale` into each calibrated node.  With `a_scale` present,
`int8_matmul_static` quantizes activations against the fixed scale —
no per-token absmax reduction (a full extra read of x) and no runtime
rescale chain.  Sites never seen during calibration keep dynamic scales.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp

# calibration side-channel: populated only while a calibration trace is
# running; linear()/conv2d record activation absmax tracers into _CALIB
# keyed by the param-tree path of their weight_q8 leaf (via _CALIB_PATHS:
# id(leaf tracer) → path).  The tracers become real outputs of the jitted
# calibration step — a functional stat channel, no host callbacks.
_CALIB = None
_CALIB_PATHS = None


def calib_record(p, x):
    """Called from the int8 dispatch sites during a calibration trace."""
    global _CALIB
    if _CALIB is None:
        return
    path = _CALIB_PATHS.get(id(p['weight_q8']))
    if path is None:
        return
    am = jnp.max(jnp.abs(x)).astype(jnp.float32)
    prev = _CALIB.get(path)
    _CALIB[path] = am if prev is None else jnp.maximum(prev, am)


def int8_matmul(x, w_q8, w_scale):
    """x (..., K) f32/bf16 × w_q8 (N, K) int8 → (..., N) in x.dtype.

    Dynamic per-token activation scales; int32 accumulation on the MXU.
    """
    s = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
    s = jnp.maximum(s, 1e-8)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127,
                  127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_q8, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * s * w_scale.astype(jnp.float32)
    return y.astype(x.dtype)


def int8_matmul_static(x, w_q8, w_scale, a_scale):
    """`int8_matmul` with a calibrated static activation scale (scalar):
    the per-token absmax pass disappears and the requant multiplier
    folds to a constant."""
    inv = (127.0 / a_scale).astype(jnp.float32)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127,
                  127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_q8, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * ((a_scale / 127.0) *
                                   w_scale.astype(jnp.float32))
    return y.astype(x.dtype)


def _weight_q8_paths(params):
    """{id(weight_q8 leaf): tree path} — built per trace (ids are the
    tracers of THIS trace)."""
    out = {}

    def walk(node, path):
        if isinstance(node, dict):
            if 'weight_q8' in node:
                out[id(node['weight_q8'])] = path
            for k, v in node.items():
                walk(v, f'{path}.{k}' if path else str(k))
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, f'{path}.{i}')

    walk(params, '')
    return out


def calibrate_activation_scales(qparams, run_fn, batches,
                                headroom: float = 1.0):
    """Record per-site activation absmax over representative batches.

    qparams: tree from `quantize_params_int8`; run_fn(qparams, *batch)
    executes the serving forward(s) whose sites should be calibrated;
    batches: iterable of arg tuples.  Returns {path: scale} with
    scale = headroom * max over batches.

    run_fn must call the PLAIN model functions (models/asr_model.py
    forward_encoder / forward_attention_decoder, models/ctc.ctc_logprobs):
    the whole calibration step is jitted HERE, and a nested jit inside
    run_fn re-flattens the param tree into fresh tracers, which breaks the
    id(weight_q8)→path match (sites silently stop recording — detected
    below).
    """
    global _CALIB, _CALIB_PATHS

    @jax.jit
    def step(p, *batch):
        global _CALIB, _CALIB_PATHS
        _CALIB, _CALIB_PATHS = {}, _weight_q8_paths(p)
        try:
            run_fn(p, *batch)
            return dict(_CALIB)
        finally:
            _CALIB, _CALIB_PATHS = None, None

    maxima = {}
    first = True
    for batch in batches:
        stats = jax.device_get(step(qparams, *batch))
        if first and not stats and _weight_q8_paths(qparams):
            raise ValueError(
                'calibration forward recorded no int8 sites — run_fn must '
                'use the plain (unjitted) model functions; a nested jit '
                'hides the sites (see calibrate_activation_scales '
                'docstring)')
        first = False
        for k, v in stats.items():
            maxima[k] = max(maxima.get(k, 0.0), float(v))
    return {k: v * headroom for k, v in maxima.items() if v > 0.0}


def apply_activation_scales(qparams, scales):
    """Write calibrated `a_scale` leaves into the quantized tree (paths as
    produced by `calibrate_activation_scales`); uncalibrated sites keep
    dynamic quantization."""

    def walk(node, path):
        if isinstance(node, dict):
            if 'weight_q8' in node and path in scales:
                out = dict(node)
                out['a_scale'] = jnp.asarray(scales[path], jnp.float32)
                return out
            return {k: walk(v, f'{path}.{k}' if path else str(k))
                    for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, f'{path}.{i}') for i, v in enumerate(node)]
        return node

    return walk(qparams, '')


DEFAULT_SKIP = (
    r'.*norm.*', r'.*cmvn.*', r'.*embed.*', r'.*pos_bias.*',
    r'.*ctc_lo.*',          # CTC head: log-probs feed beam scores directly
    r'.*depthwise_conv.*', r'.*pointwise_conv.*', r'.*conv.*',
)


def quantize_params_int8(params, skip=DEFAULT_SKIP):
    """Return a copy of the param tree with every eligible linear `weight`
    (2-D, inside a dict that looks like a Linear) replaced by
    weight_q8 + w_scale.  Non-destructive; training params are unchanged.
    """
    skip_res = [re.compile(p) for p in skip]

    def walk(node, path):
        if isinstance(node, dict):
            if 'weight' in node and getattr(node['weight'], 'ndim', 0) == 4 \
                    and '.embed.conv' in path:
                # subsample Conv2d stack: the single most expensive op of the
                # long-form pipeline (5.9 TFLOP at D=1024) — int8 is ~1.23×
                return quantize_conv2d_int8(node)
            if 'weight' in node and getattr(node['weight'], 'ndim', 0) == 2 \
                    and not any(r.match(path) for r in skip_res) \
                    and 'running_mean' not in node:
                w = jnp.asarray(node['weight'], jnp.float32)
                scale = jnp.max(jnp.abs(w), axis=1) / 127.0   # (N,)
                scale = jnp.maximum(scale, 1e-12)
                q = jnp.clip(jnp.round(w / scale[:, None]), -127,
                             127).astype(jnp.int8)
                out = {k: v for k, v in node.items() if k != 'weight'}
                out['weight_q8'] = q
                out['w_scale'] = scale
                return out
            return {k: walk(v, f'{path}.{k}' if path else str(k))
                    for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, f'{path}.{i}') for i, v in enumerate(node)]
        return node

    return walk(params, '')


def int8_conv2d(x, w_q8, w_scale, stride, padding, a_scale=None):
    """x (B, C, H, W) × w_q8 (O, C, kh, kw) int8 → (B, O, H', W') in x.dtype.

    Per-sample dynamic activation scale (calibrated static scalar when
    `a_scale` is given); int32 accumulation.  ~1.23× the bf16 conv on v5e
    for the 3×3 subsample convs.
    """
    if a_scale is not None:
        s = (a_scale / 127.0).astype(jnp.float32)
    else:
        s = jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True)
        s = jnp.maximum(s.astype(jnp.float32), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127,
                  127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, w_q8,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * s * w_scale.astype(jnp.float32)[None, :,
                                                                  None, None]
    return y.astype(x.dtype)


def quantize_conv2d_int8(node):
    """Quantize one Conv2d param dict (weight (O,C,kh,kw)) per-out-channel."""
    w = jnp.asarray(node['weight'], jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=(1, 2, 3)) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w / scale[:, None, None, None]), -127,
                 127).astype(jnp.int8)
    out = {k: v for k, v in node.items() if k != 'weight'}
    out['weight_q8'] = q
    out['w_scale'] = scale
    return out
