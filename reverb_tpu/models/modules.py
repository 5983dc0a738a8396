"""Low-level functional NN ops over torch-layout parameter pytrees.

Design: parameters live in plain nested dicts whose keys mirror the reference
torch ``state_dict`` paths exactly (SURVEY.md Appendix B), e.g.
``params['encoder']['encoders'][0]['self_attn']['linear_q']['weight']``.
This keeps the ``reverb_asr_v1.pt`` → JAX converter a pure key-walk with no
renaming table, and every forward function is a pure jittable function of
(params, inputs).  Weight layouts are kept in torch convention:

  Linear.weight  (out, in)        → apply as x @ W.T + b
  Conv1d.weight  (out, in/g, k)
  Conv2d.weight  (out, in, kh, kw)
  Embedding.weight (V, d)

XLA folds the transposes; keeping torch layout costs nothing at runtime.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


class Rngs:
    """Trace-time PRNG key splitter for dropout. `None`-safe: if constructed
    with None, `next()` returns None and dropout becomes a no-op."""

    def __init__(self, key):
        self._key = key

    def next(self):
        if self._key is None:
            return None
        self._key, sub = jax.random.split(self._key)
        return sub


def remat_policy(name: str):
    """Rematerialization policy for per-layer `jax.checkpoint`.

    'full' — save only layer inputs; the backward replays the whole layer
    (minimum memory, the MXU recomputes every matmul: ~33% extra FLOPs).
    'dots' — save every matmul/conv output PLUS the layernorm statistics
    (mean/rstd, tagged 'ln_stats' in layer_norm — (B,T,1)-sized, so saving
    them is free while the replay skips both full-width reduction passes
    over every LN input); the backward replays only cheap elementwise VPU
    work (activations, masks, dropout applies). The MXU never recomputes,
    so the FLOP cost of remat is ~0 while the big (B,T,ffn) activation
    intermediates still drop — the right default on TPU where HBM, not
    FLOPs, bounds the trainable batch size."""
    if name == 'full':
        return None
    if name == 'dots':
        return jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            jax.checkpoint_policies.save_only_these_names(
                'ln_stats',
                # flash-attention context (attention.py): a Pallas custom
                # call is not a dot — without this the backward replays the
                # whole fwd kernel (~16.5 ms/step at B=48 flagship)
                'attn_out'))
    if name == 'dots_no_ln':
        # A/B probe for the ln_stats save (tools/exp_lnstats.py): 'dots'
        # minus the LN-stat names — if saving them fires, this variant
        # must be SLOWER (the backward re-reduces every LN input)
        return jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            jax.checkpoint_policies.save_only_these_names('attn_out'))
    raise ValueError(
        f'unknown remat_policy {name!r} (full|dots|dots_no_ln)')


def dropout(x, rate: float, rng):
    if rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def linear(p, x):
    if 'weight_q8' in p:
        # int8 serving path (ops/quant.py): per-out-channel int8 weights ×
        # int8 activations on the MXU int8 pipe — calibrated static scale
        # when present (no per-token absmax pass), dynamic otherwise
        from reverb_tpu.ops import quant as _q
        _q.calib_record(p, x)
        if 'a_scale' in p:
            y = _q.int8_matmul_static(x, p['weight_q8'], p['w_scale'],
                                      p['a_scale'])
        else:
            y = _q.int8_matmul(x, p['weight_q8'], p['w_scale'])
        if 'bias' in p and p['bias'] is not None:
            y = y + p['bias'].astype(y.dtype)
        return y
    y = jnp.matmul(x, p['weight'].T.astype(x.dtype),
                   precision=jax.lax.Precision.HIGHEST)
    if 'lora_A' in p:   # LoRA adapter (train/lora.py): y += s·(x Aᵀ) Bᵀ
        h = jnp.matmul(x, p['lora_A'].T.astype(x.dtype),
                       precision=jax.lax.Precision.HIGHEST)
        y = y + p['lora_scale'].astype(x.dtype) * jnp.matmul(
            h, p['lora_B'].T.astype(x.dtype),
            precision=jax.lax.Precision.HIGHEST)
    if 'bias' in p and p['bias'] is not None:
        y = y + p['bias'].astype(x.dtype)
    return y


_PALLAS_LN = __import__('os').environ.get('REVERB_TPU_PALLAS_LN', '0') == '1'


def layer_norm(p, x, eps: float = 1e-5):
    # Pallas fused LN (ops/layer_norm.py) — OPT-IN (REVERB_TPU_PALLAS_LN=1),
    # measured NON-WIN on the flagship train step: 281.7 → 295.3 ms/step
    # (B=48, v5e).  The xplane attributed ~42 ms/step to LN-stat
    # convert_reduce fusions, but those fusions co-execute neighboring
    # elementwise work; a kernel boundary un-fuses it, so the dedicated LN
    # pass costs more than it saves.  Kept for LN-dominated callers and as
    # the recorded experiment.  Same numerics (one-pass E[x²]−E[x]² f32
    # stats, cast-before-affine).
    # The flag is read ONCE at import: jit caches are not keyed on env vars,
    # so a mid-process flip would leave compiled programs on the old path
    # while new traces took the new one — a silently mixed configuration.
    if _PALLAS_LN:
        from reverb_tpu.ops import use_pallas_enabled
        from reverb_tpu.ops import layer_norm as _ln
        if use_pallas_enabled() and _ln.eligible(x):
            return _ln.fused_layer_norm(x, p['weight'], p['bias'], eps)
    # one-pass f32 statistics (E[x²]−E[x]²): halves the HBM reads of the
    # mean-then-var formulation and keeps bf16 activations accurate
    from jax.ad_checkpoint import checkpoint_name
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True)
                      - mean * mean, 0.0)
    # 'ln_stats' are saved by the 'dots' remat policy: (B,T,1)-sized, so
    # the checkpoint replay skips both reduction passes over x
    mean = checkpoint_name(mean, 'ln_stats')
    rstd = checkpoint_name(jax.lax.rsqrt(var + eps), 'ln_stats')
    y = ((xf - mean) * rstd).astype(x.dtype)
    return y * p['weight'].astype(x.dtype) + p['bias'].astype(x.dtype)


def embedding(p, ids):
    return p['weight'][ids]


def batch_norm_1d(p, x, eps: float = 1e-5):
    """Inference-mode BatchNorm1d over (B, C, T) using running stats."""
    mean = p['running_mean'][None, :, None].astype(x.dtype)
    var = p['running_var'][None, :, None].astype(x.dtype)
    w = p['weight'][None, :, None].astype(x.dtype)
    b = p['bias'][None, :, None].astype(x.dtype)
    return (x - mean) * jax.lax.rsqrt(var + eps) * w + b


def batch_norm_last(p, x, eps: float = 1e-5):
    """Inference-mode BatchNorm over the LAST axis of (B, T, C)."""
    scale = (p['weight'] * jax.lax.rsqrt(p['running_var'] + eps)
             ).astype(x.dtype)
    shift = (p['bias'] - p['weight'] * p['running_mean']
             * jax.lax.rsqrt(p['running_var'] + eps)).astype(x.dtype)
    return x * scale + shift


def _dw_conv_fwd_op(w, x, pad):
    """(C,1,k) weight × (B,T,C) NWC activations → (B,T_out,C)."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype).transpose(2, 1, 0),
        window_strides=(1,),
        padding=[pad],
        dimension_numbers=('NHC', 'HIO', 'NHC'),
        feature_group_count=x.shape[-1],
        precision=jax.lax.Precision.HIGHEST)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dw_conv(w, x, pad):
    """Depthwise time conv with a partitioner-safe backward.

    Forward: XLA's grouped conv (fastest on TPU).  Backward: k shifted
    elementwise FMAs over static slices — the grouped conv's WEIGHT-GRADIENT
    kernel miscompiles under GSPMD when the time axis is sharded inside a
    larger program (observed ~100% relative grad error on the conformer
    depthwise weights with a 'seq' mesh axis; the slice formulation
    partitions exactly, and XLA fuses the k terms into one kernel)."""
    return _dw_conv_fwd_op(w, x, pad)


def _dw_conv_fwd(w, x, pad):
    return _dw_conv_fwd_op(w, x, pad), (w, x)


def _dw_conv_bwd(pad, res, g):
    w, x = res                                    # (C,1,k), (B,T,C)
    k = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), pad, (0, 0)))
    t_out = g.shape[1]
    # dw[c,k] = Σ_{b,t} x_pad[b,t+k,c]·g[b,t,c]
    dw = jnp.stack([jnp.sum(xp[:, i:i + t_out, :] * g, axis=(0, 1))
                    for i in range(k)], axis=-1)[:, None, :]  # (C,1,k)
    # dx_pad[s] = Σ_i w[i]·g[s-i]  → slice a (k-1)-padded g per tap
    gp = jnp.pad(g, ((0, 0), (k - 1, k - 1), (0, 0)))
    t_pad = xp.shape[1]
    dxp = gp[:, k - 1:k - 1 + t_pad, :] * w[:, 0, 0][None, None, :]
    for i in range(1, k):
        dxp = dxp + (gp[:, k - 1 - i:k - 1 - i + t_pad, :]
                     * w[:, 0, i][None, None, :])
    dx = dxp[:, pad[0]:dxp.shape[1] - pad[1], :]
    return dw.astype(w.dtype), dx.astype(x.dtype)


_dw_conv.defvjp(_dw_conv_fwd, _dw_conv_bwd)


def depthwise_conv1d_ntc(p, x, padding=0):
    """Depthwise conv over time for (B, T, C) activations — no layout
    transposes (TPU-friendly NWC). torch-layout weight (C, 1, k).
    padding: int (symmetric) or (left, right) tuple."""
    pad = padding if isinstance(padding, tuple) else (padding, padding)
    y = _dw_conv(p['weight'], x, pad)
    if 'bias' in p and p['bias'] is not None:
        y = y + p['bias'][None, None, :].astype(x.dtype)
    return y


def pointwise_conv_as_linear(p, x):
    """1×1 conv1d == matmul over the channel axis; x (B, T, C_in).
    torch-layout weight (C_out, C_in, 1)."""
    y = jnp.matmul(x, p['weight'][:, :, 0].T.astype(x.dtype),
                   precision=jax.lax.Precision.HIGHEST)
    if 'bias' in p and p['bias'] is not None:
        y = y + p['bias'].astype(x.dtype)
    return y


def conv1d(p, x, stride: int = 1, padding: int = 0, groups: int = 1):
    """x: (B, C_in, T) → (B, C_out, T'). torch-layout weight (C_out, C_in/g, k)."""
    w = p['weight'].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=('NCH', 'OIH', 'NCH'),
        feature_group_count=groups,
        precision=jax.lax.Precision.HIGHEST)
    if 'bias' in p and p['bias'] is not None:
        y = y + p['bias'][None, :, None].astype(x.dtype)
    return y


def conv2d(p, x, stride=(1, 1), padding=(0, 0)):
    """x: (B, C_in, H, W) → (B, C_out, H', W'). weight (C_out, C_in, kh, kw)."""
    if 'weight_q8' in p:
        from reverb_tpu.ops import quant as _q
        _q.calib_record(p, x)
        y = _q.int8_conv2d(x, p['weight_q8'], p['w_scale'], stride, padding,
                           a_scale=p.get('a_scale'))
        if 'bias' in p and p['bias'] is not None:
            y = y + p['bias'][None, :, None, None].astype(y.dtype)
        return y
    w = p['weight'].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
        precision=jax.lax.Precision.HIGHEST)
    if 'bias' in p and p['bias'] is not None:
        y = y + p['bias'][None, :, None, None].astype(x.dtype)
    return y


# ------------------------------ activations ------------------------------

def swish(x):
    return x * jax.nn.sigmoid(x)


def glu(x, axis=-1):
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


ACTIVATIONS = {
    'relu': jax.nn.relu,
    'swish': swish,
    'silu': swish,
    'gelu': jax.nn.gelu,
    'tanh': jnp.tanh,
    'hardtanh': lambda x: jnp.clip(x, -1.0, 1.0),
    'mish': lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    'selu': jax.nn.selu,
}


# ------------------------------ initializers ------------------------------
# torch-default initializers (kaiming-uniform a=sqrt(5) for Linear/Conv,
# N(0,1) for Embedding), so from-scratch training matches reference behavior.

def init_linear(rng, in_features: int, out_features: int, bias: bool = True,
                dtype=jnp.float32):
    k1, k2 = jax.random.split(rng)
    bound = math.sqrt(1.0 / in_features)
    p = {'weight': jax.random.uniform(
        k1, (out_features, in_features), dtype, -math.sqrt(3.0) * bound,
        math.sqrt(3.0) * bound)}
    if bias:
        p['bias'] = jax.random.uniform(k2, (out_features,), dtype, -bound, bound)
    return p


def init_layer_norm(dim: int, dtype=jnp.float32):
    return {'weight': jnp.ones((dim,), dtype), 'bias': jnp.zeros((dim,), dtype)}


def init_embedding(rng, vocab: int, dim: int, dtype=jnp.float32):
    return {'weight': jax.random.normal(rng, (vocab, dim), dtype)}


def init_conv1d(rng, in_ch: int, out_ch: int, k: int, groups: int = 1,
                bias: bool = True, dtype=jnp.float32):
    k1, k2 = jax.random.split(rng)
    fan_in = (in_ch // groups) * k
    bound = math.sqrt(1.0 / fan_in)
    p = {'weight': jax.random.uniform(
        k1, (out_ch, in_ch // groups, k), dtype, -math.sqrt(3.0) * bound,
        math.sqrt(3.0) * bound)}
    if bias:
        p['bias'] = jax.random.uniform(k2, (out_ch,), dtype, -bound, bound)
    return p


def init_conv2d(rng, in_ch: int, out_ch: int, kh: int, kw: int,
                bias: bool = True, dtype=jnp.float32):
    k1, k2 = jax.random.split(rng)
    fan_in = in_ch * kh * kw
    bound = math.sqrt(1.0 / fan_in)
    p = {'weight': jax.random.uniform(
        k1, (out_ch, in_ch, kh, kw), dtype, -math.sqrt(3.0) * bound,
        math.sqrt(3.0) * bound)}
    if bias:
        p['bias'] = jax.random.uniform(k2, (out_ch,), dtype, -bound, bound)
    return p


def init_batch_norm(dim: int, dtype=jnp.float32):
    return {'weight': jnp.ones((dim,), dtype), 'bias': jnp.zeros((dim,), dtype),
            'running_mean': jnp.zeros((dim,), dtype),
            'running_var': jnp.ones((dim,), dtype)}


def xavier_uniform(rng, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[-1], shape[-2] if len(shape) > 1 else shape[-1]
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, -a, a)
