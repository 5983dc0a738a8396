"""Fused rel-pos self-attention Pallas kernel (WeNet variant, NO rel_shift).

The conformer encoder's self-attention is the single hottest op of the whole
framework (O(T^2 d) per layer, 18 layers on the flagship). The reference
computes it as four separate matmuls plus a materialized (B,H,T,T) score
tensor in HBM (asr/wenet/transformer/attention.py:330-399). This kernel fuses

    scores[i,j] = ((q_i+u)·k_j + (q_i+v)·p_j) / sqrt(dk)    (matrix_ac+bd,
                                                             bd UNSHIFTED —
                                                             attention.py:391-396)
    out = softmax_j(scores, key-pad mask) @ V

into one VMEM-resident pass: for each (batch*head, q-block) grid cell the
score block lives only in VMEM, softmax accumulates in f32, and both matmuls
hit the MXU back-to-back. The (T,T) score matrix never touches HBM, which on
long chunks (T≈513 post-subsample) removes the dominant bandwidth term.

Training still works: the op carries a custom VJP whose backward pass is the
plain XLA formulation (recompute) — forward speed where it matters (inference
is ~all of the serving cost), exact gradients everywhere.

Eligibility (else callers fall back to the XLA path): key-padding mask only
(valid keys form a prefix), no dropout, no incremental KV cache.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -1e9

_FORCE_DISABLED = os.environ.get('REVERB_TPU_NO_PALLAS', '') not in ('', '0')
_OVERRIDE = None  # tri-state: None = auto (TPU only), True/False = forced


def set_use_pallas(value):
    """Force Pallas kernels on/off (None = auto: on iff backend is TPU)."""
    global _OVERRIDE
    _OVERRIDE = value


def use_pallas_enabled() -> bool:
    if _FORCE_DISABLED:
        return False
    if _OVERRIDE is not None:
        return bool(_OVERRIDE)
    return jax.default_backend() == 'tpu'


def flash_attention_eligible(mask, rate: float, rng, cache) -> bool:
    """Kernel handles: key-pad mask (B,1,T), no dropout, no KV cache."""
    if not use_pallas_enabled():
        return False
    if cache is not None or (rng is not None and rate > 0.0):
        return False
    if mask is None or mask.ndim != 3 or mask.shape[1] != 1:
        return False
    return True


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------

def _attn_kernel(lens_ref, q_ref, u_ref, vb_ref, k_ref, p_ref, v_ref, o_ref,
                 *, scale: float, tk: int):
    """One (batch*head, q-block) cell.

    q:     (1, BQ, dk)  queries (bias adds happen in VMEM — q+u / q+v are
                        never materialized in HBM)
    u/vb:  (1, dk)      per-head rel-pos biases
    k/v:   (1, TK, dk)  full keys / values for this head
    p:     (1, TK, dk)  rel-pos projection, shared across batch (the index
                        map points every batch row at the same head row — no
                        (B,H,T,dk) broadcast in HBM)
    lens:  (BH,) int32  number of valid keys per row (valid keys are a prefix)
    o:     (1, BQ, dk)
    """
    kv_len = lens_ref[pl.program_id(0)]
    h = pl.program_id(0) % u_ref.shape[0]
    q = q_ref[0]
    # dynamic single-row reads need sublane-alignment proofs Mosaic can't
    # make for h; a masked reduction over the tiny (H, dk) table fuses fine
    hsel = (jax.lax.broadcasted_iota(jnp.int32, u_ref.shape, 0) == h)
    u = jnp.sum(jnp.where(hsel, u_ref[:], 0.0), axis=0)
    vb = jnp.sum(jnp.where(hsel, vb_ref[:], 0.0), axis=0)
    qu = q + u[None, :].astype(q.dtype)
    qv = q + vb[None, :].astype(q.dtype)
    k = k_ref[0]
    p = p_ref[0]
    v = v_ref[0]

    # qu·kᵀ + qv·pᵀ == [qu|qv]·[k|p]ᵀ exactly — one full-width (2·dk=128)
    # MXU contraction instead of two half-width ones (dk=64 would waste
    # half the systolic array's contraction dim)
    qcat = jnp.concatenate([qu, qv], axis=-1)                    # (BQ, 2dk)
    kcat = jnp.concatenate([k, p], axis=-1)                      # (TK, 2dk)
    scores = jax.lax.dot_general(
        qcat, kcat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale              # (BQ, TK) f32

    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col < kv_len, scores, _MASK_VALUE)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    e = jnp.where(col < kv_len, e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    attn = e / jnp.maximum(denom, 1e-30)

    out = jnp.dot(attn.astype(v.dtype), v,
                  preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _flash_fwd(q, u, vb, k, p, v, kv_lens, H, *, block_q: int,
               interpret: bool):
    """q/k/v: (BH, T, dk); u/vb: (H, dk); p: (H, Tk, dk). lens: (BH,)."""
    BH, Tq, dk = q.shape
    Tk = k.shape[1]
    BQ = min(block_q, _round_up(Tq, 128))
    Tq_pad = _round_up(Tq, BQ)
    Tk_pad = _round_up(Tk, 128)

    def padt(x, T):  # pad time axis
        return jnp.pad(x, ((0, 0), (0, T - x.shape[1]), (0, 0)))

    q = padt(q, Tq_pad)
    k = padt(k, Tk_pad)
    p = padt(p, Tk_pad)
    v = padt(v, Tk_pad)

    grid = (BH, Tq_pad // BQ)
    # index maps get (grid indices..., scalar-prefetch refs...)
    qspec = pl.BlockSpec((1, BQ, dk), lambda i, j, *_: (i, j, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, Tk_pad, dk), lambda i, j, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    # per-head inputs: biases live whole in VMEM (indexed by head in-kernel);
    # every batch row's pos block maps to the same head slice
    hspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((1, Tk_pad, dk), lambda i, j, *_: (i % H, 0, 0),
                         memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=1.0 / math.sqrt(dk),
                          tk=Tk_pad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[qspec, hspec, hspec, kspec, pspec, kspec],
            out_specs=pl.BlockSpec((1, BQ, dk), lambda i, j, *_: (i, j, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((BH, Tq_pad, dk), v.dtype),
        interpret=interpret,
    )(kv_lens, q, u, vb, k, p, v)
    return out[:, :Tq]


def _xla_reference(qu, qv, k, p, v, kv_lens):
    """Plain XLA formulation — used for the backward pass and as fallback."""
    dk = qu.shape[-1]
    ac = jnp.einsum('btd,bsd->bts', qu.astype(jnp.float32),
                    k.astype(jnp.float32))
    bd = jnp.einsum('btd,bsd->bts', qv.astype(jnp.float32),
                    p.astype(jnp.float32))
    scores = (ac + bd) / math.sqrt(dk)
    col = jnp.arange(k.shape[1])[None, None, :]
    valid = col < kv_lens[:, None, None]
    scores = jnp.where(valid, scores, _MASK_VALUE)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = jnp.where(valid, attn, 0.0)
    return jnp.einsum('bts,bsd->btd', attn, v.astype(jnp.float32)).astype(
        v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _flash_core(q, u, vb, k, p, v, kv_lens, H, block_q, interpret):
    return _flash_fwd(q, u, vb, k, p, v, kv_lens, H, block_q=block_q,
                      interpret=interpret)


def _flash_core_fwd(q, u, vb, k, p, v, kv_lens, H, block_q, interpret):
    out = _flash_fwd(q, u, vb, k, p, v, kv_lens, H, block_q=block_q,
                     interpret=interpret)
    return out, (q, u, vb, k, p, v, kv_lens)


def _flash_core_bwd(H, block_q, interpret, res, g):
    q, u, vb, k, p, v, kv_lens = res
    BH = q.shape[0]

    def ref(q, u, vb, k, p, v):
        rep = BH // H
        qu = q + jnp.tile(u, (rep, 1))[:, None, :].astype(q.dtype)
        qv = q + jnp.tile(vb, (rep, 1))[:, None, :].astype(q.dtype)
        pb = jnp.tile(p, (rep, 1, 1))
        return _xla_reference(qu, qv, k, pb, v, kv_lens)

    _, vjp = jax.vjp(ref, q, u, vb, k, p, v)
    dq, du, dvb, dk_, dp, dv = vjp(g)
    return dq, du, dvb, dk_, dp, dv, None


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def rel_pos_flash_attention(q, k, v, pos, pos_bias_u, pos_bias_v, kv_lens,
                            block_q: int = 1024, interpret=None):
    """Fused rel-pos (no-shift) attention.

    q,k,v: (B,H,T,dk); pos: (1,H,Tk,dk); kv_lens: (B,) int32 valid key counts.
    Returns (B,H,T,dk) in v.dtype. Softmax accumulates in f32.  The q+u/q+v
    bias adds and the per-head pos broadcast happen inside the kernel — no
    (B,H,T,dk) temporaries in HBM.
    """
    B, H, Tq, dk = q.shape
    Tk = k.shape[2]
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'

    def fold(x):
        return x.reshape(B * H, x.shape[2], dk)

    lens = jnp.repeat(kv_lens.astype(jnp.int32), H)
    out = _flash_core(fold(q), pos_bias_u.astype(q.dtype),
                      pos_bias_v.astype(q.dtype), fold(k),
                      pos[0, :, :Tk].astype(q.dtype), fold(v),
                      lens, H, block_q, interpret)
    return out.reshape(B, H, Tq, dk)
