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


def flash_attention_eligible(mask, rate: float, rng, cache,
                             batch=None, heads=None) -> bool:
    """Kernel handles: key-pad mask (B,1,T), no KV cache.  Attention dropout
    IS supported (training): the bernoulli mask is drawn OUTSIDE the kernel
    with the exact draw the XLA path makes (modules.dropout), passed in as
    int8, and applied in VMEM — fwd and bwd stay fused while the (T,T) f32
    score/attn tensors never touch HBM.

    Under a multi-device mesh a pallas op has no GSPMD partitioning rule;
    the kernel stays live iff a concrete mesh is registered
    (ops/pallas_mesh.set_pallas_mesh) and the (batch, heads) shape divides
    its axes — rel_pos_flash_attention then shard_maps itself so each
    device runs the unchanged kernel on its local shard.  Otherwise the
    XLA formulation (which partitions cleanly) takes over."""
    if not use_pallas_enabled():
        return False
    if cache is not None:
        return False
    if rate > 0.0 and rng is not None:
        if os.environ.get('REVERB_TPU_NO_FLASH_DROPOUT', '') not in ('', '0'):
            return False
    if mask is None or mask.ndim != 3 or mask.shape[1] != 1:
        return False
    am = jax.sharding.get_abstract_mesh()
    n_mesh = 1
    for _, sz in getattr(am, 'shape_tuple', ()) or ():
        n_mesh *= sz
    # a registered concrete mesh counts even with no abstract mesh ambient
    # (eager dispatch on sharded arrays): a whole-batch launch would hit a
    # kernel with no GSPMD rule, so it must shard_map or fall back
    from reverb_tpu.ops.pallas_mesh import axis_size, get_pallas_mesh
    reg = get_pallas_mesh()
    if reg is not None:
        mesh, da, ma = reg
        n_mesh = max(n_mesh, axis_size(mesh, da) * axis_size(mesh, ma))
    if n_mesh > 1:
        if batch is None or heads is None:
            return False
        if _mesh_plan(batch, heads) is None:
            return False
    return True


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------

def _attn_kernel(lens_ref, q_ref, u_ref, vb_ref, k_ref, p_ref, v_ref,
                 *rest, scale: float, tk: int, rate: float = 0.0):
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
    rest:  (o,) or (dropmask, o) when rate > 0 — dropmask (1, BQ, TK) int8,
           the XLA path's own bernoulli draw (keep = mask != 0)
    """
    if rate > 0.0:
        mask_ref, o_ref = rest
    else:
        (o_ref,) = rest
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
    if rate > 0.0:
        attn = jnp.where(mask_ref[0] != 0, attn / (1.0 - rate), 0.0)

    out = jnp.dot(attn.astype(v.dtype), v,
                  preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _flash_fwd(q, u, vb, k, p, v, kv_lens, H, *, block_q: int,
               interpret: bool, mask=None, rate: float = 0.0):
    """q/k/v: (BH, T, dk); u/vb: (H, dk); p: (H, Tk, dk). lens: (BH,).
    mask: optional (BH, Tq, Tk) int8 dropout keep-mask (rate > 0)."""
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

    in_specs = [qspec, hspec, hspec, kspec, pspec, kspec]
    operands = [q, u, vb, k, p, v]
    has_mask = mask is not None and rate > 0.0
    if has_mask:
        mask = jnp.pad(mask, ((0, 0), (0, Tq_pad - mask.shape[1]),
                              (0, Tk_pad - mask.shape[2])))
        in_specs.append(pl.BlockSpec((1, BQ, Tk_pad),
                                     lambda i, j, *_: (i, j, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(mask)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=1.0 / math.sqrt(dk),
                          tk=Tk_pad, rate=rate if has_mask else 0.0),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, BQ, dk), lambda i, j, *_: (i, j, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((BH, Tq_pad, dk), v.dtype),
        interpret=interpret,
    )(kv_lens, *operands)
    return out[:, :Tq]


def _xla_reference(qu, qv, k, p, v, kv_lens, mask=None, rate: float = 0.0):
    """Plain XLA formulation — backward fallback + test oracle.  mask/rate:
    the externally-drawn dropout keep-mask (same semantics as the kernel)."""
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
    if mask is not None and rate > 0.0:
        attn = jnp.where(mask != 0, attn / (1.0 - rate), 0.0)
    return jnp.einsum('bts,bsd->btd', attn, v.astype(jnp.float32)).astype(
        v.dtype)


# --------------------------------------------------------------------------
# backward kernel
# --------------------------------------------------------------------------

def _attn_bwd_kernel(lens_ref, q_ref, u_ref, vb_ref, k_ref, p_ref, v_ref,
                     g_ref, *rest, scale: float, rate: float = 0.0):
    """One (row, q-block) cell of the fused backward: recompute the softmax
    tile in VMEM (FlashAttention-style — the fwd saves no (T,T) residual),
    then all six gradients.  dk/dv/dp/du/dvb accumulate across q-blocks in
    their resident output blocks (grid is row-major, j inner)."""
    if rate > 0.0:
        (mask_ref, dq_ref, dkk_ref, dv_ref, dp_ref, du_ref, dvb_ref) = rest
    else:
        (dq_ref, dkk_ref, dv_ref, dp_ref, du_ref, dvb_ref) = rest
    i, j = pl.program_id(0), pl.program_id(1)
    kv_len = lens_ref[i]
    h = i % u_ref.shape[0]
    hsel = (jax.lax.broadcasted_iota(jnp.int32, u_ref.shape, 0) == h)
    u = jnp.sum(jnp.where(hsel, u_ref[:], 0.0), axis=0)
    vb = jnp.sum(jnp.where(hsel, vb_ref[:], 0.0), axis=0)
    q = q_ref[0]
    qu = q + u[None, :].astype(q.dtype)
    qv = q + vb[None, :].astype(q.dtype)
    k = k_ref[0]
    p = p_ref[0]
    v = v_ref[0]
    g = g_ref[0]

    qcat = jnp.concatenate([qu, qv], axis=-1)                # (BQ, 2dk)
    kcat = jnp.concatenate([k, p], axis=-1)                  # (TK, 2dk)
    scores = jax.lax.dot_general(
        qcat, kcat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # (BQ, TK) f32
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    valid = col < kv_len
    scores = jnp.where(valid, scores, _MASK_VALUE)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.where(valid, jnp.exp(scores - m), 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    attn = e / jnp.maximum(denom, 1e-30)                     # (BQ, TK) f32

    if rate > 0.0:
        keep = mask_ref[0] != 0
        attn_d = jnp.where(keep, attn / (1.0 - rate), 0.0)
    else:
        attn_d = attn

    gf = g.astype(jnp.float32)
    # dv = attn_dᵀ g ;  dattn_d = g vᵀ
    dv_blk = jax.lax.dot_general(
        attn_d, gf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (TK, dk)
    dattn_d = jax.lax.dot_general(
        gf, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (BQ, TK)
    if rate > 0.0:
        dattn = jnp.where(keep, dattn_d / (1.0 - rate), 0.0)
    else:
        dattn = dattn_d
    # softmax jacobian: ds = attn ⊙ (dattn − Σ_j attn·dattn)
    D = jnp.sum(attn * dattn, axis=-1, keepdims=True)
    ds = attn * (dattn - D) * scale                          # (BQ, TK) f32

    dqcat = jax.lax.dot_general(
        ds, kcat.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (BQ, 2dk)
    dk_half = q.shape[-1]
    dqu = dqcat[:, :dk_half]
    dqv = dqcat[:, dk_half:]
    dq_ref[0] = (dqu + dqv).astype(dq_ref.dtype)

    dkk_blk = jax.lax.dot_general(
        ds, qu.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (TK, dk)
    dp_blk = jax.lax.dot_general(
        ds, qv.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    du_blk = jnp.sum(dqu, axis=0, keepdims=True)[None]       # (1, 1, dk)
    dvb_blk = jnp.sum(dqv, axis=0, keepdims=True)[None]

    @pl.when(j == 0)
    def _init():
        dkk_ref[0] = dkk_blk
        dv_ref[0] = dv_blk
        dp_ref[0] = dp_blk
        du_ref[...] = du_blk
        dvb_ref[...] = dvb_blk

    @pl.when(j > 0)
    def _acc():
        dkk_ref[0] += dkk_blk
        dv_ref[0] += dv_blk
        dp_ref[0] += dp_blk
        du_ref[...] += du_blk
        dvb_ref[...] += dvb_blk


def _flash_bwd(q, u, vb, k, p, v, kv_lens, mask, g, H, *, block_q: int,
               interpret: bool, rate: float):
    """Fused backward.  Returns (dq, du, dvb, dk, dp, dv) with p-/u-/vb-
    gradients reduced over the batch rows of each head."""
    BH, Tq, dk = q.shape
    Tk = k.shape[1]
    Tk_pad = _round_up(Tk, 128)
    # VMEM: four (BQ, Tk) f32 tiles live at once — cap the q-block so they
    # stay ≤ ~6 MB
    bq_cap = max(128, (6 * 1024 * 1024) // (16 * Tk_pad) // 128 * 128)
    BQ = min(block_q, _round_up(Tq, 128), bq_cap)
    Tq_pad = _round_up(Tq, BQ)

    def padt(x, T):
        return jnp.pad(x, ((0, 0), (0, T - x.shape[1]), (0, 0)))

    qp = padt(q, Tq_pad)
    gp = padt(g.astype(q.dtype), Tq_pad)
    kp = padt(k, Tk_pad)
    pp = padt(p, Tk_pad)
    vp = padt(v, Tk_pad)

    grid = (BH, Tq_pad // BQ)
    qspec = pl.BlockSpec((1, BQ, dk), lambda i, j, *_: (i, j, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, Tk_pad, dk), lambda i, j, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((1, Tk_pad, dk), lambda i, j, *_: (i % H, 0, 0),
                         memory_space=pltpu.VMEM)
    accspec = pl.BlockSpec((1, Tk_pad, dk), lambda i, j, *_: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    # (BH, 1, dk) with a (1, 1, dk) block: last-two block dims equal the
    # array dims, which Mosaic requires (a 2-D (1, dk) block over (BH, dk)
    # violates the divisible-by-8 sublane rule whenever BH > 1)
    rowspec = pl.BlockSpec((1, 1, dk), lambda i, j, *_: (i, 0, 0),
                           memory_space=pltpu.VMEM)

    in_specs = [qspec, hspec, hspec, kspec, pspec, kspec, qspec]
    operands = [qp, u, vb, kp, pp, vp, gp]
    has_mask = mask is not None and rate > 0.0
    if has_mask:
        maskp = jnp.pad(mask, ((0, 0), (0, Tq_pad - mask.shape[1]),
                               (0, Tk_pad - mask.shape[2])))
        in_specs.append(pl.BlockSpec((1, BQ, Tk_pad),
                                     lambda i, j, *_: (i, j, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(maskp)

    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=1.0 / math.sqrt(dk),
                          rate=rate if has_mask else 0.0),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=[qspec, accspec, accspec, accspec, rowspec, rowspec],
        ),
        out_shape=[jax.ShapeDtypeStruct((BH, Tq_pad, dk), q.dtype),
                   jax.ShapeDtypeStruct((BH, Tk_pad, dk), f32),
                   jax.ShapeDtypeStruct((BH, Tk_pad, dk), f32),
                   jax.ShapeDtypeStruct((BH, Tk_pad, dk), f32),
                   jax.ShapeDtypeStruct((BH, 1, dk), f32),
                   jax.ShapeDtypeStruct((BH, 1, dk), f32)],
        interpret=interpret,
    )(kv_lens, *operands)
    dq, dkk, dv, dp_rows, du_rows, dvb_rows = outs
    B = BH // H
    dq = dq[:, :Tq]
    dkk = dkk[:, :Tk].astype(k.dtype)
    dv = dv[:, :Tk].astype(v.dtype)
    # p/u/vb are shared across the batch rows of a head — reduce
    dp = dp_rows[:, :Tk].reshape(B, H, Tk, dk).sum(0).astype(p.dtype)
    du = du_rows.reshape(B, H, dk).sum(0).astype(u.dtype)
    dvb = dvb_rows.reshape(B, H, dk).sum(0).astype(vb.dtype)
    return dq, du, dvb, dkk, dp, dv


_BWD_OK = None


def _bwd_kernel_available(interpret: bool) -> bool:
    """One-time tiny compile probe of the backward kernel (cf. the beam
    kernel's probe) — a Mosaic regression degrades to the XLA backward."""
    global _BWD_OK
    if interpret:
        return True
    if _BWD_OK is None:
        try:
            # the bwd rule is typically first traced inside an enclosing jit
            # (grad of the train step), so the probe must not let its ops
            # bind to the ambient trace — that would defer lowering into the
            # enclosing program's compile, no error could surface here, and
            # a broken kernel would be stamped available.  The AOT path
            # (numpy inputs, explicit lower+compile+run) is insulated from
            # any active trace.
            import numpy as np
            z = np.zeros((2, 4, 8), np.float32)
            hb = np.zeros((2, 8), np.float32)
            lens = np.full((2,), 4, np.int32)

            def probe(z, hb, lens):
                return _flash_bwd(z, hb, hb, z, z, z, lens, None, z, 2,
                                  block_q=128, interpret=False, rate=0.0)
            compiled = jax.jit(probe).lower(z, hb, lens).compile()
            jax.block_until_ready(compiled(z, hb, lens))
            _BWD_OK = True
        except Exception as e:      # noqa: BLE001
            import logging
            logging.warning('flash bwd kernel unavailable '
                            '(falling back to XLA backward): %s', e)
            _BWD_OK = False
    return _BWD_OK


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def _flash_core(q, u, vb, k, p, v, kv_lens, mask, H, block_q, interpret,
                rate):
    return _flash_fwd(q, u, vb, k, p, v, kv_lens, H, block_q=block_q,
                      interpret=interpret, mask=mask, rate=rate)


def _flash_core_fwd(q, u, vb, k, p, v, kv_lens, mask, H, block_q, interpret,
                    rate):
    out = _flash_fwd(q, u, vb, k, p, v, kv_lens, H, block_q=block_q,
                     interpret=interpret, mask=mask, rate=rate)
    return out, (q, u, vb, k, p, v, kv_lens, mask)


def _flash_core_bwd(H, block_q, interpret, rate, res, g):
    q, u, vb, k, p, v, kv_lens, mask = res
    if _bwd_kernel_available(interpret):
        dq, du, dvb, dk_, dp, dv = _flash_bwd(
            q, u, vb, k, p, v, kv_lens, mask, g, H, block_q=block_q,
            interpret=interpret, rate=rate)
        return dq, du, dvb, dk_, dp, dv, None, None

    BH = q.shape[0]

    def ref(q, u, vb, k, p, v):
        rep = BH // H
        qu = q + jnp.tile(u, (rep, 1))[:, None, :].astype(q.dtype)
        qv = q + jnp.tile(vb, (rep, 1))[:, None, :].astype(q.dtype)
        pb = jnp.tile(p, (rep, 1, 1))
        return _xla_reference(qu, qv, k, pb, v, kv_lens, mask, rate)

    _, vjp = jax.vjp(ref, q, u, vb, k, p, v)
    dq, du, dvb, dk_, dp, dv = vjp(g)
    return dq, du, dvb, dk_, dp, dv, None, None


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def rel_pos_flash_attention(q, k, v, pos, pos_bias_u, pos_bias_v, kv_lens,
                            block_q: int = 1024, interpret=None,
                            rate: float = 0.0, rng=None):
    """Fused rel-pos (no-shift) attention.

    q,k,v: (B,H,T,dk); pos: (1,H,Tk,dk); kv_lens: (B,) int32 valid key counts.
    Returns (B,H,T,dk) in v.dtype. Softmax accumulates in f32.  The q+u/q+v
    bias adds and the per-head pos broadcast happen inside the kernel — no
    (B,H,T,dk) temporaries in HBM.

    rate/rng: attention dropout.  The keep-mask is the SAME bernoulli draw
    the XLA path makes on the attention matrix (modules.dropout) — shipped
    to the kernel as int8 and applied in VMEM, so training gets the fused
    forward/backward while the (T,T) f32 attention tensors never reach HBM.
    """
    B, H, Tq, dk = q.shape
    Tk = k.shape[2]
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'

    mask4 = None
    if rate > 0.0 and rng is not None:
        # drawn at GLOBAL shape, outside any shard_map region: the draw is
        # the XLA path's own bernoulli (modules.dropout semantics) and stays
        # identical whether the kernel below runs whole or mesh-sharded
        mask4 = jax.random.bernoulli(
            rng, 1.0 - rate, (B, H, Tq, Tk)).astype(jnp.int8)
    else:
        rate = 0.0

    def run(q, k, v, pos, u, vb, kv_lens, mask4):
        """Single-shard kernel launch on (b, h, T, dk) locals."""
        b, h = q.shape[0], q.shape[1]

        def fold(x):
            return x.reshape(b * h, x.shape[2], dk)

        mask = None if mask4 is None else mask4.reshape(b * h, Tq, Tk)
        lens = jnp.repeat(kv_lens.astype(jnp.int32), h)
        out = _flash_core(fold(q), u.astype(q.dtype), vb.astype(q.dtype),
                          fold(k), pos[0, :, :Tk].astype(q.dtype), fold(v),
                          lens, mask, h, block_q, interpret, rate)
        return out.reshape(b, h, Tq, dk)

    reg = _mesh_plan(B, H)
    if reg is not None:
        mesh, dspec, mspec = reg
        from jax.sharding import PartitionSpec as P
        qs = P(dspec, mspec, None, None)
        in_specs = [qs, qs, qs, P(None, mspec, None, None),
                    P(mspec, None), P(mspec, None), P(dspec)]
        args = [q, k, v, pos, pos_bias_u, pos_bias_v, kv_lens]
        if mask4 is None:
            # a None operand has no spec — close over it instead
            fn = lambda *a: run(*a, mask4=None)       # noqa: E731
        else:
            in_specs.append(qs)
            args.append(mask4)
            fn = run
        # check_vma=False: pallas_call outputs carry no varying-mesh-axes
        # info for the checker
        return jax.shard_map(fn, mesh=mesh, in_specs=tuple(in_specs),
                             out_specs=qs, check_vma=False)(*args)
    return run(q, k, v, pos, pos_bias_u, pos_bias_v, kv_lens, mask4)


def _mesh_plan(B: int, H: int):
    """(mesh, data_spec, model_spec) when a registered pallas mesh can shard
    this call: batch divides the data axes, heads divide the model axes.
    None → run unsharded (single device, or fall back handled by caller's
    eligibility gate)."""
    from reverb_tpu.ops.pallas_mesh import (axis_size, get_pallas_mesh,
                                            spec_entry)
    reg = get_pallas_mesh()
    if reg is None:
        return None
    mesh, da, ma = reg
    d_sz, m_sz = axis_size(mesh, da), axis_size(mesh, ma)
    if d_sz * m_sz <= 1:
        return None
    if B % d_sz or H % m_sz:
        return None
    return mesh, spec_entry(mesh, da), spec_entry(mesh, ma)
