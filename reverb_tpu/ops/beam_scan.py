"""CTC prefix beam search forward scan as ONE Pallas TPU kernel.

The `lax.scan` formulation (decode/prefix_beam.py) is correct but its body
compiles to a dozen small VPU kernels re-launched every frame — the beam
phase costs as much as the whole 18-layer encoder on the serving pipeline.
This kernel runs the ENTIRE sequential frame loop as a single launch: the
beam state (ten (B,K) vectors) lives in VMEM scratch across a sequential
grid over frames, each grid step reads one frame's top-k block and writes
one backpointer block.

The per-frame math is not re-implemented: the kernel body calls the very
same `_step` used by the scan path (vmapped over the batch inside the
kernel), so the two paths cannot diverge semantically.  The only
substitution is the top-k primitive (`_iter_topk` — Mosaic has no sort),
which reproduces `lax.top_k`'s values and tie order exactly.

Scope: the un-biased search (ctx_tables=None; context biasing needs (S,V)
table gathers the kernel can't do — those decodes use the scan path).

Parity: asr/wenet/transformer/search.py:124-248 via decode/prefix_beam.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(logp_ref, idx_ref, ts_ref, valid_ref, bacc_ref, hskip_ref,
            pfx_parent_ref, pfx_tok_ref, pfx_wpos_ref,
            s_src_beam_ref, s_src_is_ns_ref,
            ns_src_beam_ref, ns_src_is_ns_ref, ns_wpos_ref, wval_ref,
            fin_s_ref, fin_ns_ref, fin_vs_ref, fin_vns_ref, fin_plen_ref,
            plen_s, last_s, h1_s, h2_s, s_s, ns_s, vs_s, vns_s, ctx_s, cum_s,
            *, K: int, K2: int, blank_id: int):
    # per-frame arrays are TIME-LEADING ((T,B,K2)/(T,1,B)): the grid walks
    # dim 0, so every block keeps its LAST TWO dims equal to the array's —
    # Mosaic requires the last two block dims be full-size or (8,128)-
    # divisible, which a (B,1,K) block over (B,T,K) violates whenever T >= 8
    from reverb_tpu.decode.prefix_beam import (BeamState, _init_state,
                                               _iter_topk2d, _step)
    t = pl.program_id(0)
    B = logp_ref.shape[1]

    @pl.when(t == 0)
    def _init():
        init = _init_state(K)
        for ref, v in ((plen_s, init.plen), (last_s, init.last),
                       (h1_s, init.h1), (h2_s, init.h2), (s_s, init.s),
                       (ns_s, init.ns), (vs_s, init.v_s), (vns_s, init.v_ns),
                       (ctx_s, init.ctx), (cum_s, init.cum)):
            ref[...] = jnp.broadcast_to(v[None, :], (B, K))

    state = BeamState(plen=plen_s[...], last=last_s[...], h1=h1_s[...],
                      h2=h2_s[...], s=s_s[...], ns=ns_s[...], v_s=vs_s[...],
                      v_ns=vns_s[...], ctx=ctx_s[...], cum=cum_s[...])
    inputs = (logp_ref[0], idx_ref[0], ts_ref[0, 0],
              valid_ref[0, 0] != 0, bacc_ref[0, 0], hskip_ref[0, 0] != 0)
    step = functools.partial(_step, K=K, K2=K2, blank_id=blank_id,
                             ctx_tables=None, top_k_fn=_iter_topk2d)
    new_state, emit = jax.vmap(step)(state, inputs)

    for ref, v in ((plen_s, new_state.plen), (last_s, new_state.last),
                   (h1_s, new_state.h1), (h2_s, new_state.h2),
                   (s_s, new_state.s), (ns_s, new_state.ns),
                   (vs_s, new_state.v_s), (vns_s, new_state.v_ns),
                   (ctx_s, new_state.ctx), (cum_s, new_state.cum)):
        ref[...] = v

    pfx_parent_ref[0] = emit.pfx_parent
    pfx_tok_ref[0] = emit.pfx_tok
    pfx_wpos_ref[0] = emit.pfx_wpos
    s_src_beam_ref[0] = emit.s_src_beam
    s_src_is_ns_ref[0] = emit.s_src_is_ns.astype(jnp.int32)
    ns_src_beam_ref[0] = emit.ns_src_beam
    ns_src_is_ns_ref[0] = emit.ns_src_is_ns.astype(jnp.int32)
    ns_wpos_ref[0] = emit.ns_wpos
    wval_ref[0, 0] = emit.wval
    # final-state outputs use a constant index map: the block stays resident
    # and the last grid step's write is what lands in HBM
    fin_s_ref[...] = new_state.s
    fin_ns_ref[...] = new_state.ns
    fin_vs_ref[...] = new_state.v_s
    fin_vns_ref[...] = new_state.v_ns
    fin_plen_ref[...] = new_state.plen


_KERNEL_OK = None


def kernel_available() -> bool:
    """One-time probe: compile+run both kernels on tiny shapes on the real
    backend.  A Mosaic lowering regression then degrades to the lax.scan
    path instead of crashing the serving pipeline (the kernels are
    interpret-verified in CI, but TPU lowering support can differ)."""
    global _KERNEL_OK
    if _KERNEL_OK is None:
        try:
            # the probe may first be reached while TRACING an enclosing jit:
            # its ops must not bind to the ambient trace (that would defer
            # lowering into the enclosing program's compile, so the
            # except-clause could never fire and _KERNEL_OK=True would be
            # stamped for a broken kernel).  The AOT path (numpy inputs,
            # explicit lower+compile+run) is insulated from any active
            # trace.  T >= 8: sub-tile frame counts lower even for illegal
            # block shapes (the whole dim fits one tile), so a tiny-T probe
            # would pass while production shapes fail the (8,128)
            # divisibility rule.
            import numpy as np
            B, T, K2, K = 2, 16, 3, 3

            def probe(logp, idx, ts, on, acc, z, order, live):
                final, em = beam_scan_forward(logp, idx, ts, on, acc, z,
                                              K, 0, False)
                pre, tim = beam_backtrace(em, order, live, T, False)
                return final['plen'], pre, tim
            args = (np.zeros((B, T, K2), np.float32),
                    np.zeros((B, T, K2), np.int32),
                    np.zeros((B, T), np.int32), np.ones((B, T), bool),
                    np.zeros((B, T), np.float32), np.zeros((B, T), bool),
                    np.zeros((B, K), np.int32), np.zeros((B, K), bool))
            compiled = jax.jit(probe).lower(*args).compile()
            jax.block_until_ready(compiled(*args))
            _KERNEL_OK = True
        except Exception as e:      # noqa: BLE001 — any lowering failure
            import logging
            logging.warning('beam_scan Pallas kernel unavailable '
                            '(falling back to lax.scan): %s', e)
            _KERNEL_OK = False
    return _KERNEL_OK


def _bt_kernel(order_ref, selns_ref, pfx_parent_ref, pfx_tok_ref,
               pfx_wpos_ref, s_src_beam_ref, s_src_is_ns_ref,
               ns_src_beam_ref, ns_src_is_ns_ref, ns_wpos_ref, wval_ref,
               p_pos_ref, p_tok_ref, wpos_ref, wval_out_ref,
               curp_s, curtb_s, curns_s, *, K: int):
    """Reverse backpointer walk (decode/prefix_beam.py:_backtrace's scan
    body) over a reversed grid: chain state lives in VMEM scratch, one
    frame's backpointers are resolved per grid step."""
    from reverb_tpu.decode.prefix_beam import _take1
    t = pl.program_id(0)
    B = order_ref.shape[0]

    @pl.when(t == 0)
    def _init():
        curp_s[...] = order_ref[...]
        curtb_s[...] = order_ref[...]
        curns_s[...] = selns_ref[...]

    cur_p, cur_tb = curp_s[...], curtb_s[...]
    cur_ns = curns_s[...] != 0

    def back(cur_p, cur_tb, cur_ns, pfx_wpos, pfx_tok, pfx_parent, ns_wpos,
             ns_src_beam, s_src_beam, ns_src_is_ns, s_src_is_ns):
        p_pos = _take1(pfx_wpos, cur_p)
        p_tok = _take1(pfx_tok, cur_p)
        nxt_p = _take1(pfx_parent, cur_p)
        wpos = jnp.where(cur_ns, _take1(ns_wpos, cur_tb), -1)
        nxt_tb = jnp.where(cur_ns, _take1(ns_src_beam, cur_tb),
                           _take1(s_src_beam, cur_tb))
        nxt_ns = jnp.where(cur_ns, _take1(ns_src_is_ns, cur_tb),
                           _take1(s_src_is_ns, cur_tb))
        return p_pos, p_tok, nxt_p, wpos, nxt_tb, nxt_ns

    p_pos, p_tok, nxt_p, wpos, nxt_tb, nxt_ns = jax.vmap(back)(
        cur_p, cur_tb, cur_ns, pfx_wpos_ref[0], pfx_tok_ref[0],
        pfx_parent_ref[0], ns_wpos_ref[0],
        ns_src_beam_ref[0], s_src_beam_ref[0],
        ns_src_is_ns_ref[0], s_src_is_ns_ref[0])
    curp_s[...] = nxt_p
    curtb_s[...] = nxt_tb
    curns_s[...] = nxt_ns.astype(jnp.int32)
    p_pos_ref[0] = p_pos
    p_tok_ref[0] = p_tok
    wpos_ref[0] = wpos
    wval_out_ref[0] = jnp.broadcast_to(wval_ref[0, 0][:, None], (B, K))


@functools.partial(jax.jit, static_argnums=(3, 4))
def beam_backtrace(emits: dict, order, final_sel_ns, L: int,
                   interpret: bool = False):
    """Batched prefix/timestamp reconstruction from the forward kernel's
    emits: reverse-grid Pallas walk + one XLA scatter.  order (B,K) int32,
    final_sel_ns (B,K) bool.  emits are time-leading ((T,B,K), wval
    (T,1,B)) as beam_scan_forward produces them.  Returns
    (prefixes (B,K,L), times (B,K,L))."""
    T, B, K = emits['pfx_parent'].shape
    i32 = jnp.int32
    rev3 = pl.BlockSpec((1, B, K), lambda t: (T - 1 - t, 0, 0))
    rev1 = pl.BlockSpec((1, 1, B), lambda t: (T - 1 - t, 0, 0))
    const = pl.BlockSpec((B, K), lambda t: (0, 0))
    names = ['pfx_parent', 'pfx_tok', 'pfx_wpos', 's_src_beam',
             's_src_is_ns', 'ns_src_beam', 'ns_src_is_ns', 'ns_wpos']
    outs = pl.pallas_call(
        functools.partial(_bt_kernel, K=K),
        grid=(T,),
        in_specs=[const, const] + [rev3] * 8 + [rev1],
        out_specs=[rev3] * 4,
        out_shape=[jax.ShapeDtypeStruct((T, B, K), i32) for _ in range(4)],
        scratch_shapes=[pltpu.VMEM((B, K), i32) for _ in range(3)],
        interpret=interpret,
    )(order.astype(i32), final_sel_ns.astype(i32),
      *[emits[n] for n in names], emits['wval'])
    p_pos, p_tok, wpos, wval = outs
    bb = jnp.arange(B, dtype=i32)[None, :, None]
    kk = jnp.arange(K, dtype=i32)[None, None, :]
    p_pos_ob = jnp.where(p_pos >= 0, p_pos, L)
    prefixes = jnp.zeros((B, K, L), i32).at[bb, kk, p_pos_ob].max(
        p_tok, mode='drop')
    wpos_ob = jnp.where(wpos >= 0, wpos, L)
    # frame indices are monotone in step, so max == last write
    times = jnp.zeros((B, K, L), i32).at[bb, kk, wpos_ob].max(
        wval, mode='drop')
    return prefixes, times


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def beam_scan_forward(topk_logp, topk_idx, ts, valid, blank_acc, has_skip,
                      K: int, blank_id: int, interpret: bool = False):
    """Run the whole-beam forward scan as one kernel.

    topk_logp/topk_idx: (B,T,K2); ts/blank_acc: (B,T); valid/has_skip (B,T)
    bool.  Returns (final {s,ns,v_s,v_ns,plen} (B,K), emits — a StepEmit of
    TIME-LEADING (T,B,K) arrays with wval (T,1,B), bools as int32).

    The kernels keep per-frame arrays time-leading so the sequential grid
    iterates dim 0 and every block's last two dims stay full-size (Mosaic's
    divisibility rule rejects a (B,1,K) block over (B,T,K) once T >= 8)."""
    B, T, K2 = topk_logp.shape
    f32, i32 = jnp.float32, jnp.int32
    grid = (T,)
    tk = pl.BlockSpec((1, B, K), lambda t: (t, 0, 0))
    t1 = pl.BlockSpec((1, 1, B), lambda t: (t, 0, 0))
    bfin = pl.BlockSpec((B, K), lambda t: (0, 0))
    out_shapes = ([jax.ShapeDtypeStruct((T, B, K), i32) for _ in range(4)]
                  + [jax.ShapeDtypeStruct((T, B, K), i32)]    # s_src_is_ns
                  + [jax.ShapeDtypeStruct((T, B, K), i32) for _ in range(2)]
                  + [jax.ShapeDtypeStruct((T, B, K), i32)]    # ns_wpos
                  + [jax.ShapeDtypeStruct((T, 1, B), i32)]    # wval
                  + [jax.ShapeDtypeStruct((B, K), f32) for _ in range(4)]
                  + [jax.ShapeDtypeStruct((B, K), i32)])      # plen
    out_specs = [tk] * 8 + [t1] + [bfin] * 5
    scratch = [pltpu.VMEM((B, K), d) for d in
               (i32, i32, jnp.uint32, jnp.uint32, f32, f32, f32, f32,
                i32, f32)]

    def tl2(x):     # (B,T) → (T,1,B)
        return jnp.transpose(x)[:, None, :]

    outs = pl.pallas_call(
        functools.partial(_kernel, K=K, K2=K2, blank_id=blank_id),
        grid=grid,
        in_specs=[pl.BlockSpec((1, B, K2), lambda t: (t, 0, 0)),
                  pl.BlockSpec((1, B, K2), lambda t: (t, 0, 0)),
                  t1, t1, t1, t1],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(jnp.transpose(topk_logp, (1, 0, 2)).astype(f32),
      jnp.transpose(topk_idx, (1, 0, 2)).astype(i32), tl2(ts.astype(i32)),
      tl2(valid.astype(i32)), tl2(blank_acc.astype(f32)),
      tl2(has_skip.astype(i32)))
    (pfx_parent, pfx_tok, pfx_wpos, s_src_beam, s_src_is_ns, ns_src_beam,
     ns_src_is_ns, ns_wpos, wval, fs, fns, fvs, fvns, fplen) = outs
    final = {'s': fs, 'ns': fns, 'v_s': fvs, 'v_ns': fvns, 'plen': fplen}
    emits = {'pfx_parent': pfx_parent, 'pfx_tok': pfx_tok,
             'pfx_wpos': pfx_wpos, 's_src_beam': s_src_beam,
             's_src_is_ns': s_src_is_ns, 'ns_src_beam': ns_src_beam,
             'ns_src_is_ns': ns_src_is_ns, 'ns_wpos': ns_wpos, 'wval': wval}
    return final, emits
