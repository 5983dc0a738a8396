"""Incremental (hop-resumable) CTC decoding state for streaming serving.

The batch prefix beam (decode/prefix_beam.py) scans a whole utterance and
reconstructs prefixes from per-step backpointers afterwards.  A streaming
session that re-runs it from frame 0 on every `decode()` call pays O(stream)
per hop — O(T²) across a session (the round-2 `StreamingASR.decode` did
exactly that).  Here the same `_step` update is carried ACROSS hops:

  - `IncrementalBeam` holds the device `BeamState` plus *materialized*
    (K, L) prefix/time buffers.  Each hop runs one jitted scan over just the
    new frames; instead of emitting backpointers for a later backtrace, the
    `StepEmit` row is folded into the buffers in the scan body (each new
    beam row is one row-gather + at most one position write — the exact
    forward image of `_backtrace`'s reverse reconstruction).  `decode()`
    then costs O(K·L): order the carried totals and slice the buffers — no
    work proportional to the stream survives outside `accept`.
  - `IncrementalGreedy` carries the previous frame's argmax id so the
    collapse rule (search.py:106-121: drop blanks and repeats) seams
    correctly across hop boundaries.

Both produce results identical to running the batch searches over the
concatenated stream (tests/test_streaming_api.py pins the equality).

The reference has no incremental decoder at all — its runtime re-decodes the
accumulated CTC posteriors per call (cli/model.py:74-128, the TorchScript
export loops `ctc_prefix_beam_search` over everything received so far).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from reverb_tpu.decode.prefix_beam import (BeamState, StepEmit, _init_state,
                                           _log_add, _pack_results, _step)
from reverb_tpu.decode.results import DecodeResult


def _apply_emit(pfx, ts_s, ts_ns, em: StepEmit, K: int, L: int):
    """Fold one step's backpointers into materialized buffers.

    pfx:  (K, L) i32 token buffer — row k's prefix, positions < plen[k]
    ts_s: (K, L) i32 viterbi time bank for blank-ending paths
    ts_ns:(K, L) i32 viterbi time bank for non-blank-ending paths

    Forward image of `_backtrace`: the new prefix row copies the parent
    beam's row plus at most one append; each time bank row copies one old
    (beam, bank) row plus at most one position write.  Out-of-range writes
    (wpos == -1 routed to L) are dropped, matching the scatter's
    mode='drop'."""
    kk = jnp.arange(K, dtype=jnp.int32)
    new_pfx = pfx[em.pfx_parent]
    pos = jnp.where(em.pfx_wpos >= 0, em.pfx_wpos, L)
    new_pfx = new_pfx.at[kk, pos].set(em.pfx_tok, mode='drop')

    src_s = jnp.where(em.s_src_is_ns[:, None],
                      ts_ns[em.s_src_beam], ts_s[em.s_src_beam])
    src_ns = jnp.where(em.ns_src_is_ns[:, None],
                       ts_ns[em.ns_src_beam], ts_s[em.ns_src_beam])
    wpos = jnp.where(em.ns_wpos >= 0, em.ns_wpos, L)
    src_ns = src_ns.at[kk, wpos].set(
        jnp.broadcast_to(em.wval, (K,)), mode='drop')
    return new_pfx, src_s, src_ns


def _beam_hop_impl(state: BeamState, pfx, ts_s, ts_ns, ctc_probs, K: int,
                   blank_id: int, L: int, offset):
    """One hop: scan `_step` over the chunk's frames, folding each emit into
    the materialized buffers.  ctc_probs: (T_hop, V) log-probs; offset: the
    chunk's first GLOBAL frame index (timestamps stay stream-absolute).

    Unjitted so a multi-stream pool can vmap it over stacked stream states
    (cli/stream_pool.py); single-stream callers use the jitted `_beam_hop`.
    """
    T = ctc_probs.shape[0]
    topk_logp, topk_idx = jax.lax.top_k(ctc_probs.astype(jnp.float32), K)
    ts = offset + jnp.arange(T, dtype=jnp.int32)
    valid = jnp.ones((T,), bool)
    blank_acc = jnp.zeros((T,), jnp.float32)
    has_skip = jnp.zeros((T,), bool)
    step = functools.partial(_step, K=K, K2=K, blank_id=blank_id)

    def body(carry, inp):
        st, pfx, ts_s, ts_ns = carry
        st, em = step(st, inp)
        pfx, ts_s, ts_ns = _apply_emit(pfx, ts_s, ts_ns, em, K, L)
        return (st, pfx, ts_s, ts_ns), None

    (state, pfx, ts_s, ts_ns), _ = jax.lax.scan(
        body, (state, pfx, ts_s, ts_ns),
        (topk_logp, topk_idx.astype(jnp.int32), ts, valid, blank_acc,
         has_skip))
    return state, pfx, ts_s, ts_ns, jnp.max(state.plen)


_beam_hop = functools.partial(jax.jit, static_argnums=(5, 6, 7))(
    _beam_hop_impl)


@functools.partial(jax.jit, static_argnums=())
def _beam_finalize(state: BeamState, pfx, ts_s, ts_ns):
    total = _log_add(state.s, state.ns)
    order = jnp.argsort(-total).astype(jnp.int32)
    sel_ns = ~(state.v_s > state.v_ns)[order]
    prefixes = pfx[order]
    times = jnp.where(sel_ns[:, None], ts_ns[order], ts_s[order])
    return prefixes, state.plen[order], total[order], times


class IncrementalBeam:
    """Hop-resumable CTC prefix beam over one stream (B=1).

    accept(ctc_probs_chunk): O(hop) — carries the beam across hops.
    finalize(): O(K·L) — current nbest as a DecodeResult.
    """

    def __init__(self, beam_size: int, blank_id: int = 0,
                 init_len: int = 512):
        self.K = int(beam_size)
        self.blank_id = int(blank_id)
        self.L = int(init_len)
        self.reset()

    def reset(self):
        self.state = _init_state(self.K)
        self.pfx = jnp.zeros((self.K, self.L), jnp.int32)
        self.ts_s = jnp.zeros((self.K, self.L), jnp.int32)
        self.ts_ns = jnp.zeros((self.K, self.L), jnp.int32)
        self.offset = 0
        # host-side upper bound on max prefix length: grows by T_hop per
        # hop, reset to the true device max only when it nears L — growth
        # checks stay sync-free on the common path
        self._plen_ub = 0
        self._plen_dev = None

    def _grow(self, new_len: int):
        pad = new_len - self.L
        self.pfx = jnp.pad(self.pfx, ((0, 0), (0, pad)))
        self.ts_s = jnp.pad(self.ts_s, ((0, 0), (0, pad)))
        self.ts_ns = jnp.pad(self.ts_ns, ((0, 0), (0, pad)))
        self.L = new_len

    def accept(self, ctc_probs_chunk) -> None:
        """ctc_probs_chunk: (T_hop, V) log-probs (device or host array)."""
        T = int(ctc_probs_chunk.shape[0])
        if self._plen_ub + T >= self.L:
            # the bound is pessimistic (one append per frame); consult the
            # true device max before paying a buffer growth + recompile
            if self._plen_dev is not None:
                self._plen_ub = int(self._plen_dev)
            if self._plen_ub + T >= self.L:
                self._grow(max(self.L * 2, self._plen_ub + T + 1))
        (self.state, self.pfx, self.ts_s, self.ts_ns,
         self._plen_dev) = _beam_hop(
            self.state, self.pfx, self.ts_s, self.ts_ns,
            jnp.asarray(ctc_probs_chunk), self.K, self.blank_id, self.L,
            jnp.asarray(self.offset, jnp.int32))
        self.offset += T
        self._plen_ub += T

    def finalize(self) -> DecodeResult:
        out = _beam_finalize(self.state, self.pfx, self.ts_s, self.ts_ns)
        prefixes, plens, scores, times = (x[None] for x in out)
        return _pack_results(prefixes, plens, scores, times)[0]


class IncrementalGreedy:
    """Hop-resumable CTC greedy collapse (drop blanks + repeats), seamed
    across hop boundaries by carrying the previous frame's argmax id."""

    def __init__(self, blank_id: int = 0):
        self.blank_id = int(blank_id)
        self.reset()

    def reset(self):
        self.tokens: List[int] = []
        self.times: List[int] = []
        self._prev = -1
        self.offset = 0

    def accept(self, top1_chunk) -> None:
        """top1_chunk: (T_hop,) per-frame argmax ids (host or device)."""
        ids = np.asarray(top1_chunk)
        prev = np.concatenate([[self._prev], ids[:-1]])
        keep = (ids != self.blank_id) & (ids != prev)
        tpos = np.nonzero(keep)[0]
        self.tokens.extend(int(t) for t in ids[tpos])
        self.times.extend(int(self.offset + p) for p in tpos)
        if len(ids):
            self._prev = int(ids[-1])
        self.offset += len(ids)

    def result(self) -> DecodeResult:
        return DecodeResult(tokens=list(self.tokens), times=list(self.times))
