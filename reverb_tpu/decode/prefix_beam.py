"""Device-side CTC prefix beam search as a vectorized `lax.scan`.

Parity: asr/wenet/transformer/search.py:61-103, 124-248 — PrefixScore
semantics {s, ns, v_s, v_ns, times} with viterbi timestamps; the reference
runs a pure-python per-utterance per-frame loop over dict-keyed prefixes.

TPU design (three load-bearing choices):
 1. **Sort-free merge**: extended prefixes are pairwise distinct and keep
    prefixes are pairwise distinct, so the only duplicates are keep_i ==
    extend_(j,u) pairs — found with a (K, K·K2) rolling-hash match matrix
    and folded into the extend bank (no per-step lexsort/segment ops).
 2. **O(K) scan state + backpointers**: prefixes and viterbi times are NOT
    carried through the scan as (K, L) buffers (profiling shows those
    per-step buffer rotations dominate the sequential scan's wall-clock).
    Each step emits tiny (K,) backpointer records — parent beam, bank
    (s/ns), append/overwrite position — and the full prefix/timestamp
    matrices are reconstructed AFTER the scan by a reverse scan over (K,)
    state plus one scatter.  Sequential-phase state: 8 × (K,) vectors.
 3. **Exact blank-run folding** (`blank_skip_threshold`): frames dominated
    by blank are collapsed into their successor's keep update with exact
    probability mass (production blank-skip, cf. ctc_activation_more
    blank suppression, asr_model.py:736-840), cutting scan length ~4× on
    real speech.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from reverb_tpu.decode.results import DecodeResult

NEG_INF = -1e30   # python float: weakly typed in jnp ops (stays f32), and
                  # closable over inside Pallas kernels (ops/beam_scan.py —
                  # pallas_call rejects captured array constants)
# rolling-hash multipliers (odd → bijective mod 2^32)
_MULT1 = np.uint32(0x9E3779B1)
_MULT2 = np.uint32(0x85EBCA77)
_SEED1 = np.uint32(0x12345679)
_SEED2 = np.uint32(0x87654321)


class BeamState(NamedTuple):
    plen: jax.Array       # (K,) int32
    last: jax.Array       # (K,) int32  (-1 when empty)
    h1: jax.Array         # (K,) uint32 rolling hash
    h2: jax.Array         # (K,) uint32
    s: jax.Array          # (K,) f32 blank-ending logprob
    ns: jax.Array         # (K,) f32 non-blank-ending logprob
    v_s: jax.Array        # (K,) f32 viterbi blank-ending score
    v_ns: jax.Array       # (K,) f32 viterbi non-blank-ending score
    ctx: jax.Array        # (K,) int32 context-trie state (0 = root)
    cum: jax.Array        # (K,) f32 cumulative context bonus


class StepEmit(NamedTuple):
    """Per-step backpointers for post-scan reconstruction.  Banks: the
    viterbi time history lives in two banks per beam (s-ending / ns-ending);
    each new bank row is a copy of one old (beam, bank) row plus at most one
    position write (valued with the current frame index)."""
    pfx_parent: jax.Array   # (K,) int32 prefix-chain parent beam
    pfx_tok: jax.Array      # (K,) int32 appended token (ext only)
    pfx_wpos: jax.Array     # (K,) int32 append position, -1 = none
    s_src_beam: jax.Array   # (K,) int32 source of the new s-bank row
    s_src_is_ns: jax.Array  # (K,) bool  source bank
    ns_src_beam: jax.Array  # (K,) int32 source of the new ns-bank row
    ns_src_is_ns: jax.Array  # (K,) bool
    ns_wpos: jax.Array      # (K,) int32 time write position, -1 = none
    wval: jax.Array         # ()   int32 written time value (original frame)



def _take1(v, idx):
    """Gather v[idx] for tiny v via one-hot masked reduction.

    XLA lowers small dynamic gathers inside a `while` body to ~4.6 µs
    scalarizing kernels on TPU (the beam scan is launch-latency-bound);
    a compare+select+sum over K elements fuses into the surrounding
    elementwise work instead.  Exact for all dtypes incl. uint32/bool."""
    n = v.shape[0]
    m = idx[..., None] == jnp.arange(n, dtype=idx.dtype)
    if v.dtype == jnp.bool_:
        # or-reduce in i32: an i1 `any` lowers through an i8 truncation
        # Mosaic rejects
        return jnp.max((m & v).astype(jnp.int32), axis=-1) != 0
    if jnp.issubdtype(v.dtype, jnp.unsignedinteger):
        # Mosaic has no unsigned reductions; the one-hot sum is a pure
        # bit-pattern selection, so route it through the signed view (exact)
        signed = jnp.dtype(v.dtype).name.replace('u', '')
        return jnp.sum(jnp.where(m, v.view(signed), 0).astype(signed),
                       axis=-1).view(v.dtype)
    return jnp.sum(jnp.where(m, v, jnp.zeros((), v.dtype)), axis=-1)

def _kvec(b, K: int):
    """Scalar bool → (K,) bool through an i32 broadcast.  Mosaic cannot
    insert a minor dim on an i1 vector (vmapping a scalar-cond `jnp.where`
    over the batch does exactly that), so broadcast in i32 and compare."""
    return (b.astype(jnp.int32) + jnp.zeros((K,), jnp.int32)) != 0


def _log_add(a, b):
    mx = jnp.maximum(a, b)
    mn = jnp.minimum(a, b)
    out = mx + jnp.log1p(jnp.exp(mn - mx))
    return jnp.where(mx <= NEG_INF, NEG_INF, out)


def _init_state(K: int) -> BeamState:
    beam_ix = jnp.arange(K, dtype=jnp.int32)
    active = beam_ix == 0
    return BeamState(
        plen=jnp.zeros((K,), jnp.int32),
        last=jnp.full((K,), -1, jnp.int32),
        # dead beams get distinct sentinel hashes so they never merge
        h1=jnp.where(active, _SEED1, beam_ix.astype(jnp.uint32) + 7),
        h2=jnp.where(active, _SEED2, beam_ix.astype(jnp.uint32) + 13),
        s=jnp.where(active, 0.0, NEG_INF),
        ns=jnp.full((K,), NEG_INF),
        v_s=jnp.where(active, 0.0, NEG_INF),
        v_ns=jnp.full((K,), NEG_INF),
        ctx=jnp.zeros((K,), jnp.int32),
        cum=jnp.zeros((K,), jnp.float32),
    )


def _child_hash(h1, h2, u):
    uu = u.astype(jnp.uint32) + jnp.uint32(1)
    return (h1 * _MULT1 + uu, h2 * _MULT2 + uu)


def _take2(a, ri, ci):
    """a[ri, ci] for a (R,C) array and (N,) int index vectors, reshape-free
    (Mosaic cannot collapse (R,C)→(R·C,)): a static loop of row selects +
    a one-hot column sum.  Exact for every dtype incl. -inf entries (pure
    selects, no masked arithmetic on the values)."""
    R, C = a.shape
    rows = jnp.zeros((ri.shape[0], C), a.dtype)
    for r in range(R):                       # R = beam width, static + tiny
        rows = jnp.where(ri[:, None] == r, a[r][None, :], rows)
    m = ci[:, None] == jnp.arange(C, dtype=ci.dtype)[None, :]
    return jnp.sum(jnp.where(m, rows, jnp.zeros((), a.dtype)), axis=1)


def _topk2d_xla(cand, K: int):
    """Default second-beam-prune top-k: flat row-major lax.top_k over the
    (K, K2+1) candidate matrix (ties → lowest flat index)."""
    return jax.lax.top_k(cand.reshape(-1), K)


def _iter_topk2d(cand, K: int):
    """`_topk2d_xla`'s exact values/indices/tie order, built only from
    elementwise ops + single-axis reductions so it lowers inside the Pallas
    kernel: Mosaic has no sort, no argmax, and no (R,C)→(R·C,) reshape.
    Each round takes the global max, locates its first row-major position
    (first row whose row-max attains it, first unpicked column there), and
    masks it out.  Returns flat row-major (values, indices)."""
    R, C = cand.shape
    rpos = jnp.arange(R, dtype=jnp.int32)[:, None]       # (R,1)
    cpos = jnp.arange(C, dtype=jnp.int32)[None, :]       # (1,C)
    flatpos = rpos * C + cpos                            # (R,C)
    picked = jnp.zeros((R, C), bool)
    neg_inf = jnp.array(-jnp.inf, cand.dtype)
    vals, idxs = [], []
    for _ in range(K):
        masked = jnp.where(picked, neg_inf, cand)
        rowmx = jnp.max(masked, axis=1)                  # (R,)
        gmx = jnp.max(rowmx, axis=-1)                    # scalar
        row = jnp.min(jnp.where(rowmx == gmx, rpos[:, 0], R), axis=-1)
        # scalars meeting 2-D arrays are expanded EXPLICITLY ([None,None]):
        # under the in-kernel vmap they are rank-1 vectors, and Mosaic's
        # layout inference can only add one implicit dim to a vector.
        # Confine to the selected row additively (an i1 row-mask broadcast
        # would not lower); -inf rows stay -inf, which only collides with
        # gmx when gmx itself is -inf — and then the first row is all -inf,
        # so the min below still lands in it, matching flat order
        # scalar → (R,1) via a REAL add: Mosaic can't broadcast sublanes
        # and lanes in one op, and a pure broadcast chain gets re-fused by
        # canonicalization back into exactly that; an add through a (R,)
        # zeros intermediate survives
        def _rr(x):
            return (x + jnp.zeros((R,), x.dtype))[:, None]
        row_r = _rr(row)
        rowgate = jnp.where(rpos == row_r, 0.0, neg_inf).astype(cand.dtype)
        hit = ((masked + rowgate) == _rr(gmx)) & ~picked
        idx = jnp.min(jnp.min(jnp.where(hit, flatpos, R * C), axis=1),
                      axis=-1)
        vals.append(gmx)
        idxs.append(idx)
        picked = picked | (flatpos == _rr(idx))
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def _iter_topk(totals, K: int):
    """Exact top-k indices by K rounds of (max, first-argmax, mask) — the
    same values/tie order as `lax.top_k` (ties resolve to the lower index),
    built only from elementwise ops + lane reductions so it lowers inside a
    Pallas kernel (Mosaic has no sort).  Returns (values, indices)."""
    n = totals.shape[-1]
    pos = jnp.arange(n, dtype=jnp.int32)
    picked = jnp.zeros(totals.shape, bool)
    neg_inf = jnp.array(-jnp.inf, totals.dtype)
    vals, idxs = [], []
    for _ in range(K):
        cand = jnp.where(picked, neg_inf, totals)
        mx = jnp.max(cand, axis=-1)
        # first (lowest-index) unpicked maximum — `picked` is tracked
        # separately from the values so genuine -inf entries stay pickable
        # in index order, exactly like lax.top_k
        amx = jnp.min(jnp.where(~picked & (cand == mx[..., None]), pos, n),
                      axis=-1).astype(jnp.int32)
        vals.append(mx)
        idxs.append(amx)
        picked = picked | (pos == amx[..., None])
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def _step(state: BeamState, inputs, K: int, K2: int, blank_id: int,
          ctx_tables=None, top_k_fn=_topk2d_xla):
    """One frame update. inputs = (topk_logp (K2,), topk_idx (K2,), t, valid,
    blank_acc, has_skip).  Returns (new_state, StepEmit).

    ctx_tables: optional (next_tab (S,V) i32, score_tab (S,V) f32) — in-beam
    context biasing (search.py:169-218): extends advance the per-beam trie
    state and add the bonus to the PRUNING totals; keeps carry state/bonus
    unchanged (the trie state is a pure function of the prefix, so a merged
    keep+extend entry gets the same state from either path).

    top_k_fn: the second-beam-prune top-k over the (K, K2+1) candidate
    matrix returning flat row-major (values, indices); `_iter_topk2d` when
    running inside the Pallas kernel (ops/beam_scan.py), identical values +
    tie order to the default `_topk2d_xla`."""
    topk_logp, topk_idx, t, valid, blank_acc, has_skip = inputs
    beam_ix = jnp.arange(K, dtype=jnp.int32)
    orig_state = state      # frozen steps must be TRUE no-ops (no fold)
    # per-utterance scalar conditions pre-broadcast to (K,) via i32 (see
    # _kvec: Mosaic rejects i1 minor-dim inserts inside the Pallas kernel)
    validk = _kvec(valid, K)
    hskipk = _kvec(has_skip, K)

    # pre-fold viterbi bank selection (needed to compose the fold's bank
    # remap into the emitted backpointers)
    pre_sel_ns = ~(state.v_s > state.v_ns)                   # (K,) bool

    # fold a preceding run of skipped blank-dominated frames into one exact
    # blank-collapse update: s ← (s ⊕ ns)·Πp_blank, ns ← -inf
    col_s = _log_add(state.s, state.ns) + blank_acc
    col_v_s = jnp.maximum(state.v_s, state.v_ns) + blank_acc
    state = state._replace(
        s=jnp.where(hskipk, col_s, state.s),
        ns=jnp.where(hskipk, NEG_INF, state.ns),
        v_s=jnp.where(hskipk, col_v_s, state.v_s),
        v_ns=jnp.where(hskipk, NEG_INF, state.v_ns))
    # post-fold bank k's s-row refers to pre-fold bank:
    #   has_skip → the pre-fold viterbi winner; else the pre-fold s-row
    s_bank_pre_is_ns = hskipk & pre_sel_ns                   # (K,)

    viterbi = jnp.maximum(state.v_s, state.v_ns)
    score = _log_add(state.s, state.ns)
    post_sel_ns = ~(state.v_s > state.v_ns)                  # (K,) bool
    # (beam, post-vit bank) → pre-fold bank.  Bool-valued selects are
    # written as logical ops throughout this function: Mosaic lowers a
    # select with i1 operands through an i8 truncation it then rejects.
    vit_pre_is_ns = post_sel_ns | s_bank_pre_is_ns           # (K,)

    # ---- keep entries (one per beam): blank / repeated-last updates ----
    is_blank_col = topk_idx == blank_id
    p_blank = jnp.max(jnp.where(is_blank_col, topk_logp, NEG_INF))
    eq_last = state.last[:, None] == topk_idx[None, :]          # (K,K2)
    p_last = jnp.max(jnp.where(eq_last, topk_logp[None, :], NEG_INF), axis=1)

    pb_dead = _kvec(p_blank <= NEG_INF, K)
    keep_s = jnp.where(pb_dead, NEG_INF, score + p_blank)
    keep_v_s = jnp.where(pb_dead, NEG_INF, viterbi + p_blank)
    keep_ns = jnp.where(p_last <= NEG_INF, NEG_INF, state.ns + p_last)
    # De-facto reference semantics (search.py:177-183 assigns the typo'd
    # `vs_ns` attr): a keep entry's viterbi ns-score is NEVER updated, so it
    # stays the fresh defaultdict -inf every frame — v_ns survives only on
    # prefixes extended THIS frame.  Token times therefore stamp the append
    # frame and thread through the blank (s) bank, which is what the shipped
    # reverb CTMs contain; we reproduce it exactly (CTM byte-parity,
    # test_full_scale_parity.py) rather than the intended textbook update.
    keep_v_ns = jnp.full((K,), NEG_INF)

    # ---- extend entries (K beams × K2 tokens) ----
    u = jnp.broadcast_to(topk_idx[None, :], (K, K2))             # (K,K2)
    pu = jnp.broadcast_to(topk_logp[None, :], (K, K2))
    u_is_blank = u == blank_id
    u_eq_last = u == state.last[:, None]
    # repeated token reaches an extended prefix only through a blank gap → s
    ext_ns = jnp.where(u_eq_last, state.s[:, None] + pu, score[:, None] + pu)
    ext_v_base = jnp.where(u_eq_last, state.v_s[:, None], viterbi[:, None])
    ext_v_ns = ext_v_base + pu
    dead = ((jnp.where(u_eq_last, state.s[:, None], score[:, None])
             <= NEG_INF) | u_is_blank)
    ext_ns = jnp.where(dead, NEG_INF, ext_ns)
    ext_v_ns = jnp.where(dead | (ext_v_base <= NEG_INF), NEG_INF, ext_v_ns)
    eh1, eh2 = _child_hash(state.h1[:, None], state.h2[:, None], u)

    # ---- merge each keep entry into its (unique) matching extend entry ----
    live_keep = score > NEG_INF
    # cross-product merge as a STATIC loop over the K keep rows: the
    # (K,K,K2) match tensor would batch to rank-4 under the in-kernel vmap
    # and a (K,K2)→(K·K2,) flatten doesn't lower in Mosaic — neither is
    # needed.  Keep prefixes are pairwise distinct, so each extend cell
    # matches at most one keep row and plain selects accumulate exactly.
    has_m32 = jnp.zeros((K, K2), jnp.int32)
    m_idx = jnp.zeros((K, K2), jnp.int32)
    mrg_s = jnp.full((K, K2), NEG_INF)
    mrg_keep_ns = jnp.full((K, K2), NEG_INF)
    mrg_v_s = jnp.full((K, K2), NEG_INF)
    matched32 = []
    for i in range(K):
        # scalar conditions enter in i32 (i1 broadcasts don't lower), and
        # scalars are expanded [None,None] before meeting 2-D arrays (under
        # the in-kernel vmap they are rank-1 vectors, and Mosaic layouts
        # add at most one implicit dim)
        def _r(x):
            # scalar → (K,1) via a REAL add: a pure broadcast chain is
            # re-fused by canonicalization into a 2-axis broadcast Mosaic
            # can't lower; an add through a (K,) zeros intermediate isn't
            return (x + jnp.zeros((K,), x.dtype))[:, None]
        mi32 = ((_r(state.h1[i]) == eh1) & (_r(state.h2[i]) == eh2) &
                ~dead).astype(jnp.int32) * _r(live_keep[i].astype(jnp.int32))
        mib = mi32 != 0                                  # (K, K2)
        has_m32 = has_m32 | mi32
        m_idx = m_idx + mi32 * i
        mrg_s = jnp.where(mib, _r(keep_s[i]), mrg_s)
        mrg_keep_ns = jnp.where(mib, _r(keep_ns[i]), mrg_keep_ns)
        mrg_v_s = jnp.where(mib, _r(keep_v_s[i]), mrg_v_s)
        matched32.append(jnp.max(jnp.max(mi32, axis=-1), axis=-1))
    has_m = has_m32 != 0
    matched_to_ext = jnp.stack(matched32) != 0           # keep i absorbed?
    mrg_ns = _log_add(ext_ns, mrg_keep_ns)
    mrg_v_ns = ext_v_ns            # keep_v_ns is -inf (typo semantics)
    vwin_is_keep = jnp.zeros_like(has_m)
    ext_total = _log_add(mrg_s, mrg_ns)
    ext_total = jnp.where(dead & ~has_m, NEG_INF, ext_total)

    keep_total = jnp.where(matched_to_ext | ~live_keep, NEG_INF,
                           _log_add(keep_s, keep_ns))

    # ---- context biasing: bonus enters the PRUNING totals ----
    if ctx_tables is not None:
        nt, sct = ctx_tables
        ctx_ext = jnp.take_along_axis(nt[state.ctx], u, axis=1)      # (K,K2)
        bonus_ext = jnp.take_along_axis(sct[state.ctx], u, axis=1)
        ext_prune = jnp.where(ext_total <= NEG_INF, NEG_INF,
                              ext_total + state.cum[:, None] + bonus_ext)
        keep_prune = jnp.where(keep_total <= NEG_INF, NEG_INF,
                               keep_total + state.cum)
    else:
        ctx_ext = jnp.zeros((K, K2), jnp.int32)
        bonus_ext = jnp.zeros((K, K2), jnp.float32)
        ext_prune, keep_prune = ext_total, keep_total

    # ---- second beam prune over K·K2 extend + K keep candidates ----
    # candidates stay 2D — row k holds beam k's K2 extends plus its keep
    # entry in the last column; top_idx is row-major over (K, K2+1).  Both
    # the XLA and kernel top-k implement this same contract, so the scan
    # and Pallas paths stay bit-identical.
    cand = jnp.concatenate([ext_prune, keep_prune[:, None]], axis=1)
    top_total, top_idx = top_k_fn(cand, K)
    del top_total
    C = K2 + 1
    col = top_idx % C
    is_ext = col < K2
    parent = top_idx // C          # candidate row = parent beam, both kinds
    keep_i = parent
    uu = jnp.where(is_ext, col, 0)
    tok = _take1(topk_idx, uu).astype(jnp.int32)

    def flat(a):
        if a.dtype == jnp.bool_:   # i1 gathers go via i32 (no i1 selects)
            return _take2(a.astype(jnp.int32), parent, uu) != 0
        return _take2(a, parent, uu)

    new_s = jnp.where(is_ext, flat(mrg_s), _take1(keep_s, keep_i))
    new_ns = jnp.where(is_ext, flat(mrg_ns), _take1(keep_ns, keep_i))
    new_v_s = jnp.where(is_ext, flat(mrg_v_s), _take1(keep_v_s, keep_i))
    new_v_ns = jnp.where(is_ext, flat(mrg_v_ns), _take1(keep_v_ns, keep_i))

    # ---- rebuild beam state for the K winners ----
    plen_parent = _take1(state.plen, parent)
    new_plen = plen_parent + is_ext.astype(jnp.int32)
    new_last = jnp.where(is_ext, tok, _take1(state.last, parent))
    ch1, ch2 = _child_hash(_take1(state.h1, parent),
                           _take1(state.h2, parent),
                           jnp.maximum(tok, 0))
    new_h1 = jnp.where(is_ext, ch1, _take1(state.h1, parent))
    new_h2 = jnp.where(is_ext, ch2, _take1(state.h2, parent))
    new_ctx = jnp.where(is_ext, flat(ctx_ext), _take1(state.ctx, parent))
    new_cum = (_take1(state.cum, parent)
               + jnp.where(is_ext, flat(bonus_ext), 0.0))

    # ---- backpointer emits (replaces carrying (K,L) buffers) ----
    m_sel = flat(m_idx)
    hasm_sel = flat(has_m)
    # new s-bank row: parent's viterbi-winning bank; for a merged extend
    # entry the s mass comes from the matched keep parent (search.py:166-167)
    ts_parent = jnp.where(is_ext, jnp.where(hasm_sel, m_sel, parent), keep_i)
    s_src_beam = ts_parent
    s_src_is_ns = _take1(vit_pre_is_ns, ts_parent)

    # new ns-bank row (search.py:177-214):
    #  - extend winner: parent's bank (s-bank for a repeated token, else the
    #    viterbi winner), appending t at plen[parent]
    #  - keep winner / merged-keep viterbi winner: parent's ns-bank, with the
    #    last written slot overwritten by t when the repeat fired
    w_keep = ~is_ext | flat(vwin_is_keep)
    ext_win = is_ext & ~w_keep
    rep_tok = flat(u_eq_last)
    ext_src_is_ns = ((rep_tok & _take1(s_bank_pre_is_ns, parent)) |
                     (~rep_tok & _take1(vit_pre_is_ns, parent)))
    tns_parent = jnp.where(is_ext, m_sel, keep_i)
    # the repeat branch's time overwrite is gated on the parent's v_ns
    # being live (search.py:177 `if next_score1.v_ns < prefix.v_ns + prob`
    # with fresh v_ns=-inf) — under the typo invariant that only holds for
    # prefixes extended on the previous frame
    repeat_fired = ((_take1(keep_ns, tns_parent) > NEG_INF) &
                    (_take1(state.v_ns, tns_parent) > NEG_INF))
    keep_wpos = jnp.where(repeat_fired,
                          jnp.maximum(_take1(state.plen, tns_parent) - 1, 0),
                          -1)
    ns_src_beam = jnp.where(ext_win, parent, tns_parent)
    ns_src_is_ns = ~ext_win | ext_src_is_ns
    ns_wpos = jnp.where(ext_win, plen_parent, keep_wpos)

    pfx_wpos = jnp.where(is_ext, plen_parent, -1)

    new_state = BeamState(plen=new_plen, last=new_last, h1=new_h1,
                          h2=new_h2, s=new_s, ns=new_ns, v_s=new_v_s,
                          v_ns=new_v_ns, ctx=new_ctx, cum=new_cum)
    # freeze state past the utterance's true length; identity emits
    merged = jax.tree.map(lambda new, old: jnp.where(validk, new, old),
                          new_state, orig_state)
    emit = StepEmit(
        pfx_parent=jnp.where(validk, parent, beam_ix),
        pfx_tok=tok,
        pfx_wpos=jnp.where(validk, pfx_wpos, -1),
        s_src_beam=jnp.where(validk, s_src_beam, beam_ix),
        s_src_is_ns=validk & s_src_is_ns,
        ns_src_beam=jnp.where(validk, ns_src_beam, beam_ix),
        ns_src_is_ns=~validk | ns_src_is_ns,
        ns_wpos=jnp.where(validk, ns_wpos, -1),
        wval=t.astype(jnp.int32),
    )
    return merged, emit


def _backtrace(emits: StepEmit, order, final_sel_ns, K: int, L: int):
    """Reconstruct (K, L) prefixes and viterbi times from per-step
    backpointers: a reverse scan over (K,) chain state, then one scatter.
    `order` selects/reorders the final beams to trace."""

    def back(carry, em):
        cur_p, cur_tb, cur_ns = carry
        p_pos = _take1(em.pfx_wpos, cur_p)
        p_tok = _take1(em.pfx_tok, cur_p)
        nxt_p = _take1(em.pfx_parent, cur_p)
        wpos = jnp.where(cur_ns, _take1(em.ns_wpos, cur_tb), -1)
        nxt_tb = jnp.where(cur_ns, _take1(em.ns_src_beam, cur_tb),
                           _take1(em.s_src_beam, cur_tb))
        nxt_ns = jnp.where(cur_ns, _take1(em.ns_src_is_ns, cur_tb),
                           _take1(em.s_src_is_ns, cur_tb))
        return ((nxt_p, nxt_tb, nxt_ns),
                (p_pos, p_tok, wpos, jnp.broadcast_to(em.wval, p_pos.shape)))

    init = (order, order, final_sel_ns)
    _, (p_pos, p_tok, wpos, wval) = jax.lax.scan(back, init, emits,
                                                 reverse=True)
    # p_* : (T, K) — scatter into (K, L); -1 positions are routed
    # out-of-bounds and dropped
    kk = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :],
                          p_pos.shape)
    p_pos_ob = jnp.where(p_pos >= 0, p_pos, L)
    prefixes = jnp.zeros((K, L), jnp.int32).at[kk, p_pos_ob].max(
        p_tok, mode='drop')
    # times: multiple writes to one slot resolve to the LATEST (frame
    # indices are monotone in step, so max == last write)
    wpos_ob = jnp.where(wpos >= 0, wpos, L)
    times = jnp.zeros((K, L), jnp.int32).at[kk, wpos_ob].max(
        wval, mode='drop')
    return prefixes, times


def _search_one(ctc_topk_logp, ctc_topk_idx, num_t, K: int, blank_id: int,
                L: int, ts=None, blank_acc=None, has_skip=None,
                tail_acc=None, ctx_tables=None):
    """Search one utterance. ctc_topk_*: (T, K2); optional frame-compression
    inputs from `_compress_blanks` (`ts` carries ORIGINAL frame indices for
    timestamps; validity counts steps). ctx_tables: optional (next_tab,
    score_tab, node_score) context-biasing tables."""
    T, K2 = ctc_topk_logp.shape
    state = _init_state(K)
    valid = jnp.arange(T, dtype=jnp.int32) < num_t
    if ts is None:
        ts = jnp.arange(T, dtype=jnp.int32)
    if blank_acc is None:
        blank_acc = jnp.zeros((T,), jnp.float32)
        has_skip = jnp.zeros((T,), bool)
    step = functools.partial(
        _step, K=K, K2=K2, blank_id=blank_id,
        ctx_tables=None if ctx_tables is None else ctx_tables[:2])
    state, emits = jax.lax.scan(step, state,
                                (ctc_topk_logp, ctc_topk_idx, ts, valid,
                                 blank_acc, has_skip))
    total = _log_add(state.s, state.ns)
    if tail_acc is not None:
        # trailing skipped blank mass (after the last kept frame)
        total = total + tail_acc
    if ctx_tables is not None:
        # reference quirk (search.py:227-233): the final order is by
        # acoustic + ACCUMULATED context bonus (the last step's sort), but
        # the REPORTED score replaces the accumulated bonus with the
        # finalize backoff (−node_score of the final trie state)
        order = jnp.argsort(-(total + state.cum)).astype(jnp.int32)
        total = total - ctx_tables[2][state.ctx]
    else:
        order = jnp.argsort(-total).astype(jnp.int32)
    final_sel_ns = ~(state.v_s > state.v_ns)[order]
    prefixes, times = _backtrace(emits, order, final_sel_ns, K, L)
    return prefixes, state.plen[order], total[order], times


def _beam_mesh_plan(B: int):
    """Tri-state mesh decision for the single-launch kernel:
      None          — no multi-device mesh in play: launch whole-batch
      (mesh, dspec) — registered mesh shards the batch: shard_map it
      False         — a multi-device mesh is active but can't shard this
                      batch (not registered / B doesn't divide): the kernel
                      has no GSPMD rule, so the caller MUST take the XLA
                      scan formulation instead."""
    import jax as _jax
    from reverb_tpu.ops.pallas_mesh import (axis_size, get_pallas_mesh,
                                            spec_entry)
    am = _jax.sharding.get_abstract_mesh()
    n_mesh = 1
    for _, sz in getattr(am, 'shape_tuple', ()) or ():
        n_mesh *= sz
    reg = get_pallas_mesh()
    if reg is not None:
        mesh, da, _ = reg
        d_sz = axis_size(mesh, da)
        if d_sz > 1:
            if B % d_sz == 0:
                return mesh, spec_entry(mesh, da)
            # arrays may be sharded over the registered mesh even with no
            # abstract mesh ambient (eager dispatch): a whole-batch launch
            # would hit a kernel with no GSPMD rule — force XLA fallback
            return False
    if n_mesh > 1:
        return False
    return None


def _use_beam_kernel() -> bool:
    """Pallas whole-scan kernel eligibility (ops/beam_scan.py): gated like
    the other Pallas kernels; REVERB_TPU_NO_BEAM_KERNEL=1 disables just
    this one (falls back to the lax.scan formulation)."""
    import os
    if os.environ.get('REVERB_TPU_NO_BEAM_KERNEL', '') not in ('', '0'):
        return False
    from reverb_tpu.ops.flash_attention import use_pallas_enabled
    if not use_pallas_enabled():
        return False
    from reverb_tpu.ops.beam_scan import kernel_available
    return kernel_available()


def _search_batched(topk_logp, topk_idx, num_t, K: int, blank_id: int,
                    L: int, ts=None, blank_acc=None, has_skip=None,
                    tail_acc=None, ctx_tables=None, interpret=None):
    """Batched search over (B,T,K2) inputs: the Pallas whole-scan kernel
    when eligible (no context biasing), else the vmapped lax.scan path.
    `ts`/`blank_acc`/`has_skip` are (B,T) (from `_compress_blanks`), or None
    for the dense path.  Returns (prefixes, plens, scores, times)."""
    B = topk_logp.shape[0]
    mesh_plan = _beam_mesh_plan(B)
    if ctx_tables is None and mesh_plan is not False and \
            (interpret or _use_beam_kernel()):
        from reverb_tpu.ops.beam_scan import (beam_backtrace,
                                              beam_scan_forward)
        if interpret is None:
            interpret = jax.default_backend() != 'tpu'
        interpret = bool(interpret)
        T = topk_logp.shape[1]
        valid = jnp.arange(T, dtype=jnp.int32)[None, :] < num_t[:, None]
        if ts is None:
            ts = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
            blank_acc = jnp.zeros((B, T), jnp.float32)
            has_skip = jnp.zeros((B, T), bool)
        tail = jnp.zeros((B,), jnp.float32) if tail_acc is None else tail_acc

        def kernel_body(topk_logp, topk_idx, ts, valid, blank_acc, has_skip,
                        tail):
            """Per-shard (or whole-batch) single-launch kernel + finalize —
            every op is row-independent over the batch."""
            final, em = beam_scan_forward(topk_logp, topk_idx, ts, valid,
                                          blank_acc, has_skip, K, blank_id,
                                          interpret)
            total = _log_add(final['s'], final['ns']) + tail[:, None]
            order = jnp.argsort(-total, axis=-1).astype(jnp.int32)
            sel_ns = jnp.take_along_axis(~(final['v_s'] > final['v_ns']),
                                         order, axis=-1)
            prefixes, times = beam_backtrace(em, order, sel_ns, L, interpret)
            plens = jnp.take_along_axis(final['plen'], order, axis=-1)
            return (prefixes, plens,
                    jnp.take_along_axis(total, order, axis=-1), times)

        if mesh_plan is not None:
            # batch shards over the registered mesh's data axes; each device
            # launches the unchanged kernel on its local rows
            mesh, dspec = mesh_plan
            from jax.sharding import PartitionSpec as P

            def bspec(x):
                return P(dspec, *([None] * (x.ndim - 1)))
            args = (topk_logp, topk_idx, ts, valid, blank_acc, has_skip,
                    tail)
            out_specs = (P(dspec, None, None), P(dspec, None),
                         P(dspec, None), P(dspec, None, None))
            # check_vma=False: pallas_call outputs carry no varying-mesh-
            # axes info for the checker
            return jax.shard_map(kernel_body, mesh=mesh,
                                 in_specs=tuple(bspec(a) for a in args),
                                 out_specs=out_specs,
                                 check_vma=False)(*args)
        return kernel_body(topk_logp, topk_idx, ts, valid, blank_acc,
                           has_skip, tail)
    if ts is None:
        fn = jax.vmap(lambda lp, ix, n: _search_one(
            lp, ix, n, K, blank_id, L, ctx_tables=ctx_tables))
        return fn(topk_logp, topk_idx, num_t)
    fn = jax.vmap(lambda lp, ix, n, tss, acc, hs, tail: _search_one(
        lp, ix, n, K, blank_id, L, tss, acc, hs, tail,
        ctx_tables=ctx_tables))
    return fn(topk_logp, topk_idx, num_t, ts, blank_acc, has_skip, tail_acc)


def _compress_blanks(p_blank, ctc_lens, threshold: float, keep_cap: int):
    """Select frames with p(blank) ≤ threshold; fold each skipped run's
    blank log-mass into the next kept frame (exact for the keep entries; the
    only approximation is dropping non-blank *extension* candidates on
    blank-dominated frames — the production blank-skip tradeoff, cf. the
    reference's ctc_activation_more blank suppression, asr_model.py:736-840).

    p_blank: (B, T) log p(blank).  Returns (ts, valid_len, blank_acc,
    has_skip, tail_acc) with static length keep_cap."""
    B, T = p_blank.shape
    in_range = jnp.arange(T)[None, :] < ctc_lens[:, None]
    keep = (p_blank <= jnp.log(threshold)) & in_range          # (B,T)
    skipped_mass = jnp.where(~keep & in_range, p_blank, 0.0)
    csum = jnp.cumsum(skipped_mass, axis=1)                    # (B,T)
    order = jnp.argsort(~keep, axis=1, stable=True)            # kept first
    ts = order[:, :keep_cap].astype(jnp.int32)                 # (B,Tk)
    n_keep = jnp.sum(keep, axis=1)
    # accumulated skipped mass strictly before each kept frame
    c_at = jnp.take_along_axis(csum, ts, axis=1)
    c_at = c_at - jnp.take_along_axis(skipped_mass, ts, axis=1)
    prev_c = jnp.concatenate([jnp.zeros((B, 1)), c_at[:, :-1]], axis=1)
    blank_acc = (c_at - prev_c).astype(jnp.float32)
    has_skip = blank_acc < 0.0
    total_skip = csum[:, -1]
    # index with the CAPPED count: when keep_cap truncates, n_keep-1 is out
    # of bounds for the (B, keep_cap) buffer and JAX's fill-mode gather
    # would return NaN, poisoning every beam score
    n_keep_c = jnp.minimum(n_keep, keep_cap)
    last_c = jnp.where(n_keep_c > 0,
                       jnp.take_along_axis(
                           c_at, jnp.maximum(n_keep_c - 1, 0)[:, None],
                           axis=1)[:, 0], 0.0)
    tail_acc = (total_skip - last_c).astype(jnp.float32)
    return ts, n_keep_c, blank_acc, has_skip, tail_acc


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 10))
def ctc_prefix_beam_search_device_topk(topk_logp, topk_idx, blank_logp,
                                       ctc_lens, beam_size: int,
                                       blank_id: int = 0, max_tokens: int = 0,
                                       blank_skip_threshold: float = 0.0,
                                       keep_cap: int = 0, ctx_tables=None,
                                       compact_out: bool = False):
    """Batched device-side search from precomputed per-frame top-k.

    topk_logp (B,T,K2) f32 / topk_idx (B,T,K2) i32: each frame's top-k CTC
    log-probs (models.ctc.ctc_topk_logprobs computes them from bf16 logits
    with deferred normalization — the (B,T,V) f32 log-prob table is never
    materialized).  blank_logp (B,T): log p(blank) per frame, used by the
    blank-run folding.  Returns (prefixes (B,K,L), plens (B,K),
    scores (B,K), times (B,K,L))."""
    T = topk_logp.shape[1]
    L = max_tokens or T
    topk_logp = topk_logp.astype(jnp.float32)
    topk_idx = topk_idx.astype(jnp.int32)
    if blank_skip_threshold > 0.0:
        cap = keep_cap or T
        # a prefix grows by at most one token per kept frame, so the scan
        # length bounds the prefix length — shrinking L shrinks the (B,K,L)
        # result buffers the host fetches (the tunnel fetch is a measurable
        # share of the serving beam phase)
        L = min(L, cap)
        ts, n_keep, blank_acc, has_skip, tail_acc = _compress_blanks(
            blank_logp.astype(jnp.float32), ctc_lens,
            blank_skip_threshold, cap)
        g_logp = jnp.take_along_axis(topk_logp, ts[..., None], axis=1)
        g_idx = jnp.take_along_axis(topk_idx, ts[..., None], axis=1)
        # scan-length bucketing: the sequential scan always runs the STATIC
        # cap steps; on real speech (~75% blank-top frames) only ~cap/2 are
        # kept, so run the half-length branch when the batch's max kept
        # count allows (lax.switch executes one branch; frames past n_keep
        # are valid=False either way)
        half = cap // 2
        if half >= 16:
            def _br(Tb):
                def br(_):
                    return _compact(_search_batched(
                        g_logp[:, :Tb], g_idx[:, :Tb],
                        jnp.minimum(n_keep, Tb), beam_size, blank_id, L,
                        ts[:, :Tb], blank_acc[:, :Tb], has_skip[:, :Tb],
                        tail_acc, ctx_tables), compact_out)
                return br
            idx = (jnp.max(n_keep) > half).astype(jnp.int32)
            return jax.lax.switch(idx, [_br(half), _br(cap)], 0)
        return _compact(_search_batched(
            g_logp, g_idx, n_keep, beam_size, blank_id, L,
            ts, blank_acc, has_skip, tail_acc, ctx_tables), compact_out)
    return _compact(_search_batched(topk_logp, topk_idx, ctc_lens, beam_size,
                                    blank_id, L, ctx_tables=ctx_tables),
                    compact_out)


def _compact(out, compact_out: bool):
    """Halve the host-fetched (B,K,L) token/time buffers: int16 is exact for
    token ids < 32768 and chunk frame indices (callers gate on vocab size —
    see ctc_prefix_beam_search_topk).  Over a remote-TPU link the result
    fetch is a measurable share of the serving beam phase."""
    if not compact_out:
        return out
    prefixes, plens, scores, times = out
    return (prefixes.astype(jnp.int16), plens, scores,
            times.astype(jnp.int16))


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 8))
def ctc_prefix_beam_search_device(ctc_probs, ctc_lens, beam_size: int,
                                  blank_id: int = 0, max_tokens: int = 0,
                                  blank_skip_threshold: float = 0.0,
                                  keep_cap: int = 0, ctx_tables=None,
                                  compact_out: bool = False):
    """Batched device-side search.

    ctc_probs: (B, T, V) log-probs; ctc_lens: (B,).
    blank_skip_threshold > 0 enables exact-mass blank-run folding (frames
    with p(blank) > threshold are collapsed; see `_compress_blanks`), cutting
    the sequential scan length ~4× on real speech.
    Returns (prefixes (B,K,L), plens (B,K), scores (B,K), times (B,K,L)).
    """
    ctc_probs = ctc_probs.astype(jnp.float32)
    from reverb_tpu.ops.topk import topk_lastdim
    # blocked exact top-k: lax.top_k's whole-row sort was 45% of the
    # long-form pipeline at V=10k (ops/topk.py)
    topk_logp, topk_idx = topk_lastdim(ctc_probs, beam_size)   # (B,T,K2)
    return ctc_prefix_beam_search_device_topk.__wrapped__(
        topk_logp, topk_idx, ctc_probs[:, :, blank_id], ctc_lens, beam_size,
        blank_id, max_tokens, blank_skip_threshold, keep_cap, ctx_tables,
        compact_out)


def _graph_tables(context_graph, vocab_size: int):
    """(next, score, node_score) jnp tables for a ContextGraph, cached."""
    if context_graph is None:
        return None
    key = '_device_tables_' + str(vocab_size)
    cached = getattr(context_graph, key, None)
    if cached is None:
        nt, sct, nsc = context_graph.device_tables(vocab_size)
        cached = (jnp.asarray(nt), jnp.asarray(sct), jnp.asarray(nsc))
        setattr(context_graph, key, cached)
    return cached


def ctc_prefix_beam_search_raw(ctc_probs, ctc_lens, beam_size: int,
                               blank_id: int = 0,
                               blank_skip_threshold: float = 0.0,
                               context_graph=None):
    """Like `ctc_prefix_beam_search` but also returns the raw device tuple
    (prefixes, plens, scores, times) so the caller can wire it straight
    into the rescorer without re-uploading the packed host lists."""
    keep_cap = (ctc_probs.shape[1] // 2) if blank_skip_threshold > 0 else 0
    out = ctc_prefix_beam_search_device(
        ctc_probs, ctc_lens, beam_size, blank_id, 0,
        blank_skip_threshold, keep_cap,
        _graph_tables(context_graph, ctc_probs.shape[-1]),
        _compact_safe(ctc_probs.shape[-1], ctc_probs.shape[1]))
    return _pack_results(*out), out


def ctc_prefix_beam_search(ctc_probs, ctc_lens, beam_size: int,
                           blank_id: int = 0,
                           blank_skip_threshold: float = 0.0,
                           context_graph=None) -> List[DecodeResult]:
    """Host wrapper producing DecodeResults with nbest (search.py:235-247)."""
    return ctc_prefix_beam_search_raw(
        ctc_probs, ctc_lens, beam_size, blank_id, blank_skip_threshold,
        context_graph)[0]


def _compact_safe(vocab_size: int, T: int) -> bool:
    return 0 < vocab_size < 32768 and T < 32768


def ctc_prefix_beam_search_topk_raw(topk_logp, topk_idx, blank_logp,
                                    ctc_lens, beam_size: int,
                                    blank_id: int = 0,
                                    blank_skip_threshold: float = 0.0,
                                    context_graph=None, vocab_size: int = 0):
    """Top-k host wrapper that also returns the raw device tuple
    (prefixes, plens, scores, times) — see `ctc_prefix_beam_search_raw`."""
    keep_cap = (topk_logp.shape[1] // 2) if blank_skip_threshold > 0 else 0
    ctx_tables = None
    if context_graph is not None:
        assert vocab_size > 0, 'vocab_size required for context biasing'
        ctx_tables = _graph_tables(context_graph, vocab_size)
    out = ctc_prefix_beam_search_device_topk(
        topk_logp, topk_idx, blank_logp, ctc_lens, beam_size, blank_id, 0,
        blank_skip_threshold, keep_cap, ctx_tables,
        _compact_safe(vocab_size, topk_logp.shape[1]) if vocab_size else False)
    return _pack_results(*out), out


def ctc_prefix_beam_search_topk(topk_logp, topk_idx, blank_logp, ctc_lens,
                                beam_size: int, blank_id: int = 0,
                                blank_skip_threshold: float = 0.0,
                                context_graph=None, vocab_size: int = 0
                                ) -> List[DecodeResult]:
    """Host wrapper over the deferred-normalization top-k device search."""
    return ctc_prefix_beam_search_topk_raw(
        topk_logp, topk_idx, blank_logp, ctc_lens, beam_size, blank_id,
        blank_skip_threshold, context_graph, vocab_size)[0]


_NARROW_W = 64


@functools.partial(jax.jit, static_argnums=(2,))
def _narrow_view(prefixes, times, W: int):
    """(B,K,L) → (B,K,W) token/time slices — enqueued asynchronously right
    after the beam program so the host can fetch the bytes that matter
    (real 20.5 s-chunk nbests are ≤~50 tokens; the full L=scan-cap buffer
    is 3-4× the traffic through the remote-TPU tunnel)."""
    return prefixes[:, :, :W], times[:, :, :W]


def _pack_results(prefixes, plens, scores, times) -> List[DecodeResult]:
    from reverb_tpu.utils.common import fetch_np
    L = prefixes.shape[2]
    narrow = None
    if L > _NARROW_W and isinstance(prefixes, jax.Array):
        # speculative narrow fetch: the slice dispatch is async (no extra
        # round trip) and covers virtually every real batch; a hyp longer
        # than W falls back to the full buffers below
        narrow = _narrow_view(prefixes, times, _NARROW_W)
    if narrow is not None:
        plens, scores, pre_n, tim_n = fetch_np(plens, scores, *narrow)
        if plens.max(initial=0) <= _NARROW_W:
            prefixes, times = pre_n, tim_n
        else:
            prefixes, times = fetch_np(prefixes, times)
    else:
        prefixes, plens, scores, times = fetch_np(
            prefixes, plens, scores, times)
    results = []
    for b in range(prefixes.shape[0]):
        nbest, nbest_scores, nbest_times = [], [], []
        for k in range(prefixes.shape[1]):
            if scores[b, k] <= float(NEG_INF) / 2:
                continue
            n = int(plens[b, k])
            nbest.append(prefixes[b, k, :n].tolist())
            nbest_scores.append(float(scores[b, k]))
            nbest_times.append(times[b, k, :n].tolist())
        if not nbest:
            nbest, nbest_scores, nbest_times = [[]], [0.0], [[]]
        results.append(DecodeResult(
            tokens=nbest[0], score=nbest_scores[0], times=nbest_times[0],
            nbest=nbest, nbest_scores=nbest_scores, nbest_times=nbest_times))
    return results
