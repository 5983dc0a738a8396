"""CTC prefix beam search as a single device-side `lax.scan`.

Behavioral parity target: asr/wenet/transformer/search.py:124-248
(PrefixScore at :61-103).  The reference walks python dicts per utterance per
frame on the host; here the whole search is one compiled XLA program: static
beam K, per-frame top-K candidate tokens, prefix identity via 2×32-bit rolling
hashes, duplicate-prefix merging via sorted segments, viterbi timestamp
tracking carried as int32 arrays in the scan state.  Batched over utterances
with vmap; batched over chunks of a long file by the caller.

Semantics notes (documented divergences from the reference):
  * search.py:178 has a typo (`vs_ns`) that skips the viterbi-score update in
    the repeated-token-same-prefix branch; we implement the intended update.
    Total scores (s/ns) are unaffected; timestamps can differ by ≲1 frame in
    rare repeat-token cases.
  * log-add accumulates in float32 (reference: python float64).

Candidate structure per frame (the key insight that removes the dicts):
  - "keep" entries (prefix unchanged): one per live beam — blank extends the
    blank-ending score (s); a repeated last token extends the non-blank score
    (ns).
  - "extend" entries (prefix + u): one per (beam, top-K token u≠blank).
  Extended prefixes are pairwise distinct (current beams are distinct
  prefixes), so the ONLY possible duplicate is a keep entry colliding with an
  extend entry (prefix_i == prefix_j + u); the hash-sorted segment merge
  handles exactly that.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from reverb_tpu.decode.results import DecodeResult

NEG_INF = jnp.float32(-1e30)
# rolling-hash multipliers (odd → bijective mod 2^32)
_MULT1 = np.uint32(0x9E3779B1)
_MULT2 = np.uint32(0x85EBCA77)
_SEED1 = np.uint32(0x12345679)
_SEED2 = np.uint32(0x87654321)


class BeamState(NamedTuple):
    prefixes: jax.Array   # (K, L) int32
    plen: jax.Array       # (K,) int32
    last: jax.Array       # (K,) int32  (-1 when empty)
    h1: jax.Array         # (K,) uint32 rolling hash
    h2: jax.Array         # (K,) uint32
    s: jax.Array          # (K,) f32 blank-ending logprob
    ns: jax.Array         # (K,) f32 non-blank-ending logprob
    v_s: jax.Array        # (K,) f32 viterbi blank-ending score
    v_ns: jax.Array       # (K,) f32 viterbi non-blank-ending score
    times_s: jax.Array    # (K, L) int32 viterbi times of blank-ending path
    times_ns: jax.Array   # (K, L) int32 viterbi times of non-blank path


def _log_add(a, b):
    mx = jnp.maximum(a, b)
    mn = jnp.minimum(a, b)
    out = mx + jnp.log1p(jnp.exp(mn - mx))
    return jnp.where(mx <= NEG_INF, NEG_INF, out)


def _init_state(K: int, L: int) -> BeamState:
    beam_ix = jnp.arange(K, dtype=jnp.int32)
    active = beam_ix == 0
    return BeamState(
        prefixes=jnp.zeros((K, L), jnp.int32),
        plen=jnp.zeros((K,), jnp.int32),
        last=jnp.full((K,), -1, jnp.int32),
        # dead beams get distinct sentinel hashes so they never merge
        h1=jnp.where(active, _SEED1, beam_ix.astype(jnp.uint32) + 7),
        h2=jnp.where(active, _SEED2, beam_ix.astype(jnp.uint32) + 13),
        s=jnp.where(active, 0.0, NEG_INF),
        ns=jnp.full((K,), NEG_INF),
        v_s=jnp.where(active, 0.0, NEG_INF),
        v_ns=jnp.where(active, 0.0, NEG_INF),
        times_s=jnp.zeros((K, L), jnp.int32),
        times_ns=jnp.zeros((K, L), jnp.int32),
    )


def _child_hash(h1, h2, u):
    uu = u.astype(jnp.uint32) + jnp.uint32(1)
    return (h1 * _MULT1 + uu, h2 * _MULT2 + uu)


def _segment_logsumexp(vals, seg_ids, num_segments):
    seg_max = jax.ops.segment_max(vals, seg_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, NEG_INF)
    shifted = jnp.exp(vals - seg_max[seg_ids])
    shifted = jnp.where(vals <= NEG_INF, 0.0, shifted)
    seg_sum = jax.ops.segment_sum(shifted, seg_ids, num_segments=num_segments)
    out = seg_max + jnp.log(jnp.maximum(seg_sum, 1e-37))
    return jnp.where(seg_max <= NEG_INF, NEG_INF, out)


def _step(state: BeamState, inputs, K: int, K2: int, blank_id: int):
    """One frame update. inputs = (topk_logp (K2,), topk_idx (K2,), t, valid)."""
    topk_logp, topk_idx, t, valid = inputs
    L = state.prefixes.shape[1]
    viterbi = jnp.maximum(state.v_s, state.v_ns)
    score = _log_add(state.s, state.ns)
    parent_vit_times = jnp.where((state.v_s > state.v_ns)[:, None],
                                 state.times_s, state.times_ns)

    # ---- keep entries (one per beam): blank / repeated-last updates ----
    is_blank_col = topk_idx == blank_id
    p_blank = jnp.max(jnp.where(is_blank_col, topk_logp, NEG_INF))
    eq_last = state.last[:, None] == topk_idx[None, :]          # (K,K2)
    p_last = jnp.max(jnp.where(eq_last, topk_logp[None, :], NEG_INF), axis=1)

    keep_s = jnp.where(p_blank <= NEG_INF, NEG_INF, score + p_blank)
    keep_v_s = jnp.where(p_blank <= NEG_INF, NEG_INF, viterbi + p_blank)
    keep_ns = jnp.where(p_last <= NEG_INF, NEG_INF, state.ns + p_last)
    keep_v_ns = jnp.where(p_last <= NEG_INF, NEG_INF, state.v_ns + p_last)

    # ---- extend entries (K beams × K2 tokens) ----
    u = jnp.broadcast_to(topk_idx[None, :], (K, K2))             # (K,K2)
    pu = jnp.broadcast_to(topk_logp[None, :], (K, K2))
    u_is_blank = u == blank_id
    u_eq_last = u == state.last[:, None]
    # repeated token reaches an extended prefix only through a blank gap → s
    ext_ns = jnp.where(u_eq_last, state.s[:, None] + pu, score[:, None] + pu)
    ext_v_base = jnp.where(u_eq_last, state.v_s[:, None], viterbi[:, None])
    ext_v_ns = ext_v_base + pu
    dead = (score[:, None] <= NEG_INF) | u_is_blank
    ext_ns = jnp.where(dead | (jnp.where(u_eq_last, state.s[:, None],
                                         score[:, None]) <= NEG_INF),
                       NEG_INF, ext_ns)
    ext_v_ns = jnp.where(dead | (ext_v_base <= NEG_INF), NEG_INF, ext_v_ns)
    eh1, eh2 = _child_hash(state.h1[:, None], state.h2[:, None], u)
    # poison hashes of dead entries so they never merge with live ones
    dead_mask = ext_ns <= NEG_INF
    dead_tag = (jnp.arange(K * K2, dtype=jnp.uint32).reshape(K, K2)
                + jnp.uint32(0xDEAD0001))
    eh1 = jnp.where(dead_mask, dead_tag, eh1)
    eh2 = jnp.where(dead_mask, dead_tag * jnp.uint32(3), eh2)

    # ---- flatten: N = K keep + K*K2 extend entries ----
    N = K + K * K2
    h1 = jnp.concatenate([state.h1, eh1.reshape(-1)])
    h2 = jnp.concatenate([state.h2, eh2.reshape(-1)])
    ent_s = jnp.concatenate([keep_s, jnp.full((K * K2,), NEG_INF)])
    ent_ns = jnp.concatenate([keep_ns, ext_ns.reshape(-1)])
    ent_v_s = jnp.concatenate([keep_v_s, jnp.full((K * K2,), NEG_INF)])
    ent_v_ns = jnp.concatenate([keep_v_ns, ext_v_ns.reshape(-1)])
    parent = jnp.concatenate([jnp.arange(K, dtype=jnp.int32),
                              jnp.repeat(jnp.arange(K, dtype=jnp.int32), K2)])
    token = jnp.concatenate([jnp.full((K,), -1, jnp.int32),
                             u.reshape(-1).astype(jnp.int32)])
    ent_rep_tok = jnp.concatenate([jnp.zeros((K,), bool),
                                   u_eq_last.reshape(-1)])

    # ---- sort by hash → contiguous segments of equal prefixes ----
    order = jnp.lexsort((h2, h1))
    h1s, h2s = h1[order], h2[order]
    new_seg = jnp.concatenate([
        jnp.array([True]), (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])])
    seg_ids = jnp.cumsum(new_seg) - 1                             # (N,)

    seg_s = _segment_logsumexp(ent_s[order], seg_ids, N)
    seg_ns = _segment_logsumexp(ent_ns[order], seg_ids, N)
    v_s_sorted = ent_v_s[order]
    v_ns_sorted = ent_v_ns[order]
    seg_v_s = jax.ops.segment_max(v_s_sorted, seg_ids, num_segments=N)
    seg_v_ns = jax.ops.segment_max(v_ns_sorted, seg_ids, num_segments=N)
    seg_v_s = jnp.where(jnp.isfinite(seg_v_s), seg_v_s, NEG_INF)
    seg_v_ns = jnp.where(jnp.isfinite(seg_v_ns), seg_v_ns, NEG_INF)

    # representative = min original index in segment → keep entry when present
    rep_entry = jax.ops.segment_min(order, seg_ids, num_segments=N)
    rep_entry = jnp.clip(rep_entry, 0, N - 1)
    # viterbi-winning contributor (times_ns source): first sorted entry whose
    # v_ns equals the segment max
    arangeN = jnp.arange(N)
    is_vwin = (v_ns_sorted >= seg_v_ns[seg_ids]) & (v_ns_sorted > NEG_INF)
    vwin_sorted_pos = jax.ops.segment_min(jnp.where(is_vwin, arangeN, N),
                                          seg_ids, num_segments=N)
    vwin_entry = order[jnp.clip(vwin_sorted_pos, 0, N - 1)]

    n_seg = seg_ids[-1] + 1
    seg_live = (arangeN < n_seg)
    seg_total = jnp.where(seg_live, _log_add(seg_s, seg_ns), NEG_INF)

    # ---- second beam prune: top-K segments by total score ----
    top_total, top_seg = jax.lax.top_k(seg_total, K)
    del top_total

    rep = rep_entry[top_seg]
    vwin = vwin_entry[top_seg]
    rep_parent = parent[rep]
    rep_token = token[rep]
    rep_ext = rep >= K
    vwin_parent = parent[vwin]
    vwin_ext = vwin >= K
    vwin_rep_tok = ent_rep_tok[vwin]

    # ---- rebuild beam state for the K winners ----
    new_plen = state.plen[rep_parent] + rep_ext.astype(jnp.int32)
    new_last = jnp.where(rep_ext, rep_token, state.last[rep_parent])
    ch1, ch2 = _child_hash(state.h1[rep_parent], state.h2[rep_parent],
                           jnp.maximum(rep_token, 0))
    new_h1 = jnp.where(rep_ext, ch1, state.h1[rep_parent])
    new_h2 = jnp.where(rep_ext, ch2, state.h2[rep_parent])
    write_one = (jnp.arange(L)[None, :] == state.plen[rep_parent][:, None])
    new_prefixes = jnp.where(rep_ext[:, None] & write_one,
                             rep_token[:, None], state.prefixes[rep_parent])

    # times_s: the keep entry's blank path copies the parent's viterbi times
    # (search.py:166-167); extend-only segments have v_s=-inf so times_s is
    # never consulted until a later blank overwrites it.
    new_times_s = parent_vit_times[rep_parent]

    # times_ns from the viterbi-winning contributor:
    #  - extend entry: parent's viterbi times (times_s when repeat-token, else
    #    times()) with t appended at plen[parent]     (search.py:193-214)
    #  - keep entry (repeated token): parent's times_ns, last slot → t
    #    (search.py:177-183)
    vw_src_ext = jnp.where(vwin_rep_tok[:, None],
                           state.times_s[vwin_parent],
                           parent_vit_times[vwin_parent])
    app_one = (jnp.arange(L)[None, :] == state.plen[vwin_parent][:, None])
    ext_times = jnp.where(app_one, t, vw_src_ext)
    last_one = (jnp.arange(L)[None, :] ==
                jnp.maximum(state.plen[vwin_parent] - 1, 0)[:, None])
    keep_times = jnp.where(last_one, t, state.times_ns[vwin_parent])
    new_times_ns = jnp.where(vwin_ext[:, None], ext_times, keep_times)

    new_state = BeamState(
        prefixes=new_prefixes, plen=new_plen, last=new_last,
        h1=new_h1, h2=new_h2,
        s=seg_s[top_seg], ns=seg_ns[top_seg],
        v_s=seg_v_s[top_seg], v_ns=seg_v_ns[top_seg],
        times_s=new_times_s, times_ns=new_times_ns)

    # freeze state past the utterance's true length
    merged = jax.tree.map(lambda new, old: jnp.where(valid, new, old),
                          new_state, state)
    return merged, None


def _search_one(ctc_topk_logp, ctc_topk_idx, num_t, K: int, blank_id: int,
                L: int):
    """Search one utterance. ctc_topk_*: (T, K2)."""
    T, K2 = ctc_topk_logp.shape
    state = _init_state(K, L)
    ts = jnp.arange(T, dtype=jnp.int32)
    valid = ts < num_t
    step = functools.partial(_step, K=K, K2=K2, blank_id=blank_id)
    state, _ = jax.lax.scan(step, state,
                            (ctc_topk_logp, ctc_topk_idx, ts, valid))
    total = _log_add(state.s, state.ns)
    order = jnp.argsort(-total)
    times = jnp.where((state.v_s > state.v_ns)[:, None], state.times_s,
                      state.times_ns)
    return (state.prefixes[order], state.plen[order], total[order],
            times[order])


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def ctc_prefix_beam_search_device(ctc_probs, ctc_lens, beam_size: int,
                                  blank_id: int = 0, max_tokens: int = 0):
    """Batched device-side search.

    ctc_probs: (B, T, V) log-probs; ctc_lens: (B,).
    Returns (prefixes (B,K,L), plens (B,K), scores (B,K), times (B,K,L)).
    """
    ctc_probs = ctc_probs.astype(jnp.float32)
    B, T, V = ctc_probs.shape
    L = max_tokens or T
    topk_logp, topk_idx = jax.lax.top_k(ctc_probs, beam_size)   # (B,T,K2)
    fn = jax.vmap(lambda lp, ix, n: _search_one(lp, ix, n, beam_size,
                                                blank_id, L))
    return fn(topk_logp, topk_idx.astype(jnp.int32), ctc_lens)


def ctc_prefix_beam_search(ctc_probs, ctc_lens, beam_size: int,
                           blank_id: int = 0) -> List[DecodeResult]:
    """Host wrapper producing DecodeResults with nbest (search.py:235-247)."""
    prefixes, plens, scores, times = ctc_prefix_beam_search_device(
        ctc_probs, ctc_lens, beam_size, blank_id)
    prefixes = np.asarray(prefixes)
    plens = np.asarray(plens)
    scores = np.asarray(scores)
    times = np.asarray(times)
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
