"""Weighted-FSA forward scoring on device — the TPU-native substrate for
LF-MMI training (the reference's k2/icefall dependency, k2/model.py:27-120).

k2 computes MMI = log p(num) − log p(den) by intersecting a DenseFsaVec of
CTC log-probs with numerator/denominator FSAs on the GPU.  Here the same
quantities are computed as pure-JAX log-semiring forward recursions:

  - a general arc-table scorer (`fsa_forward_score`): graphs are static
    (src, dst, label, weight) int/float arrays, one `lax.scan` over frames
    with a segment-logsumexp per step — epsilon-free FSAs only (epsilons
    are closed out on the host at build time);
  - a dense unigram denominator scorer (`dense_unigram_den_score`) that
    exploits the factorization of a context-independent token LM to avoid
    materializing the O(V²) arc table — O(T·V) per utterance, scales to
    full BPE vocabularies;
  - a host-side bigram denominator-graph builder (`bigram_den_arcs`):
    CTC topology composed with a token bigram LM, states = (last emitted
    token, last-frame-was-blank flag).

Gradients flow through the log-prob tensor automatically (autodiff of
logsumexp gives exactly the numerator/denominator occupancy posteriors),
so ∂MMI/∂logp = γ_num − γ_den with no custom VJP needed.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30  # quiet -inf: keeps 0·inf NaNs out of reverse-mode autodiff


def _segment_logsumexp(data, segment_ids, num_segments):
    """Stable segmented logsumexp (log-semiring 'sum over incoming arcs')."""
    m = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    m_safe = jnp.where(m <= NEG_INF / 2, 0.0, m)
    s = jax.ops.segment_sum(jnp.exp(data - m_safe[segment_ids]), segment_ids,
                            num_segments=num_segments)
    return jnp.where(m <= NEG_INF / 2, NEG_INF,
                     m_safe + jnp.log(jnp.maximum(s, 1e-37)))


def fsa_forward_score(logp, t_len, src, dst, label, weight, num_states: int,
                      final, start: int = 0):
    """Log-semiring forward score of a dense emission matrix through an
    epsilon-free WFSA (the k2 `intersect` + `get_tot_scores` equivalent).

    logp: (T, V) frame log-probs; t_len: valid frame count (static shapes,
    masked recursion).  Arc a: src[a] --label[a]/weight[a]--> dst[a]; padding
    arcs use weight=NEG_INF.  final: (S,) final weights (NEG_INF = non-final).

    Returns the total score  logsumexp over all T-frame paths start→final.
    """
    S = num_states
    alpha0 = jnp.full((S,), NEG_INF, jnp.float32).at[start].set(0.0)

    def step(alpha, logp_t):
        contrib = alpha[src] + weight + logp_t[label]
        nxt = _segment_logsumexp(contrib, dst, S)
        return nxt, None

    def masked_step(carry, xt):
        alpha, t = carry
        nxt, _ = step(alpha, xt)
        alpha = jnp.where(t < t_len, nxt, alpha)
        return (alpha, t + 1), None

    (alpha, _), _ = jax.lax.scan(masked_step, (alpha0, 0), logp)
    return jax.nn.logsumexp(alpha + final)


def bigram_den_arcs(bigram_logp: np.ndarray, blank_id: int,
                    sos_logp: Optional[np.ndarray] = None,
                    eos_logp: Optional[np.ndarray] = None,
                    tokens: Optional[np.ndarray] = None
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                               np.ndarray, int, np.ndarray]:
    """Denominator graph = CTC topology ∘ token-bigram LM (host, numpy).

    bigram_logp: (K, K) log P(v|u) over the K modeled tokens; `tokens` maps
    the K rows to vocabulary ids (default: all non-blank ids 0..K, shifted
    around blank_id).  State layout: 0 = start (no context); 1+2k = "last
    frame was token k"; 2+2k = "saw blank after token k".  Blank arcs carry
    weight 0; a token arc entering context v carries log P(v|u); repeating
    token k without an intervening blank is a weight-0 continuation.

    Returns (src, dst, label, weight, num_states, final) for
    `fsa_forward_score`.
    """
    K = bigram_logp.shape[0]
    if tokens is None:
        tokens = np.array([t for t in range(K + 1) if t != blank_id][:K],
                          np.int32)
    sos_logp = (sos_logp if sos_logp is not None
                else np.full((K,), -np.log(K), np.float32))
    eos_logp = eos_logp if eos_logp is not None else np.zeros((K,),
                                                              np.float32)
    S = 1 + 2 * K
    st_tok = lambda k: 1 + 2 * k        # noqa: E731  last frame = token k
    st_blank = lambda k: 2 + 2 * k      # noqa: E731  blank seen, context k

    src, dst, lab, wgt = [], [], [], []

    def arc(s, d, l, w):  # noqa: E741
        src.append(s); dst.append(d); lab.append(int(l)); wgt.append(float(w))

    arc(0, 0, blank_id, 0.0)                      # leading blanks
    for v in range(K):
        arc(0, st_tok(v), tokens[v], sos_logp[v])     # first emission
    for u in range(K):
        arc(st_tok(u), st_tok(u), tokens[u], 0.0)     # continuation
        arc(st_tok(u), st_blank(u), blank_id, 0.0)
        arc(st_blank(u), st_blank(u), blank_id, 0.0)
        # re-emission of u needs a blank in between (CTC dedup rule)
        arc(st_blank(u), st_tok(u), tokens[u], bigram_logp[u, u])
        for v in range(K):
            if v != u:
                arc(st_tok(u), st_tok(v), tokens[v], bigram_logp[u, v])
                arc(st_blank(u), st_tok(v), tokens[v], bigram_logp[u, v])

    final = np.full((S,), NEG_INF, np.float32)
    final[0] = 0.0                                # empty sequence
    for u in range(K):
        final[st_tok(u)] = eos_logp[u]
        final[st_blank(u)] = eos_logp[u]
    return (np.asarray(src, np.int32), np.asarray(dst, np.int32),
            np.asarray(lab, np.int32), np.asarray(wgt, np.float32), S, final)


def dense_unigram_den_score(logp, t_len, unigram_logp, blank_id: int):
    """Denominator forward score under a context-independent (unigram) token
    LM — arc-table-free: O(T·V) instead of O(T·V²).

    States: "last frame was blank/start" (scalar β) + "last frame was token
    v" (vector α_v).  Transitions per frame t:
      β'       = logp[t,blank] + LSE(β, LSE_v α_v)
      α'_v     = logp[t,v] + LSE( α_v,                        # continuation
                                  u(v) + LSE(β, LSE_{w≠v} α_w) )  # new emit
    where u(v)=unigram_logp[v].  The LSE_{w≠v} term is computed for all v at
    once by exclusion from the total (stable: probs-space subtraction with
    clamping, exact where it matters because the excluded term is ≤ total).
    """
    V = logp.shape[1]
    nonblank = jnp.arange(V) != blank_id
    u = jnp.where(nonblank, unigram_logp, NEG_INF)

    def step(carry, xt):
        alpha, beta, t = carry            # alpha: (V,), beta: scalar
        tot = jax.nn.logsumexp(jnp.concatenate([alpha, beta[None]]))
        # LSE over {β} ∪ {α_w : w ≠ v}: exp-space exclusion, clamped at 0
        rest = tot + jnp.log1p(-jnp.clip(jnp.exp(alpha - tot), 0.0,
                                         1.0 - 1e-7))
        new_alpha = xt + jnp.logaddexp(alpha, u + rest)
        new_alpha = jnp.where(nonblank, new_alpha, NEG_INF)
        new_beta = xt[blank_id] + jnp.logaddexp(
            beta, jax.nn.logsumexp(jnp.where(nonblank, alpha, NEG_INF)))
        keep = t < t_len
        alpha = jnp.where(keep, new_alpha, alpha)
        beta = jnp.where(keep, new_beta, beta)
        return (alpha, beta, t + 1), None

    alpha0 = jnp.full((V,), NEG_INF, jnp.float32)
    (alpha, beta, _), _ = jax.lax.scan(step, (alpha0, jnp.float32(0.0), 0),
                                       logp)
    return jax.nn.logsumexp(jnp.concatenate([alpha, beta[None]]))
