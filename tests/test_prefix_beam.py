"""Device-side CTC prefix beam search vs an independent host dict
implementation of the same semantics (written from the algorithm, used only
as a test oracle)."""

import math
from collections import defaultdict

import numpy as np
import jax.numpy as jnp
import pytest

from reverb_tpu.decode.prefix_beam import (ctc_prefix_beam_search,
                                           ctc_prefix_beam_search_device)

NEG = -float('inf')


def _logadd(a, b):
    if a == NEG:
        return b
    if b == NEG:
        return a
    m = max(a, b)
    return m + math.log(math.exp(a - m) + math.exp(b - m))


class _E:
    __slots__ = ('s', 'ns', 'v_s', 'v_ns', 'ts', 'tns')

    def __init__(self):
        self.s = NEG
        self.ns = NEG
        self.v_s = NEG
        self.v_ns = NEG
        self.ts = []
        self.tns = []


def prefix_beam_dict(logp, beam, blank=0, num_t=None):
    """Host oracle: dict-based prefix beam search, DE-FACTO reference
    semantics — including the search.py:178 `vs_ns` typo, under which a
    keep entry's viterbi ns-score is never updated (stays fresh -inf), so
    token times stamp the append frame and thread through the blank bank.
    The shipped reverb CTMs come from this behavior, so it is what both the
    device scan and this oracle reproduce."""
    T, V = logp.shape
    num_t = T if num_t is None else num_t
    root = _E()
    root.s, root.v_s, root.v_ns = 0.0, 0.0, 0.0
    cur = {(): root}
    for t in range(num_t):
        topk = np.argsort(logp[t])[-beam:]
        nxt = defaultdict(_E)
        for u in topk:
            u = int(u)
            p = float(logp[t, u])
            for prefix, sc in cur.items():
                last = prefix[-1] if prefix else None
                score = _logadd(sc.s, sc.ns)
                vit = max(sc.v_s, sc.v_ns)
                times = sc.ts if sc.v_s > sc.v_ns else sc.tns
                if u == blank:
                    e = nxt[prefix]
                    e.s = _logadd(e.s, score + p)
                    if vit + p > e.v_s:
                        e.v_s = vit + p
                        e.ts = list(times)
                elif u == last:
                    e = nxt[prefix]
                    e.ns = _logadd(e.ns, sc.ns + p)
                    # typo: e.v_ns NOT updated; the time overwrite fires
                    # only when the parent's v_ns is live (fresh extends)
                    if sc.v_ns > NEG:
                        e.tns = sc.tns[:-1] + [t]
                    e2 = nxt[prefix + (u,)]
                    e2.ns = _logadd(e2.ns, sc.s + p)
                    if sc.s > NEG and sc.v_s + p > e2.v_ns:
                        e2.v_ns = sc.v_s + p
                        e2.tns = sc.ts + [t]
                else:
                    e = nxt[prefix + (u,)]
                    e.ns = _logadd(e.ns, score + p)
                    if vit + p > e.v_ns:
                        e.v_ns = vit + p
                        e.tns = times + [t]
        items = sorted(nxt.items(), key=lambda kv: -_logadd(kv[1].s, kv[1].ns))
        cur = dict(items[:beam])
    out = []
    for prefix, sc in sorted(cur.items(),
                             key=lambda kv: -_logadd(kv[1].s, kv[1].ns)):
        times = sc.ts if sc.v_s > sc.v_ns else sc.tns
        out.append((list(prefix), _logadd(sc.s, sc.ns), times))
    return out


def _rand_logp(rng, T, V, peaky=True):
    x = rng.randn(T, V).astype(np.float32)
    if peaky:
        # make it look like CTC posteriors: blank-dominant with spikes
        x[:, 0] += 2.0
        spikes = rng.randint(0, T, size=T // 3)
        x[spikes, rng.randint(1, V, size=len(spikes))] += 4.0
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_matches_dict_oracle(seed):
    rng = np.random.RandomState(seed)
    T, V, K = 25, 8, 5
    logp = _rand_logp(rng, T, V)
    expect = prefix_beam_dict(logp, K)
    prefixes, plens, scores, times = ctc_prefix_beam_search_device(
        jnp.asarray(logp[None]), jnp.array([T]), K)
    prefixes, plens, scores, times = (np.asarray(prefixes[0]),
                                      np.asarray(plens[0]),
                                      np.asarray(scores[0]),
                                      np.asarray(times[0]))
    got = [(prefixes[k, :plens[k]].tolist(), float(scores[k]),
            times[k, :plens[k]].tolist()) for k in range(K)]
    # compare prefix sets and scores of the full beam
    exp_map = {tuple(p): (s, tm) for p, s, tm in expect[:K]}
    got_map = {tuple(p): (s, tm) for p, s, tm in got}
    assert set(got_map) == set(exp_map), (sorted(exp_map), sorted(got_map))
    for p, (es, etm) in exp_map.items():
        gs, gtm = got_map[p]
        assert abs(gs - es) < 1e-3, (p, gs, es)
        assert gtm == etm, (p, gtm, etm)
    # and the 1-best ordering
    assert got[0][0] == expect[0][0]


def test_respects_lengths():
    rng = np.random.RandomState(3)
    T, V, K = 20, 6, 4
    logp = _rand_logp(rng, T, V)
    expect = prefix_beam_dict(logp, K, num_t=12)
    prefixes, plens, scores, _ = ctc_prefix_beam_search_device(
        jnp.asarray(logp[None]), jnp.array([12]), K)
    got_best = np.asarray(prefixes[0, 0, :plens[0, 0]]).tolist()
    assert got_best == expect[0][0]
    assert abs(float(scores[0, 0]) - expect[0][1]) < 1e-3


def test_batched_and_wrapper():
    rng = np.random.RandomState(4)
    T, V, K = 15, 7, 4
    lp1 = _rand_logp(rng, T, V)
    lp2 = _rand_logp(rng, T, V)
    batch = jnp.asarray(np.stack([lp1, lp2]))
    res = ctc_prefix_beam_search(batch, jnp.array([T, 10]), K)
    e1 = prefix_beam_dict(lp1, K)
    e2 = prefix_beam_dict(lp2, K, num_t=10)
    assert res[0].tokens == e1[0][0]
    assert res[1].tokens == e2[0][0]
    assert res[0].nbest is not None and len(res[0].nbest) >= 1
    assert len(res[0].times) == len(res[0].tokens)


def test_blank_skip_matches_exact_on_peaky_input():
    """Exact-mass blank-run folding: same 1-best and near-identical scores on
    CTC-like (blank-dominant, spiky) posteriors."""
    rng = np.random.RandomState(7)
    B, T, V, K = 4, 64, 50, 10
    x = rng.randn(B, T, V).astype(np.float32) * 0.3
    x[:, :, 0] += 8.0                       # strong blank
    for b in range(B):
        for t in rng.choice(T, size=8, replace=False):
            x[b, t, rng.randint(1, V)] += 14.0
    logp = x - np.log(np.exp(x).sum(-1, keepdims=True))
    lens = jnp.asarray([T, T, T - 5, T - 9])
    exact = ctc_prefix_beam_search_device(jnp.asarray(logp), lens, K)
    fast = ctc_prefix_beam_search_device(jnp.asarray(logp), lens, K,
                                         0, 0, 0.95, T // 2)
    for b in range(B):
        n_e = int(exact[1][b, 0])
        n_f = int(fast[1][b, 0])
        assert np.asarray(exact[0][b, 0, :n_e]).tolist() == \
            np.asarray(fast[0][b, 0, :n_f]).tolist(), b
        # timestamps map back through the kept-frame gather
        np.testing.assert_array_equal(np.asarray(exact[3][b, 0, :n_e]),
                                      np.asarray(fast[3][b, 0, :n_f]))
        # absolute scores shift by the dropped ε-mass of skipped frames, but
        # RELATIVE beam scores (what ranking and rescoring mixing see) hold
        e_rel = np.asarray(exact[2][b]) - float(exact[2][b, 0])
        f_rel = np.asarray(fast[2][b]) - float(fast[2][b, 0])
        live = np.asarray(exact[2][b]) > -1e29
        np.testing.assert_allclose(e_rel[live][:3], f_rel[live][:3],
                                   atol=0.12)


def test_topk_deferred_normalization_equivalence():
    """encode_and_ctc_topk + ctc_prefix_beam_search_topk ==
    encode_and_ctc + ctc_prefix_beam_search (the fused serving path never
    materializes the (B,T,V) f32 log-softmax; values agree to float-assoc
    tolerance, tokens/times exactly)."""
    import jax
    from reverb_tpu.decode.api import encode_and_ctc, encode_and_ctc_topk
    from reverb_tpu.decode.prefix_beam import (ctc_prefix_beam_search,
                                               ctc_prefix_beam_search_topk)
    from reverb_tpu.decode.greedy import (ctc_greedy_search,
                                          ctc_greedy_from_top1)
    from reverb_tpu.models.asr_model import ModelConfig, init_params
    from tests.test_model_forward import TINY
    cfg = ModelConfig.from_config(TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(3)
    B, T = 3, 71
    feats = jnp.asarray(rng.randn(B, T, 80), jnp.float32)
    lens = jnp.asarray([T, T - 9, T - 30])
    cat = jnp.array([1.0, 0.0], jnp.float32)
    K = 4

    enc_d, lens_d, probs = encode_and_ctc(params, cfg, feats, lens, cat)
    enc_t, lens_t, tklp, tki, blp = encode_and_ctc_topk(
        params, cfg, feats, lens, cat, K)
    np.testing.assert_allclose(np.asarray(enc_d), np.asarray(enc_t))
    # top-k values/indices match topk of the dense table
    dv, di = jax.lax.top_k(probs, K)
    np.testing.assert_array_equal(np.asarray(di), np.asarray(tki))
    np.testing.assert_allclose(np.asarray(dv), np.asarray(tklp),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(probs[:, :, cfg.blank_id]),
                               np.asarray(blp), atol=1e-5, rtol=1e-5)

    for thr in (0.0, 0.95):
        dense = ctc_prefix_beam_search(probs, lens_d, K, cfg.blank_id,
                                       blank_skip_threshold=thr)
        fused = ctc_prefix_beam_search_topk(tklp, tki, blp, lens_t, K,
                                            cfg.blank_id,
                                            blank_skip_threshold=thr)
        for a, b in zip(dense, fused):
            assert a.tokens == b.tokens, (thr, a.tokens, b.tokens)
            assert a.times == b.times
            assert a.nbest == b.nbest
            np.testing.assert_allclose(a.nbest_scores, b.nbest_scores,
                                       atol=1e-4)

    g1 = ctc_greedy_search(probs, lens_d, cfg.blank_id)
    g2 = ctc_greedy_from_top1(tki[:, :, 0], lens_t, cfg.blank_id)
    for a, b in zip(g1, g2):
        assert a.tokens == b.tokens and a.times == b.times
