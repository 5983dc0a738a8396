"""Pallas whole-scan beam kernel (ops/beam_scan.py) vs the lax.scan path.

The kernel body calls the same `_step` as the scan, so these tests pin the
only substituted pieces: the iterative top-k (tie order vs lax.top_k), the
VMEM state carry across grid steps, and the block plumbing — by asserting
bit-identical search results on the same inputs (interpret mode on CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reverb_tpu.decode import prefix_beam as pb


def _rand_topk(rng, B, T, K2, V, peaky=False):
    logits = rng.randn(B, T, V).astype(np.float32)
    if peaky:
        logits[..., 0] += rng.uniform(1.0, 4.0, (B, T)).astype(np.float32)
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    tk_logp, tk_idx = jax.lax.top_k(logp, K2)
    return tk_logp, tk_idx.astype(jnp.int32), logp[..., 0]


def _run(tk_logp, tk_idx, num_t, K, L, interpret, ts=None, acc=None,
         hs=None, tail=None):
    out = pb._search_batched(tk_logp, tk_idx, num_t, K, 0, L, ts, acc, hs,
                             tail, None, interpret=interpret)
    return [np.asarray(x) for x in out]


def _assert_same(a, b):
    for x, y, name in zip(a, b, ['prefixes', 'plens', 'scores', 'times']):
        if x.dtype.kind == 'f':
            np.testing.assert_allclose(x, y, rtol=0, atol=1e-5, err_msg=name)
        else:
            np.testing.assert_array_equal(x, y, err_msg=name)


def test_iter_topk_matches_lax_topk():
    rng = np.random.RandomState(0)
    x = rng.randn(7, 110).astype(np.float32)
    # force ties and -inf entries
    x[0, 5:20] = -np.inf
    x[1, :] = -1e30
    x[2, 10:14] = x[2, 3]
    v1, i1 = jax.lax.top_k(jnp.asarray(x), 10)
    v2, i2 = pb._iter_topk(jnp.asarray(x), 10)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_kernel_matches_scan_dense():
    rng = np.random.RandomState(1)
    B, T, K2, V, K = 3, 40, 5, 30, 5
    tk_logp, tk_idx, _ = _rand_topk(rng, B, T, K2, V)
    num_t = jnp.asarray([40, 17, 1], jnp.int32)
    ref = _run(tk_logp, tk_idx, num_t, K, T, False)
    ker = _run(tk_logp, tk_idx, num_t, K, T, True)
    _assert_same(ker, ref)


def test_kernel_matches_scan_blank_skip():
    rng = np.random.RandomState(2)
    B, T, K2, V, K = 2, 60, 5, 30, 5
    tk_logp, tk_idx, blank_lp = _rand_topk(rng, B, T, K2, V, peaky=True)
    num_t = jnp.asarray([60, 33], jnp.int32)
    cap = T // 2
    ts, n_keep, acc, hs, tail = pb._compress_blanks(blank_lp, num_t, 0.6, cap)
    g_logp = jnp.take_along_axis(tk_logp, ts[..., None], axis=1)
    g_idx = jnp.take_along_axis(tk_idx, ts[..., None], axis=1)
    ref = _run(g_logp, g_idx, n_keep, K, cap, False, ts, acc, hs, tail)
    ker = _run(g_logp, g_idx, n_keep, K, cap, True, ts, acc, hs, tail)
    _assert_same(ker, ref)


def test_full_entrypoint_kernel_vs_scan(monkeypatch):
    """End-to-end ctc_prefix_beam_search_device_topk with the kernel forced
    on (interpret lowers on CPU) vs forced off — including the lax.switch
    scan-length bucketing path."""
    rng = np.random.RandomState(3)
    B, T, K2, V, K = 2, 64, 5, 30, 5
    tk_logp, tk_idx, blank_lp = _rand_topk(rng, B, T, K2, V, peaky=True)
    lens = jnp.asarray([64, 40], jnp.int32)

    ref = pb.ctc_prefix_beam_search_device_topk(
        tk_logp, tk_idx, blank_lp, lens, K, 0, 0, 0.6, T // 2, None)

    import reverb_tpu.ops.beam_scan as bs
    real_fwd = bs.beam_scan_forward
    calls = {'n': 0}

    def counting(*a, **kw):
        calls['n'] += 1
        a = list(a)
        a[-1] = True          # force interpret mode on CPU
        return real_fwd(*a, **kw)

    monkeypatch.setattr(pb, '_use_beam_kernel', lambda: True)
    monkeypatch.setattr(bs, 'beam_scan_forward', counting)
    pb.ctc_prefix_beam_search_device_topk.clear_cache()
    try:
        ker = pb.ctc_prefix_beam_search_device_topk(
            tk_logp, tk_idx, blank_lp, lens, K, 0, 0, 0.6, T // 2, None)
        assert calls['n'] >= 1
        _assert_same([np.asarray(x) for x in ker],
                     [np.asarray(x) for x in ref])
    finally:
        pb.ctc_prefix_beam_search_device_topk.clear_cache()


def test_kernel_results_pack():
    """Host packing over kernel outputs produces well-formed DecodeResults."""
    rng = np.random.RandomState(4)
    B, T, K2, V, K = 2, 30, 5, 20, 5
    tk_logp, tk_idx, _ = _rand_topk(rng, B, T, K2, V)
    num_t = jnp.full((B,), T, jnp.int32)
    prefixes, plens, scores, times = _run(tk_logp, tk_idx, num_t, K, T, True)
    res = pb._pack_results(prefixes, plens, scores, times)
    assert len(res) == B
    for r in res:
        assert len(r.nbest) >= 1
        assert len(r.tokens) == len(r.times)
        assert r.nbest_scores == sorted(r.nbest_scores, reverse=True)
