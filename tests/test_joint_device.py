"""Device-scan joint time-sync decoding vs the host implementation.

decode/joint.py's host loop is oracle-verified against the reference
(beam_search_timesync.py); decode/joint_device.py must reproduce its beam
contents and scores exactly (f32 vs f64 accumulation aside).  Timestamps
share the semantics except the documented resurrected-prefix end-time
divergence (joint_device.py module docstring)."""

import jax
import numpy as np
import pytest

from reverb_tpu.decode.joint import TimeSyncBeamSearch, joint_decoding
from reverb_tpu.decode.joint_device import joint_decoding_device
from reverb_tpu.models.asr_model import ModelConfig, init_params
from tests.test_model_forward import TINY


@pytest.fixture(scope='module')
def model():
    cfg = ModelConfig.from_config(TINY)
    params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _mk_inputs(seed, B, T, V, D, blank_boost=2.0, spike=4.0):
    rng = np.random.RandomState(seed)
    enc = rng.randn(B, T, D).astype(np.float32)
    logits = rng.randn(B, T, V).astype(np.float32)
    logits[:, :, 0] += blank_boost
    # a few emission spikes so beams carry real prefixes
    for b in range(B):
        for t in rng.choice(T, size=max(2, T // 4), replace=False):
            logits[b, t, rng.randint(1, V)] += spike
    ctc = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    lens = np.full((B,), T, np.int64)
    if B > 1:
        lens[1] = T - 3
    return enc, lens, ctc


@pytest.mark.parametrize('seed,ctc_w,bonus,thr', [
    (0, 0.5, 0.5, 1.0),
    (1, 0.3, 0.0, 1.0),
    (2, 0.5, 0.5, 0.9),     # blank-threshold frame skipping active
    (3, 1.0, 0.2, 1.0),     # CTC-only scoring
])
def test_device_matches_host(model, seed, ctc_w, bonus, thr):
    cfg, params = model
    B, T, V, D = 2, 14, 50, 32
    enc, lens, ctc = _mk_inputs(seed, B, T, V, D)
    host = joint_decoding(params, cfg, enc, lens, ctc, ctc_weight=ctc_w,
                          beam_size=3, length_bonus=bonus, device=False)
    # host path's blank_threshold lives on TimeSyncBeamSearch; drive it
    # directly for the thr<1 case
    if thr < 1.0:
        host = []
        for b in range(B):
            bs = TimeSyncBeamSearch(params, cfg, beam_size=3,
                                    ctc_weight=ctc_w, length_bonus=bonus,
                                    pre_beam_ratio=1.5, blank=cfg.blank_id,
                                    blank_threshold=thr,
                                    max_len=int(lens[b]) + 2)
            nb = bs(enc[b:b + 1, :int(lens[b])], ctc[b, :int(lens[b])])
            host.append(nb[0])
    dev = joint_decoding_device(params, cfg, enc, lens, ctc,
                                ctc_weight=ctc_w, beam_size=3,
                                pre_beam_ratio=1.5, length_bonus=bonus,
                                blank_threshold=thr)
    assert len(dev) == B
    for b in range(B):
        if thr < 1.0:
            h_tokens = host[b][0][1:]
            h_score = host[b][1]
            h_starts = host[b][2][1:]
            h_conf = host[b][4][1:]     # already max(ctc, att), log-domain
        else:
            h_tokens, h_score = host[b].tokens, host[b].score
            h_starts = host[b].times
            h_conf = [np.log(max(c, 1e-300))
                      for c in host[b].tokens_confidence]
        assert dev[b].tokens == h_tokens, f'utt {b}'
        np.testing.assert_allclose(dev[b].score, h_score, rtol=2e-4,
                                   atol=2e-4)
        assert dev[b].times == h_starts, f'utt {b} start times'
        d_conf = [np.log(max(c, 1e-300)) for c in dev[b].tokens_confidence]
        np.testing.assert_allclose(d_conf, h_conf, rtol=2e-3, atol=2e-3)


def test_device_joint_empty_result(model):
    """All-blank input decodes to the empty prefix on both paths."""
    cfg, params = model
    B, T, V, D = 1, 8, 50, 32
    rng = np.random.RandomState(9)
    enc = rng.randn(B, T, D).astype(np.float32)
    logits = np.full((B, T, V), -8.0, np.float32)
    logits[:, :, 0] = 4.0
    ctc = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    lens = np.array([T], np.int64)
    host = joint_decoding(params, cfg, enc, lens, ctc, beam_size=2,
                          device=False)
    dev = joint_decoding_device(params, cfg, enc, lens, ctc, beam_size=2)
    assert dev[0].tokens == host[0].tokens
    np.testing.assert_allclose(dev[0].score, host[0].score, rtol=2e-4,
                               atol=2e-4)
