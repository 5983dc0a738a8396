"""StreamingASR incremental API smoke test."""

import numpy as np
import pytest

from tests.helpers import build_tiny_model_dir


def test_streaming_asr(tmp_path):
    from reverb_tpu.cli.model import StreamingASR
    from reverb_tpu.cli.reverb import load_model

    d = build_tiny_model_dir(tmp_path / 'model')
    model = load_model(str(d))
    stream = StreamingASR(model, decoding_chunk_size=4, num_left_chunks=4)
    rng = np.random.RandomState(0)
    for _ in range(4):
        stream.accept_waveform(rng.randn(4000).astype(np.float32) * 0.1)
    res = stream.decode('ctc_greedy_search')
    assert isinstance(res.tokens, list)
    res2 = stream.decode('attention_rescoring', beam_size=3)
    assert isinstance(stream.text(), str)
    # reset clears state
    stream.reset()
    assert stream.decode().tokens == []


def test_incremental_decode_equals_from_scratch(tmp_path):
    """The hop-resumable decoders (decode/streaming_beam.py) must produce
    exactly what the batch searches produce over the concatenated stream —
    greedy tokens/times, the prefix beam's full nbest (tokens, scores,
    viterbi times), and the rescoring result built on the carried beam."""
    import jax.numpy as jnp
    from reverb_tpu.cli.model import StreamingASR
    from reverb_tpu.cli.reverb import load_model
    from reverb_tpu.decode.greedy import ctc_greedy_search
    from reverb_tpu.decode.prefix_beam import ctc_prefix_beam_search

    d = build_tiny_model_dir(tmp_path / 'model')
    model = load_model(str(d))
    stream = StreamingASR(model, decoding_chunk_size=4, num_left_chunks=4,
                          beam_size=4)
    rng = np.random.RandomState(7)
    mid_checked = False
    for i in range(6):
        stream.accept_waveform(rng.randn(3200).astype(np.float32) * 0.1)
        if not stream._enc_chunks:
            continue
        # compare at EVERY hop, not just the end — a seam bug (carried
        # argmax, beam state, or global frame offsets) shows up mid-stream
        enc = jnp.asarray(np.concatenate(stream._enc_chunks)[None])
        lens = jnp.array([enc.shape[1]], jnp.int32)
        ctc_probs = stream._ctc(stream.params["ctc"], enc)
        ref_g = ctc_greedy_search(ctc_probs, lens, stream.cfg.blank_id)[0]
        inc_g = stream.decode('ctc_greedy_search')
        assert inc_g.tokens == ref_g.tokens
        assert inc_g.times == ref_g.times
        ref_b = ctc_prefix_beam_search(ctc_probs, lens, 4,
                                       stream.cfg.blank_id)[0]
        inc_b = stream.decode('ctc_prefix_beam_search')
        assert inc_b.nbest == ref_b.nbest
        assert inc_b.nbest_times == ref_b.nbest_times
        np.testing.assert_allclose(inc_b.nbest_scores, ref_b.nbest_scores,
                                   rtol=1e-5, atol=1e-5)
        mid_checked = True
    assert mid_checked
    # rescoring over the carried beam matches rescoring over the batch beam
    res_inc = stream.decode('attention_rescoring')
    from reverb_tpu.decode.rescoring import attention_rescoring
    enc = jnp.asarray(np.concatenate(stream._enc_chunks)[None])
    lens = jnp.array([enc.shape[1]], jnp.int32)
    prefix = ctc_prefix_beam_search(stream._ctc(stream.params["ctc"], enc), lens, 4,
                                    stream.cfg.blank_id)
    ref = attention_rescoring(stream.params, stream.cfg, prefix, enc, lens,
                              0.1, 0.0, cat_embs=stream.cat)[0]
    assert res_inc.tokens == ref.tokens

    # buffer growth path: a tiny init_len forces _grow mid-stream
    from reverb_tpu.decode.streaming_beam import IncrementalBeam
    rng2 = np.random.RandomState(3)
    V, T = 8, 40
    probs = rng2.randn(T, V).astype(np.float32)
    probs = probs - np.log(np.exp(probs).sum(-1, keepdims=True))
    small = IncrementalBeam(3, 0, init_len=4)
    for s in range(0, T, 5):
        small.accept(jnp.asarray(probs[s:s + 5]))
    ref_b = ctc_prefix_beam_search(jnp.asarray(probs[None]),
                                   jnp.array([T], jnp.int32), 3, 0)[0]
    got = small.finalize()
    assert got.nbest == ref_b.nbest
    assert got.nbest_times == ref_b.nbest_times
