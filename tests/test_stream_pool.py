"""MultiStreamASR: B batched sessions must equal B independent
StreamingASR sessions — including staggered starts (per-stream offsets
through one batched program) and slot reset/reuse."""

import numpy as np

from tests.helpers import build_tiny_model_dir


def _load(tmp_path):
    from reverb_tpu.cli.reverb import load_model
    d = build_tiny_model_dir(tmp_path / 'model')
    return load_model(str(d))


def test_pool_matches_single_stream(tmp_path):
    from reverb_tpu.cli.model import StreamingASR
    from reverb_tpu.cli.stream_pool import MultiStreamASR

    model = _load(tmp_path)
    B = 3
    pool = MultiStreamASR(model, n_streams=B, decoding_chunk_size=4,
                          num_left_chunks=4, beam_size=4,
                          keep_encoder_out=True)
    singles = [StreamingASR(model, decoding_chunk_size=4, num_left_chunks=4,
                            beam_size=4) for _ in range(B)]
    rng = np.random.RandomState(0)
    audio = [rng.randn(6, 3200).astype(np.float32) * 0.1 for _ in range(B)]

    for hop in range(6):
        for b in range(B):
            pool.accept_waveform(b, audio[b][hop])
            singles[b].accept_waveform(audio[b][hop])
        while pool.step().any():      # drain the multi-hop backlog
            pass
        for b in range(B):
            pg = pool.decode(b, 'ctc_greedy_search')
            sg = singles[b].decode('ctc_greedy_search')
            assert pg.tokens == sg.tokens and pg.times == sg.times, \
                (hop, b)
            pb = pool.decode(b, 'ctc_prefix_beam_search')
            sb = singles[b].decode('ctc_prefix_beam_search')
            assert pb.tokens == sb.tokens and pb.times == sb.times, \
                (hop, b)
            assert np.allclose(pb.score, sb.score, atol=1e-4), (hop, b)
    # rescoring over the accumulated encoder output
    for b in range(B):
        pr = pool.decode(b, 'attention_rescoring')
        sr = singles[b].decode('attention_rescoring')
        assert pr.tokens == sr.tokens, b


def test_pool_staggered_join_and_reset(tmp_path):
    """Stream 1 joins three hops late; stream 0 is reset mid-flight.  Each
    slot must match a fresh single-stream session with the same audio —
    per-stream offsets/validity masks can't leak across slots."""
    from reverb_tpu.cli.model import StreamingASR
    from reverb_tpu.cli.stream_pool import MultiStreamASR

    model = _load(tmp_path)
    pool = MultiStreamASR(model, n_streams=2, decoding_chunk_size=4,
                          num_left_chunks=4, beam_size=4)
    rng = np.random.RandomState(1)
    a0 = rng.randn(8, 3200).astype(np.float32) * 0.1
    a1 = rng.randn(5, 3200).astype(np.float32) * 0.1

    for hop in range(8):
        pool.accept_waveform(0, a0[hop])
        if hop >= 3:
            pool.accept_waveform(1, a1[hop - 3])
        while pool.step().any():
            pass

    s1 = StreamingASR(model, decoding_chunk_size=4, num_left_chunks=4,
                      beam_size=4)
    for hop in range(5):
        s1.accept_waveform(a1[hop])
    pg = pool.decode(1, 'ctc_greedy_search')
    sg = s1.decode('ctc_greedy_search')
    assert pg.tokens == sg.tokens and pg.times == sg.times
    pb = pool.decode(1, 'ctc_prefix_beam_search')
    sb = s1.decode('ctc_prefix_beam_search')
    assert pb.tokens == sb.tokens

    # reset slot 0 and run new audio through it; slot 1 state untouched
    pool.reset_slot(0)
    assert pool.decode(0).tokens == []
    b0 = rng.randn(4, 3200).astype(np.float32) * 0.1
    for hop in range(4):
        pool.accept_waveform(0, b0[hop])
        while pool.step().any():
            pass
    s0 = StreamingASR(model, decoding_chunk_size=4, num_left_chunks=4,
                      beam_size=4)
    for hop in range(4):
        s0.accept_waveform(b0[hop])
    assert pool.decode(0, 'ctc_greedy_search').tokens == \
        s0.decode('ctc_greedy_search').tokens
    # slot 1 unchanged by slot-0 reset
    assert pool.decode(1, 'ctc_prefix_beam_search').tokens == sb.tokens
