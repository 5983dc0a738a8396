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
