"""Streaming serving latency on the TPU: per-chunk encoder step latency and
end-to-end streamed RTF for the flagship model.

The streaming contract (SURVEY §3.3): 16-frame decoding chunks (640 ms of
audio at 10 ms frames × 4 subsampling), static att/cnn ring caches.  Two
numbers matter for a streaming deployment:
  - p50/p95 latency of one accept_waveform+decode-ready step (one 640 ms
    hop): must be « hop duration for real-time margin;
  - streamed xRT: audio seconds processed per wall second feeding
    hop-sized pieces sequentially (dispatch-latency bound — single stream,
    no batching).

Prints one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


class _Model:
    pass


def main():
    import dataclasses
    from reverb_tpu.cli.model import StreamingASR
    from reverb_tpu.frontend.fbank import FbankConfig
    from reverb_tpu.models.asr_model import ModelConfig, init_params
    from reverb_tpu.models.presets import reverb_large, reverb_small

    dev = jax.devices()[0]
    on_tpu = dev.platform != 'cpu'
    conf = reverb_large() if on_tpu else reverb_small()
    cfg = ModelConfig.from_config(conf)
    if on_tpu:
        cfg = cfg.with_compute_dtype(jnp.bfloat16)
    params = init_params(jax.random.PRNGKey(0), cfg)
    if on_tpu:
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params)

    m = _Model()
    m.model_config = cfg
    m.params = params
    m.fbank = FbankConfig()
    asr = StreamingASR(m, decoding_chunk_size=16, num_left_chunks=16)

    sr = 16000
    hop_s = asr.stride * 0.01                  # 640 ms of audio per step
    hop = int(hop_s * sr)
    rng = np.random.RandomState(0)
    audio = (rng.randn(int(20 * sr)) * 1000).astype(np.float32)

    # warmup two hops (compile)
    asr.accept_waveform(audio[:hop])
    asr.accept_waveform(audio[hop:2 * hop])
    asr.reset()

    lat = []
    t_start = time.perf_counter()
    pos = 0
    while pos + hop <= len(audio):
        t0 = time.perf_counter()
        asr.accept_waveform(audio[pos:pos + hop])
        lat.append(time.perf_counter() - t0)
        pos += hop
    hyp = asr.decode('ctc_greedy_search')
    wall = time.perf_counter() - t_start
    lat = np.array(lat[1:])                    # drop residual-compile hop

    print(json.dumps({
        'metric': 'streaming encoder step latency (flagship, 640 ms hops, '
                  'chunk 16, left 16, bf16)',
        'p50_ms': round(float(np.percentile(lat, 50)) * 1e3, 2),
        'p95_ms': round(float(np.percentile(lat, 95)) * 1e3, 2),
        'hop_ms': hop_s * 1e3,
        'streamed_xRT': round(pos / sr / wall, 2),
        'tokens': len(hyp.tokens) if hyp is not None else 0,
        'device': getattr(dev, 'device_kind', dev.platform),
    }))


if __name__ == '__main__':
    main()
