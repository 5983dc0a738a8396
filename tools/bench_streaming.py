"""Streaming serving latency on the TPU: per-hop step latency and streamed
throughput for the flagship model — single-stream and multi-stream.

The streaming contract (SURVEY §3.3): 16-frame decoding chunks (640 ms of
audio at 10 ms frames x 4 subsampling), static att/cnn ring caches.

--streams 1 (default): per-hop accept_waveform latency p50/p95 and
single-stream xRT — dispatch-latency bound by design; the real-time margin
number for one interactive session.

--streams N: the deployment number.  N concurrent sessions batched through
ONE chunked-encoder program per hop (cli/stream_pool.py): per-hop pool.step
p50/p95 and aggregate streamed xRT = N * audio_s / wall.  A pool is
real-time-capable when p95(step) < hop duration; `streams_at_realtime`
scales N by the remaining margin (N * hop / p50).

Prints one JSON line.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


class _Model:
    pass


def _build_model():
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
    return m, dev, on_tpu


def bench_single(m, dev, seconds: float):
    from reverb_tpu.cli.model import StreamingASR
    asr = StreamingASR(m, decoding_chunk_size=16, num_left_chunks=16)
    sr = 16000
    hop_s = asr.stride * 0.01
    hop = int(hop_s * sr)
    rng = np.random.RandomState(0)
    audio = (rng.randn(int(seconds * sr)) * 1000).astype(np.float32)

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
    return {
        'metric': 'streaming encoder step latency (flagship, 640 ms hops, '
                  'chunk 16, left 16, bf16)',
        'p50_ms': round(float(np.percentile(lat, 50)) * 1e3, 2),
        'p95_ms': round(float(np.percentile(lat, 95)) * 1e3, 2),
        'hop_ms': hop_s * 1e3,
        'streamed_xRT': round(pos / sr / wall, 2),
        'tokens': len(hyp.tokens) if hyp is not None else 0,
        'device': getattr(dev, 'device_kind', dev.platform),
    }


def bench_pool(m, dev, n_streams: int, seconds: float):
    from reverb_tpu.cli.stream_pool import MultiStreamASR
    pool = MultiStreamASR(m, n_streams=n_streams, decoding_chunk_size=16,
                          num_left_chunks=16)
    sr = 16000
    hop_s = pool.stride * 0.01
    hop = int(hop_s * sr)
    rng = np.random.RandomState(0)
    audio = (rng.randn(n_streams, int(seconds * sr)) * 1000
             ).astype(np.float32)

    # warmup: four hops — the per-hop fbank pad shape walks 16000→32000→
    # steady over the first hops, and each distinct shape is a compile;
    # cover the full set before timing, then reset
    for h in range(4):
        for b in range(n_streams):
            pool.accept_waveform(b, audio[b, h * hop:(h + 1) * hop])
        pool.step()
    pool.reset()

    lat = []
    t_start = time.perf_counter()
    pos = 0
    while pos + hop <= audio.shape[1]:
        for b in range(n_streams):
            pool.accept_waveform(b, audio[b, pos:pos + hop])
        t0 = time.perf_counter()
        adv = pool.step()
        lat.append(time.perf_counter() - t0)
        assert adv.all() or not adv.any()
        pos += hop
    toks = pool.decode(0, 'ctc_greedy_search')
    wall = time.perf_counter() - t_start
    lat = np.array(lat[1:])
    p50 = float(np.percentile(lat, 50))
    return {
        'metric': f'multi-stream streaming pool (B={n_streams}, flagship, '
                  '640 ms hops, chunk 16, left 16, bf16)',
        'streams': n_streams,
        'p50_ms': round(p50 * 1e3, 2),
        'p95_ms': round(float(np.percentile(lat, 95)) * 1e3, 2),
        'hop_ms': hop_s * 1e3,
        'streamed_xRT': round(n_streams * pos / sr / wall, 2),
        'streams_at_realtime': int(n_streams * hop_s / p50),
        'tokens': len(toks.tokens) if toks is not None else 0,
        'device': getattr(dev, 'device_kind', dev.platform),
    }


def main():
    # persistent XLA compile cache: repeated runs (and the round-end driver's
    # submetric subprocesses) reload compiled programs instead of re-stressing
    # the remote compile service
    from reverb_tpu.export.aot import maybe_enable_default_cache
    maybe_enable_default_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument('--streams', type=int, default=1)
    ap.add_argument('--seconds', type=float, default=20.0)
    args = ap.parse_args()

    m, dev, on_tpu = _build_model()
    if args.streams <= 1:
        out = bench_single(m, dev, args.seconds)
    else:
        out = bench_pool(m, dev, args.streams, args.seconds)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
