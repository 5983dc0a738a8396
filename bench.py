"""Long-form ASR throughput benchmark on the flagship (reverb_asr_v1-class)
model: fbank → conformer encoder (bf16) → CTC log-probs → device-side CTC
prefix beam search.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: BASELINE.json north-star ≥20× real-time per v5e chip on long-form
audio (the reference publishes accuracy only — BASELINE.md).
"""

import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from reverb_tpu.decode.api import encode_and_ctc_topk
    from reverb_tpu.decode.prefix_beam import (
        ctc_prefix_beam_search_device_topk)
    from reverb_tpu.frontend.fbank import FbankConfig, compute_fbank_batch
    from reverb_tpu.models.asr_model import ModelConfig, init_params
    from reverb_tpu.models.presets import reverb_large

    dev = jax.devices()[0]
    on_tpu = dev.platform != 'cpu'
    # full flagship on TPU; slimmer on CPU so the bench stays runnable anywhere
    conf = reverb_large() if on_tpu else __import__(
        'reverb_tpu.models.presets', fromlist=['reverb_small']).reverb_small()
    cfg = ModelConfig.from_config(conf)
    import dataclasses
    cfg = dataclasses.replace(cfg, compute_dtype=jnp.bfloat16)
    params = init_params(jax.random.PRNGKey(0), cfg)
    if on_tpu:
        # bf16 params: inference-precision deployment default
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params)

    CHUNK = 2051                      # 20.51 s of 10 ms frames
    B = 32 if on_tpu else 2           # server-batch: 32 chunks in flight
    BEAM = 10
    sr = 16000
    chunk_sec = CHUNK * 0.01
    samples = int(chunk_sec * sr) + 400

    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(B, samples).astype(np.float32) * 1000)
    feats_lens = jnp.full((B,), CHUNK, jnp.int32)
    cat = jnp.array([1.0, 0.0], jnp.float32)

    @jax.jit
    def pipeline(params, wave):
        feats = compute_fbank_batch(wave, FbankConfig())[:, :CHUNK]
        # deferred-normalization CTC: top-k + blank straight off the bf16
        # logits; the (B,T,V) f32 log-prob table is never materialized
        enc, enc_lens, tk_logp, tk_idx, blank_lp = encode_and_ctc_topk(
            params, cfg, feats, feats_lens, cat, BEAM)
        prefixes, plens, scores, times = ctc_prefix_beam_search_device_topk(
            tk_logp, tk_idx, blank_lp, enc_lens, BEAM)
        return prefixes, plens, scores

    # warmup/compile
    out = pipeline(params, wave)
    jax.block_until_ready(out)

    iters = 6 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(params, wave)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    audio_sec = B * chunk_sec * iters
    rtf = audio_sec / dt
    print(json.dumps({
        'metric': 'long-form ASR throughput (xRT, fbank+encoder+CTC prefix '
                  'beam, flagship model, bf16)',
        'value': round(rtf, 2),
        'unit': 'x realtime per chip',
        'vs_baseline': round(rtf / 20.0, 2),
    }))


if __name__ == '__main__':
    sys.exit(main())
