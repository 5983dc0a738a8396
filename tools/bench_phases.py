"""Phase-level timing of the headline serving pipeline on the TPU:
frontend fbank / encoder+CTC top-k / prefix-beam (device scan + host nbest
extraction) / attention rescoring (host packing + device program).

Same setup as bench.py (flagship bf16, B=32×2051 frames, peaky CTC head).
Prints one JSON line with per-phase seconds per batch.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    # persistent XLA compile cache: repeated runs (and the round-end driver's
    # submetric subprocesses) reload compiled programs instead of re-stressing
    # the remote compile service
    from reverb_tpu.export.aot import maybe_enable_default_cache
    maybe_enable_default_cache()
    import dataclasses
    from reverb_tpu.decode.api import encode_and_ctc, encode_and_ctc_topk
    from reverb_tpu.decode.prefix_beam import ctc_prefix_beam_search_topk
    from reverb_tpu.decode.rescoring import attention_rescoring
    from reverb_tpu.frontend.fbank import FbankConfig, compute_fbank_batch
    from reverb_tpu.models.asr_model import ModelConfig, init_params
    from reverb_tpu.models.presets import reverb_large, reverb_small

    dev = jax.devices()[0]
    on_tpu = dev.platform != 'cpu'
    conf = reverb_large() if on_tpu else reverb_small()
    cfg = ModelConfig.from_config(conf)
    cfg = cfg.with_compute_dtype(jnp.bfloat16)
    params = init_params(jax.random.PRNGKey(0), cfg)
    if on_tpu:
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params)

    CHUNK, B, BEAM, SKIP = 2051, (32 if on_tpu else 2), 10, 0.95
    sr = 16000
    samples = int(CHUNK * 0.01 * sr) + 400
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(B, samples).astype(np.float32) * 1000)
    feats_lens = jnp.full((B,), CHUNK, jnp.int32)
    cat = jnp.asarray(np.array([1.0, 0.0], np.float32))

    @jax.jit
    def frontend(w):
        return compute_fbank_batch(w, FbankConfig())[:, :CHUNK]

    feats = frontend(wave)

    # peaky CTC head, as bench.py
    params['ctc']['ctc_lo'] = dict(params['ctc']['ctc_lo'])
    params['ctc']['ctc_lo']['weight'] = params['ctc']['ctc_lo']['weight'] * 8
    logits = np.asarray(encode_and_ctc(params, cfg, feats[:4], feats_lens[:4],
                                       cat)[2], np.float32)
    blank = logits[..., cfg.blank_id]
    non_blank = np.max(np.delete(logits, cfg.blank_id, -1), -1)
    bias = float(np.quantile((non_blank - blank).reshape(-1), 0.75))
    b = params['ctc']['ctc_lo']['bias']
    params['ctc']['ctc_lo']['bias'] = b.at[cfg.blank_id].add(
        jnp.asarray(bias, b.dtype))

    def sync(tree):
        # fetch ONE scalar element: forces completion (axon
        # block_until_ready can return early) without pulling the full
        # tensor through the remote-TPU tunnel — the real pipeline keeps
        # these arrays on device between programs
        leaf = jax.tree.leaves(tree)[0]
        float(leaf[(0,) * leaf.ndim].astype(jnp.float32))
        return tree

    phases = {}

    def timeit(name, fn, iters=6):
        fn()                       # warmup/compile
        fn()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        dt = (time.perf_counter() - t0) / iters
        phases[name] = round(dt, 4)
        return out

    timeit('frontend', lambda: sync(frontend(wave)))
    enc = timeit('encoder_ctc_topk',
                 lambda: sync(encode_and_ctc_topk(
                     params, cfg, feats, feats_lens, cat, BEAM)))
    encoder_out, encoder_lens, tk_logp, tk_idx, blank_lp = enc
    prefix = timeit('prefix_beam',
                    lambda: ctc_prefix_beam_search_topk(
                        tk_logp, tk_idx, blank_lp, encoder_lens, BEAM,
                        cfg.blank_id, blank_skip_threshold=SKIP,
                        vocab_size=cfg.vocab_size))
    timeit('rescoring', lambda: attention_rescoring(
        params, cfg, prefix, encoder_out, encoder_lens, 0.1, 0.0,
        cat_embs=cat))

    total = sum(phases.values())
    audio = B * CHUNK * 0.01
    print(json.dumps({'phases_s_per_batch': phases,
                      'total_s': round(total, 4),
                      'xRT': round(audio / total, 1),
                      'audio_s': audio}))


if __name__ == '__main__':
    main()
