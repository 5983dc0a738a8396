"""Diagnose bench warmup cost: per-program compile times + persistent-cache
hit/miss for the flagship serving set (VERDICT r3 Weak #1).

Prints one line per phase with wall seconds; JAX cache-miss explanations go
to stderr via logging.
"""
import logging
import os
import sys
import time

logging.basicConfig(level=logging.INFO, stream=sys.stderr)


def tick(label, t0):
    print(f'[{time.strftime("%H:%M:%S")}] {label}: {time.perf_counter()-t0:.1f}s',
          flush=True)
    return time.perf_counter()


def main():
    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update('jax_explain_cache_misses', True)
    jax.config.update('jax_log_compiles', True)
    from reverb_tpu.export.aot import maybe_enable_default_cache
    print('cache dir:', maybe_enable_default_cache(), flush=True)
    t0 = tick('import+cache', t0)

    from reverb_tpu.decode.api import decode, encode_and_ctc_topk
    from reverb_tpu.frontend.fbank import FbankConfig, compute_fbank_batch
    from reverb_tpu.models.asr_model import ModelConfig, init_params
    from reverb_tpu.models.presets import reverb_large
    dev = jax.devices()[0]
    on_tpu = dev.platform != 'cpu'
    conf = reverb_large()
    cfg = ModelConfig.from_config(conf).with_compute_dtype(jnp.bfloat16)
    params = init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    t0 = tick('init_params', t0)

    CHUNK, B, BEAM = 2051, 32, 10
    sr = 16000
    samples = int(CHUNK * 0.01 * sr) + 400
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(B, samples).astype(np.float32) * 1000)
    feats_lens = jnp.full((B,), CHUNK, jnp.int32)
    cat = jnp.asarray(np.array([1.0, 0.0], np.float32))

    @jax.jit
    def frontend(wave):
        return compute_fbank_batch(wave, FbankConfig())[:, :CHUNK]

    feats = jax.block_until_ready(frontend(wave))
    t0 = tick('frontend compile+run', t0)

    out = encode_and_ctc_topk(params, cfg, feats, feats_lens, cat, BEAM,
                              0.0, -1)
    jax.block_until_ready(out)
    t0 = tick('encode_and_ctc_topk compile+run', t0)

    r = decode(params, cfg, ['attention_rescoring'], feats, feats_lens,
               beam_size=BEAM, ctc_weight=0.1, cat_embs=np.array([1.0, 0.0]),
               blank_skip_threshold=0.95)
    t0 = tick('full decode pass 1 (beam+rescore compile)', t0)
    r = decode(params, cfg, ['attention_rescoring'], feats, feats_lens,
               beam_size=BEAM, ctc_weight=0.1, cat_embs=np.array([1.0, 0.0]),
               blank_skip_threshold=0.95)
    t0 = tick('full decode pass 2', t0)
    t1 = time.perf_counter()
    r = decode(params, cfg, ['attention_rescoring'], feats, feats_lens,
               beam_size=BEAM, ctc_weight=0.1, cat_embs=np.array([1.0, 0.0]),
               blank_skip_threshold=0.95)
    dt = time.perf_counter() - t1
    print(f'steady-state run: {dt:.3f}s = {B*CHUNK*0.01/dt:.0f} xRT',
          flush=True)


if __name__ == '__main__':
    main()
