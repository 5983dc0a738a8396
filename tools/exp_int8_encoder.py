"""int8 ceiling experiment: encoder+CTC-topk phase in isolation, bf16 vs
int8-dynamic vs int8-static (round-4 verdict Weak #3: int8 bought +5.1%
end-to-end against a 2x MXU headroom; the encoder — the largest serving
phase — is where it should bite.  Measure the phase alone to separate
'int8 doesn't speed the encoder' from 'the encoder isn't the bottleneck').

Prints one JSON line with ms per variant at the serving batch (B=32,
2051-frame chunks, flagship dims).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from reverb_tpu.export.aot import maybe_enable_default_cache
    maybe_enable_default_cache()
    from reverb_tpu.decode.api import encode_and_ctc_topk
    from reverb_tpu.frontend.fbank import FbankConfig, compute_fbank_batch
    from reverb_tpu.models import ctc as ctc_mod
    from reverb_tpu.models.asr_model import (ModelConfig, forward_encoder,
                                             init_params)
    from reverb_tpu.models.presets import reverb_large
    from reverb_tpu.ops.quant import (apply_activation_scales,
                                      calibrate_activation_scales,
                                      quantize_params_int8)

    cfg = ModelConfig.from_config(reverb_large()).with_compute_dtype(
        jnp.bfloat16)
    params = init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    CHUNK, B, BEAM = 2051, 32, 10
    rng = np.random.RandomState(0)
    wave = jnp.asarray(
        rng.randn(B, int(CHUNK * 0.01 * 16000) + 400).astype(np.float32)
        * 1000)
    feats = jax.jit(lambda w: compute_fbank_batch(w, FbankConfig())
                    [:, :CHUNK])(wave)
    feats = jax.block_until_ready(feats)
    lens = jnp.full((B,), CHUNK, jnp.int32)
    cat = jnp.asarray(np.array([1.0, 0.0], np.float32))

    qp = quantize_params_int8(params)

    def calib_run(p, f, l, c):
        e, _ = forward_encoder(p, cfg, f, l,
                               cat_embs=c if cfg.lsl_enc else None)
        ctc_mod.ctc_logprobs(p['ctc'], e, 0.0, cfg.blank_id)

    scales = calibrate_activation_scales(qp, calib_run,
                                         [(feats[:4], lens[:4], cat)])
    sp = apply_activation_scales(qp, scales)

    def timed(p, label, iters=6):
        out = jax.block_until_ready(
            encode_and_ctc_topk(p, cfg, feats, lens, cat, BEAM, 0.0, -1))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = encode_and_ctc_topk(p, cfg, feats, lens, cat, BEAM, 0.0,
                                      -1)
        jax.block_until_ready(out)
        return round((time.perf_counter() - t0) / iters * 1e3, 1)

    res = {
        'metric': 'encoder+CTC-topk phase, flagship B=32x2051 frames',
        'bf16_ms': timed(params, 'bf16'),
        'int8_dynamic_ms': timed(qp, 'int8-dyn'),
        'int8_static_ms': timed(sp, 'int8-static'),
    }
    res['static_vs_bf16'] = round(res['bf16_ms'] / res['int8_static_ms'], 3)
    res['static_vs_dynamic'] = round(
        res['int8_dynamic_ms'] / res['int8_static_ms'], 3)
    print(json.dumps(res))


if __name__ == '__main__':
    main()
