"""Long-form ASR throughput benchmark on the flagship (reverb_asr_v1-class)
model, pricing the mode set behind the reference's headline WER numbers
(asr/README.md:70-78): fbank → conformer encoder (bf16) → CTC top-k →
device CTC prefix beam search with production blank-run folding →
whole-batch attention rescoring — i.e.
`--modes ctc_prefix_beam_search attention_rescoring`.

The CTC head is shaped like a trained model (8x-sharpened logits + blank
bias auto-tuned to ~75% blank-top frames, approximating the near-saturated
blank posteriors trained CTC heads emit): random-weight logits are flat,
which both disables the blank-skip path real speech hits and under-prices
the beam's extend work.  Host-side nbest packing between the beam and the
rescorer is included — it is part of the served path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: BASELINE.json north-star ≥20× real-time per v5e chip.

REVERB_BENCH_INT8=1 benches the int8-PTQ serving path (ops/quant.py)
instead of bf16 — same mode set, quantized encoder/decoder matmuls.
"""

import json
import os
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    # persistent XLA compile cache: repeat bench runs (and the round-end
    # driver) reload compiled programs instead of re-stressing the remote
    # compile service
    from reverb_tpu.export.aot import maybe_enable_default_cache
    maybe_enable_default_cache()

    from reverb_tpu.decode.api import decode
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
    cfg = cfg.with_compute_dtype(jnp.bfloat16)
    params = init_params(jax.random.PRNGKey(0), cfg)
    if on_tpu:
        # bf16 params: inference-precision deployment default
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params)

    CHUNK = 2051                      # 20.51 s of 10 ms frames
    B = 32 if on_tpu else 2           # server-batch: 32 chunks in flight
    BEAM = 10
    BLANK_SKIP = 0.95                 # production blank-run folding
    sr = 16000
    chunk_sec = CHUNK * 0.01
    samples = int(chunk_sec * sr) + 400

    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(B, samples).astype(np.float32) * 1000)
    feats_lens = jnp.full((B,), CHUNK, jnp.int32)
    cat = np.array([1.0, 0.0], np.float32)

    @jax.jit
    def frontend(wave):
        return compute_fbank_batch(wave, FbankConfig())[:, :CHUNK]

    feats = frontend(wave)

    # ---- shape the CTC head like a trained model (peaky, blank-heavy) ----
    # solve the blank bias in closed form from one probe batch: bias at the
    # 75th percentile of (max non-blank logit − blank logit) per frame puts
    # blank on top for ~75% of frames, the regime trained models live in
    from reverb_tpu.decode.api import encode_and_ctc
    params['ctc']['ctc_lo'] = dict(params['ctc']['ctc_lo'])
    params['ctc']['ctc_lo']['weight'] = params['ctc']['ctc_lo']['weight'] * 8
    logits = np.asarray(encode_and_ctc(
        params, cfg, feats[:4], feats_lens[:4], jnp.asarray(cat))[2],
        np.float32)
    blank = logits[..., cfg.blank_id]
    non_blank = np.max(np.delete(logits, cfg.blank_id, axis=-1), axis=-1)
    bias = float(np.quantile((non_blank - blank).reshape(-1), 0.75))
    b = params['ctc']['ctc_lo']['bias']
    params['ctc']['ctc_lo']['bias'] = b.at[cfg.blank_id].add(
        jnp.asarray(bias, b.dtype))

    use_int8 = os.environ.get('REVERB_BENCH_INT8', '0') == '1'
    if use_int8:
        from reverb_tpu.ops.quant import quantize_params_int8
        params = quantize_params_int8(params)

    use_fused = os.environ.get('REVERB_BENCH_FUSED', '0') == '1'

    def pipeline(wave):
        """The served path: device fbank+encoder+beam, host nbest packing,
        one batched rescoring dispatch (REVERB_BENCH_FUSED=1: everything
        after the frontend as ONE device program)."""
        feats = frontend(wave)
        out = decode(params, cfg, ['attention_rescoring'], feats, feats_lens,
                     beam_size=BEAM, ctc_weight=0.1, cat_embs=cat,
                     blank_skip_threshold=BLANK_SKIP, fused=use_fused)
        return out['attention_rescoring']

    # warmup/compile (two calls: nbest length buckets may differ)
    res = pipeline(wave)
    res = pipeline(wave)
    assert any(len(r.tokens) for r in res)

    iters = 6 if on_tpu else 2
    per_run = []
    for _ in range(iters):
        t1 = time.perf_counter()
        res = pipeline(wave)
        # decode() returns host-materialized results — no pending device work
        per_run.append(B * chunk_sec / (time.perf_counter() - t1))
    rtf = len(per_run) / sum(1.0 / r for r in per_run)   # harmonic = total

    out = {
        'metric': 'long-form ASR throughput (xRT, fbank+encoder+CTC prefix '
                  'beam[blank-skip]+attention rescoring — the headline-WER '
                  f'mode set, flagship model, '
                  f'{"int8 PTQ" if use_int8 else "bf16"})',
        'value': round(rtf, 2),
        'unit': 'x realtime per chip',
        'vs_baseline': round(rtf / 20.0, 2),
        # run-to-run spread (round-2 verdict: 1070-1203x with no variance
        # reporting)
        'runs_xrt': [round(r, 1) for r in per_run],
    }

    # submetric subprocesses bench the FLAGSHIP shapes — TPU only (the CPU
    # fallback exists so the bench always emits a line anywhere)
    if on_tpu and not use_int8 and \
            os.environ.get('REVERB_BENCH_NO_SUB', '0') != '1':
        out['submetrics'] = _submetrics(params, cfg, frontend, wave,
                                        feats_lens, cat, B, chunk_sec,
                                        on_tpu)
    print(json.dumps(out))


def _submetrics(params, cfg, frontend, wave, feats_lens, cat, B, chunk_sec,
                on_tpu):
    """The full tracked-metric set, emitted inside the single JSON line so
    BENCH_r*.json is a machine-checkable regression record (prefix-beam-only
    xRT in-process; int8 / train MFU / streaming via bounded subprocesses —
    each degrades to an 'error' entry instead of failing the bench)."""
    import subprocess
    import time as _t
    from reverb_tpu.decode.api import decode
    sub = {}

    # prefix-beam-only serving (no rescoring pass)
    def beam_only(wave):
        feats = frontend(wave)
        return decode(params, cfg, ['ctc_prefix_beam_search'], feats,
                      feats_lens, beam_size=10, ctc_weight=0.1,
                      cat_embs=cat, blank_skip_threshold=0.95)
    beam_only(wave)
    iters = 4 if on_tpu else 1
    t0 = _t.perf_counter()
    for _ in range(iters):
        beam_only(wave)
    sub['prefix_beam_only_xrt'] = round(
        B * chunk_sec * iters / (_t.perf_counter() - t0), 1)

    root = os.path.dirname(os.path.abspath(__file__))

    def run_tool(key, argv, env_extra=None, timeout=900, fields=None):
        env = dict(os.environ, REVERB_BENCH_NO_SUB='1', **(env_extra or {}))
        # tools/ scripts import reverb_tpu by repo-root path; PREPEND (the
        # existing PYTHONPATH may carry the TPU plugin's sitecustomize dir)
        env['PYTHONPATH'] = root + os.pathsep + env.get('PYTHONPATH', '')
        try:
            p = subprocess.run(argv, capture_output=True, text=True,
                               timeout=timeout, env=env, cwd=root)
            line = [ln for ln in p.stdout.strip().splitlines()
                    if ln.startswith('{')][-1]
            rec = json.loads(line)
            sub[key] = ({k: rec.get(k) for k in fields} if fields else rec)
        except Exception as e:      # noqa: BLE001 — degrade, don't fail
            sub[key] = {'error': f'{type(e).__name__}: {e}'[:200]}

    run_tool('int8', [sys.executable, 'bench.py'],
             env_extra={'REVERB_BENCH_INT8': '1'},
             fields=('value', 'unit'))
    # the remat default compiles TWO programs (the step + a compile-only
    # non-remat lowering for the model-FLOP MFU basis) — allow for both
    # missing the persistent compile cache
    run_tool('train', [sys.executable, 'tools/bench_train_mfu.py'],
             timeout=1800, fields=('value', 'unit', 'mfu'))
    run_tool('streaming', [sys.executable, 'tools/bench_streaming.py'],
             fields=('p50_ms', 'p95_ms', 'hop_ms', 'streamed_xRT'))
    return sub


if __name__ == '__main__':
    sys.exit(main())
