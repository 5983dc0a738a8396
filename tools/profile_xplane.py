"""Op-level TPU profile summary from a jax.profiler xplane trace.

The reference has no profiler at all (SURVEY.md §5); on TPU we capture an
xplane trace (`jax.profiler.start_trace`) and summarize where device time
goes per HLO op — no TensorBoard needed (parses the raw XSpace proto via
tensorflow's bundled xplane_pb2).

Usage:
  python tools/profile_xplane.py <logdir>          # summarize existing trace
  python tools/profile_xplane.py --beam            # trace + summarize the
                                                   # prefix-beam scan program
  python tools/profile_xplane.py --rescore         # ... attention rescoring
Prints per-line (XLA Ops / XLA Modules) top-N events by total duration.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys


def parse_xspace(path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(path, 'rb') as f:
        xs.ParseFromString(f.read())
    return xs


def summarize(logdir: str, top: int = 40):
    paths = sorted(glob.glob(os.path.join(
        logdir, '**', '*.xplane.pb'), recursive=True))
    if not paths:
        print(f'no .xplane.pb under {logdir}', file=sys.stderr)
        return
    xs = parse_xspace(paths[-1])
    for plane in xs.planes:
        if not ('TPU' in plane.name or 'device' in plane.name.lower()):
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if not line.events:
                continue
            agg = collections.Counter()
            cnt = collections.Counter()
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                agg[name] += ev.duration_ps
                cnt[name] += 1
            total = sum(agg.values())
            print(f'\n== plane {plane.name!r} line {line.name!r}: '
                  f'{total/1e12*1e3:.3f} ms total, {len(line.events)} events')
            for name, ps in agg.most_common(top):
                print(f'  {ps/1e9:10.3f} ms  x{cnt[name]:<6d} '
                      f'{ps/max(total,1)*100:5.1f}%  {name[:110]}')


def _trace_beam(logdir: str):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from reverb_tpu.decode import prefix_beam as pb
    B, T, K2, V = 32, 2051, 10, 128
    rng = np.random.RandomState(0)
    logp = jnp.asarray(rng.randn(B, T, K2).astype(np.float32))
    idx = jnp.asarray(rng.randint(1, V, (B, T, K2)).astype(np.int32))
    blank = jnp.asarray(np.log(np.clip(
        rng.uniform(0.5, 1.0, (B, T)), 1e-6, 1)).astype(np.float32))
    lens = jnp.full((B,), T, jnp.int32)
    run = lambda: jax.block_until_ready(pb.ctc_prefix_beam_search_device_topk(
        logp, idx, blank, lens, 10, 0, 0, 0.95, T // 2, None))
    run()
    import time
    t0 = time.perf_counter(); run(); print('beam once:',
                                           time.perf_counter() - t0)
    jax.profiler.start_trace(logdir)
    run()
    jax.profiler.stop_trace()


def _trace_rescore(logdir: str):
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from reverb_tpu.decode import rescoring as rs
    from reverb_tpu.models.asr_model import ModelConfig, init_params
    from reverb_tpu.models.presets import reverb_large
    cfg = ModelConfig.from_config(reverb_large())
    cfg = cfg.with_compute_dtype(jnp.bfloat16)
    params = init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    B, N, L, T = 32, 10, 64, 512
    rng = np.random.RandomState(0)
    hyps = jnp.asarray(rng.randint(1, 4000, (B, N, L)).astype(np.int32))
    lens = jnp.asarray(rng.randint(L // 2, L, (B, N)).astype(np.int32))
    enc = jnp.asarray(rng.randn(B, T, cfg.encoder.output_size)
                      .astype(np.float32)).astype(jnp.bfloat16)
    elens = jnp.full((B,), T, jnp.int32)
    cat = jnp.asarray(np.array([1.0, 0.0], np.float32))
    run = lambda: jax.block_until_ready(rs._rescore_device_all(
        params, cfg, hyps, lens, enc, 0.0, cat, elens))
    run()
    import time
    t0 = time.perf_counter(); run(); print('rescore once:',
                                           time.perf_counter() - t0)
    jax.profiler.start_trace(logdir)
    run()
    jax.profiler.stop_trace()


def _trace_encode(logdir: str):
    """The serving encoder+CTC-top-k phase at headline shapes."""
    import time
    import jax
    import jax.numpy as jnp
    import numpy as np
    from reverb_tpu.decode.api import encode_and_ctc_topk
    from reverb_tpu.models.asr_model import ModelConfig, init_params
    from reverb_tpu.models.presets import reverb_large
    cfg = ModelConfig.from_config(reverb_large())
    cfg = cfg.with_compute_dtype(jnp.bfloat16)
    params = init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    B, T = 32, 2051
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, T, 80), jnp.float32)
    lens = jnp.full((B,), T, jnp.int32)
    cat = jnp.asarray(np.array([1.0, 0.0], np.float32))
    run = lambda: jax.block_until_ready(encode_and_ctc_topk(
        params, cfg, feats, lens, cat, 10))
    run()
    t0 = time.perf_counter(); run()
    print('encode+topk once:', time.perf_counter() - t0)
    jax.profiler.start_trace(logdir)
    run()
    jax.profiler.stop_trace()


def _trace_train(logdir: str):
    import time
    import jax
    import jax.numpy as jnp
    import numpy as np
    from reverb_tpu.models.asr_model import ModelConfig, init_params
    from reverb_tpu.models.presets import reverb_large
    from reverb_tpu.train.trainer import (TrainConfig, build_optimizer,
                                          make_train_step, train_prng_key)
    conf = reverb_large()
    conf['dtype'] = 'bf16'
    # REVERB_PROFILE_REMAT=dots|full traces the remat config bench_train_mfu
    # times (its default is dots at B=48)
    rp = os.environ.get('REVERB_PROFILE_REMAT')
    if rp:
        conf['encoder_conf'] = dict(conf['encoder_conf'],
                                    gradient_checkpointing=True,
                                    remat_policy=rp)
    cfg = ModelConfig.from_config(conf)
    tc = TrainConfig.from_config(dict(conf, grad_clip=50.0))
    params = init_params(jax.random.PRNGKey(0), cfg)
    B = int(os.environ.get('REVERB_PROFILE_B', '16'))
    T, L = 512, 24
    rng = np.random.RandomState(0)
    batch = {
        'feats': jnp.asarray(rng.randn(B, T, 80), jnp.float32),
        'feats_lengths': jnp.full((B,), T, jnp.int32),
        'target': jnp.asarray(rng.randint(1, cfg.vocab_size - 2, (B, L)),
                              jnp.int32),
        'target_lengths': jnp.full((B,), L, jnp.int32),
        'cat_embs': jnp.tile(jnp.array([[1.0, 0.0]], jnp.float32), (B, 1)),
    }
    tx, _ = build_optimizer(tc, params)
    opt_state = tx.init(params)
    step_fn = jax.jit(make_train_step(cfg, tx, accum_grad=tc.accum_grad,
                                      grad_clip=tc.grad_clip),
                      donate_argnums=(0, 1))
    key = train_prng_key(1)
    step = jnp.zeros((), jnp.int32)
    params, opt_state, m = step_fn(params, opt_state, batch, step, key)
    float(m['loss'])
    t0 = time.perf_counter()
    params, opt_state, m = step_fn(params, opt_state, batch, step, key)
    float(m['loss'])
    print('train step once:', time.perf_counter() - t0)
    import jax as _jax
    _jax.profiler.start_trace(logdir)
    params, opt_state, m = step_fn(params, opt_state, batch, step, key)
    float(m['loss'])
    _jax.profiler.stop_trace()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('logdir', nargs='?', default='/tmp/xprof')
    ap.add_argument('--beam', action='store_true')
    ap.add_argument('--rescore', action='store_true')
    ap.add_argument('--train', action='store_true')
    ap.add_argument('--encode', action='store_true')
    ap.add_argument('--top', type=int, default=40)
    args = ap.parse_args()
    if args.encode:
        _trace_encode(args.logdir)
    if args.beam:
        _trace_beam(args.logdir)
    if args.rescore:
        _trace_rescore(args.logdir)
    if args.train:
        _trace_train(args.logdir)
    summarize(args.logdir, args.top)


if __name__ == '__main__':
    main()
