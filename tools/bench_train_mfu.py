"""Flagship train-step timing + MFU on the attached TPU.

MFU = (XLA-reported FLOPs of the compiled train step) / (step time × peak).
Peak bf16 matmul throughput per v5e chip: 197 TFLOP/s (public spec).

Run: python tools/bench_train_mfu.py  (needs the axon TPU; prints one JSON
line like bench.py).
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from reverb_tpu.models.asr_model import ModelConfig, init_params
from reverb_tpu.models.presets import reverb_large
from reverb_tpu.train.trainer import TrainConfig, build_optimizer, \
    make_train_step, train_prng_key

PEAK_FLOPS = {'tpu v5 lite': 197e12, 'tpu v5e': 197e12,
              'tpu v4': 275e12, 'tpu v6e': 918e12}


def main():
    # persistent XLA compile cache: repeated runs (and the round-end driver's
    # submetric subprocesses) reload compiled programs instead of re-stressing
    # the remote compile service
    from reverb_tpu.export.aot import maybe_enable_default_cache
    maybe_enable_default_cache()
    import argparse
    ap = argparse.ArgumentParser()
    # B=48×512 frames with 'dots' remat is the measured v5e-16GB
    # throughput optimum: 49.2% MFU (no-remat sweep: 37.8% @16 /
    # 47.3% @32 / thrash @48 from activation spill; dots-remat drops the
    # spilled intermediates at ~zero MXU cost and B=64 exceeds HBM)
    ap.add_argument('--batch', type=int, default=48)
    ap.add_argument('--remat', default=True,
                    action=argparse.BooleanOptionalAction,
                    help='per-layer gradient checkpointing (fits larger B)')
    ap.add_argument('--remat-policy', default='dots',
                    choices=['full', 'dots'],
                    help="'dots' saves matmul outputs (no MXU recompute); "
                         "'full' replays the whole layer")
    ap.add_argument('--mu-dtype', default=None,
                    help="adam first-moment dtype (e.g. bfloat16): the "
                         "optimizer pass is HBM-bound, bf16 mu cuts "
                         "8 B/param of its traffic")
    args = ap.parse_args()

    dev = jax.devices()[0]
    conf = reverb_large()
    conf['dtype'] = 'bf16'
    if args.remat:
        conf['encoder_conf'] = dict(conf['encoder_conf'],
                                    gradient_checkpointing=True,
                                    remat_policy=args.remat_policy)
    if args.mu_dtype:
        conf['optim_conf'] = dict(conf.get('optim_conf', {}),
                                  mu_dtype=args.mu_dtype)
    cfg = ModelConfig.from_config(conf)
    tc = TrainConfig.from_config(dict(conf, grad_clip=50.0))
    params = init_params(jax.random.PRNGKey(0), cfg)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))

    B, T, L = args.batch, 512, 24
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
    step_fn = jax.jit(
        make_train_step(cfg, tx, accum_grad=tc.accum_grad,
                        grad_clip=tc.grad_clip),
        donate_argnums=(0, 1))

    lowered = step_fn.lower(params, opt_state, batch,
                            jnp.zeros((), jnp.int32), train_prng_key(1))
    compiled = lowered.compile()
    flops = compiled.cost_analysis()['flops']
    model_flops = flops
    if args.remat:
        # compiled FLOPs under remat include the backward's recompute; MFU
        # must count MODEL FLOPs (useful work) or remat inflates the score.
        # Lower the non-remat step (compile only — never executed, so the
        # activation memory that forces remat in the first place is never
        # allocated) and take its cost as the model-FLOP denominator input.
        cfg_nr = ModelConfig.from_config(dict(
            conf, encoder_conf=dict(conf['encoder_conf'],
                                    gradient_checkpointing=False)))
        nr_fn = jax.jit(make_train_step(cfg_nr, tx, accum_grad=tc.accum_grad,
                                        grad_clip=tc.grad_clip),
                        donate_argnums=(0, 1))
        model_flops = nr_fn.lower(
            params, opt_state, batch, jnp.zeros((), jnp.int32),
            train_prng_key(1)).compile().cost_analysis()['flops']

    key = train_prng_key(1)      # rbg on TPU (threefry masks are VPU-bound)
    params, opt_state, m = step_fn(params, opt_state, batch,
                                   jnp.zeros((), jnp.int32), key)
    float(m['loss'])                 # sync (axon block_until_ready is lazy)
    iters = 10
    # step counter + PRNG advance on device inside the step ('_next_step'/
    # '_next_rng' reserved metrics, train/executor.py): any per-step tiny
    # dispatch (scalar upload, +1 add, key split) costs a host RPC over
    # the remote-TPU link — measured 213.6 → ~184 ms/step at B=32
    step_dev = jnp.asarray(0, jnp.int32)
    jax.block_until_ready(step_dev)
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, m = step_fn(params, opt_state, batch,
                                       step_dev, key)
        step_dev = m['_next_step']
        key = m.get('_next_rng', key)
    loss = float(m['loss'])          # materialize → all steps complete
    dt = (time.perf_counter() - t0) / iters

    kind = getattr(dev, 'device_kind', '').lower()
    peak = next((v for k, v in PEAK_FLOPS.items() if k in kind), 197e12)
    mfu = model_flops / dt / peak
    out = {
        'metric': f'flagship train step ({n_params/1e6:.0f}M params, '
                  f'B={B}x{T} frames, bf16 AMP, adam+clip)',
        'value': round(dt * 1e3, 1), 'unit': 'ms/step',
        'model_flops_per_step': model_flops,
        'mfu': round(mfu, 3), 'device': getattr(dev, 'device_kind', '?'),
        'loss': loss,
    }
    if args.remat:
        out['remat'] = args.remat_policy
        out['hw_flops_per_step'] = flops      # incl. backward recompute
        out['mfu_hw'] = round(flops / dt / peak, 3)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
