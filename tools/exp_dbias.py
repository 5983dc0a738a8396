"""MFU ladder experiment: what do linear biases actually COST the flagship
train step?  (round-4 verdict Weak #2: ~21 ms/step of dbias reduces in the
xplane at B=48; the proposed 'fold into wgrad' fix trades a dY read for an
X copy of the same size, so before building anything, measure the ceiling.)

A/B: the full train step with params as-is vs with every eligible linear
bias REMOVED (models/modules.linear skips the add when 'bias' is None, and
its grad — the dbias reduce — disappears from the backward).  The delta is
the TOTAL cost of biases (forward adds + backward reduces): the upper bound
any dbias optimization can recover.  Prints one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def strip_biases(params):
    """None-out every 2-D-weight linear bias (attention/FFN/decoder);
    norms/convs keep theirs (different param shapes)."""
    n = [0]

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                out[k] = walk(v)
            if 'weight' in out and getattr(out['weight'], 'ndim', 0) == 2 \
                    and out.get('bias') is not None \
                    and 'running_mean' not in out:
                out['bias'] = None
                n[0] += 1
            return out
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params), n[0]


def main():
    from reverb_tpu.export.aot import maybe_enable_default_cache
    maybe_enable_default_cache()
    from reverb_tpu.models.asr_model import ModelConfig, init_params
    from reverb_tpu.models.presets import reverb_large
    from reverb_tpu.train.trainer import (TrainConfig, build_optimizer,
                                          make_train_step, train_prng_key)

    conf = reverb_large()
    conf['dtype'] = 'bf16'
    conf['encoder_conf'] = dict(conf['encoder_conf'],
                                gradient_checkpointing=True,
                                remat_policy='dots')
    cfg = ModelConfig.from_config(conf)
    tc = TrainConfig.from_config(dict(conf, grad_clip=50.0))
    B, T, L = 48, 512, 24
    rng = np.random.RandomState(0)
    batch = {
        'feats': jnp.asarray(rng.randn(B, T, 80), jnp.float32),
        'feats_lengths': jnp.full((B,), T, jnp.int32),
        'target': jnp.asarray(rng.randint(1, cfg.vocab_size - 2, (B, L)),
                              jnp.int32),
        'target_lengths': jnp.full((B,), L, jnp.int32),
        'cat_embs': jnp.tile(jnp.array([[1.0, 0.0]], jnp.float32), (B, 1)),
    }

    def time_step(params, label):
        tx, _ = build_optimizer(tc, params)
        opt_state = tx.init(params)
        step_fn = jax.jit(make_train_step(cfg, tx, accum_grad=tc.accum_grad,
                                          grad_clip=tc.grad_clip),
                          donate_argnums=(0, 1))
        key = train_prng_key(1)
        params, opt_state, m = step_fn(params, opt_state, batch,
                                       jnp.zeros((), jnp.int32), key)
        float(m['loss'])
        step_dev = m['_next_step']
        key = m.get('_next_rng', key)
        t0 = time.perf_counter()
        iters = 8
        for _ in range(iters):
            params, opt_state, m = step_fn(params, opt_state, batch,
                                           step_dev, key)
            step_dev = m['_next_step']
            key = m.get('_next_rng', key)
        float(m['loss'])
        return (time.perf_counter() - t0) / iters * 1e3

    params = init_params(jax.random.PRNGKey(0), cfg)
    ms_with = time_step(params, 'with-bias')
    params = init_params(jax.random.PRNGKey(0), cfg)
    params_nb, n_stripped = strip_biases(params)
    ms_without = time_step(params_nb, 'no-bias')
    print(json.dumps({
        'metric': 'flagship train step bias cost A/B (B=48x512, dots remat)',
        'ms_with_bias': round(ms_with, 1),
        'ms_without_bias': round(ms_without, 1),
        'bias_cost_ms': round(ms_with - ms_without, 1),
        'linears_stripped': n_stripped,
    }))


if __name__ == '__main__':
    main()
