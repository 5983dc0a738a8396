"""Trainer: loss decreases, accumulation equivalence, schedulers, freeze
rules, checkpoint roundtrip, and the 8-device DP×TP mesh step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reverb_tpu.models.asr_model import ModelConfig, init_params
from reverb_tpu.models.presets import reverb_tiny
from reverb_tpu.train.checkpoint import (average_checkpoints, load_checkpoint,
                                         save_checkpoint)
from reverb_tpu.train.scheduler import (build_scheduler, warmup_lr)
from reverb_tpu.train.trainer import (TrainConfig, build_optimizer,
                                      make_train_step, trainable_mask)


def _setup():
    conf = reverb_tiny()
    cfg = ModelConfig.from_config(conf)
    tc = TrainConfig.from_config(conf)
    params = init_params(jax.random.PRNGKey(0), cfg)
    return conf, cfg, tc, params


def _batch(cfg, B=4, T=67, L=5, seed=0):
    rng = np.random.RandomState(seed)
    return {
        'feats': jnp.asarray(rng.randn(B, T, 80), jnp.float32),
        'feats_lengths': jnp.full((B,), T, jnp.int32),
        'target': jnp.asarray(rng.randint(1, cfg.vocab_size - 2, (B, L)),
                              jnp.int32),
        'target_lengths': jnp.full((B,), L, jnp.int32),
        'cat_embs': jnp.tile(jnp.array([[1.0, 0.0]], jnp.float32), (B, 1)),
    }


def test_loss_decreases():
    conf, cfg, tc, params = _setup()
    # default warmuplr reaches ~1e-7 by step 8 (25k warmup), leaving the
    # loss sequence dominated by dropout noise — ramp fast so the decrease
    # outweighs the draws (the full learning gate is tools/train_smoke.py)
    tc.scheduler_conf = {'warmup_steps': 6}
    tx, _ = build_optimizer(tc)
    opt_state = tx.init(params)
    step_fn = jax.jit(make_train_step(cfg, tx))
    batch = _batch(cfg)
    losses = []
    rng = jax.random.PRNGKey(0)
    step = jnp.asarray(0)
    for i in range(12):
        params, opt_state, m = step_fn(params, opt_state, batch, step, rng)
        # device-resident step/rng chain (reserved metrics)
        step = m['_next_step']
        rng = m['_next_rng']
        losses.append(float(m['loss']))
        assert float(m['skipped']) == 0.0
    assert int(step) == 12
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


def test_schedulers():
    s = warmup_lr(1e-3, 100)
    lrs = [float(s(i)) for i in [0, 50, 99, 200, 1000]]
    assert lrs[0] < lrs[1] < lrs[2]
    assert lrs[3] > lrs[4]          # decays after warmup
    peak = float(s(99))
    assert abs(peak - 1e-3) < 2e-4
    for name in ('warmuplr', 'steadylr', 'NoamHoldAnnealing',
                 'cosineannealing'):
        sch = build_scheduler(name, 1e-3, {'warmup_steps': 10,
                                           'hold_steps': 5,
                                           'max_steps': 100})
        vals = [float(sch(i)) for i in range(0, 100, 10)]
        assert all(np.isfinite(v) and v >= 0 for v in vals), (name, vals)


def test_freeze_rules():
    conf, cfg, tc, params = _setup()
    tc.freeze_modules = ['encoder']
    tc.restrict_learning = None
    mask = trainable_mask(params, tc)
    flat = jax.tree_util.tree_leaves_with_path(mask)
    enc = [v for p, v in flat if 'encoder' in str(p)]
    dec = [v for p, v in flat if 'decoder' in str(p)]
    assert not any(enc) and all(dec)

    tx, _ = build_optimizer(tc, params)
    opt_state = tx.init(params)
    step_fn = jax.jit(make_train_step(cfg, tx))
    batch = _batch(cfg)
    new_params, _, _ = step_fn(params, opt_state, batch, jnp.asarray(0),
                               jax.random.PRNGKey(0))
    before = params['encoder']['after_norm']['weight']
    after = new_params['encoder']['after_norm']['weight']
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    dec_before = params['decoder']['left_decoder']['after_norm']['weight']
    dec_after = new_params['decoder']['left_decoder']['after_norm']['weight']
    assert np.abs(np.asarray(dec_before) - np.asarray(dec_after)).max() > 0


@pytest.mark.slow
def test_grad_accum_equivalence():
    conf, cfg, tc, params = _setup()
    tx, _ = build_optimizer(tc)
    opt_state = tx.init(params)
    batch = _batch(cfg, B=4)
    one = jax.jit(make_train_step(cfg, tx, accum_grad=1))
    acc = jax.jit(make_train_step(cfg, tx, accum_grad=2))
    p1, _, m1 = one(params, opt_state, batch, jnp.asarray(0), None)
    p2, _, m2 = acc(params, opt_state, batch, jnp.asarray(0), None)
    # micro-batch mean-of-means == full-batch mean here (equal micro sizes,
    # loss normalized by batch size)
    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=1e-4)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), p1, p2)
    assert max(jax.tree.leaves(d)) < 2e-3


def test_checkpoint_roundtrip(tmp_path):
    conf, cfg, tc, params = _setup()
    tx, _ = build_optimizer(tc)
    opt_state = tx.init(params)
    save_checkpoint(tmp_path, 'step_10', params, opt_state,
                    {'step': 10, 'epoch': 1, 'cv_loss': 2.5})
    p2, o2, info = load_checkpoint(tmp_path / 'step_10.npz', opt_state)
    assert info['step'] == 10
    d = jax.tree.map(lambda a, b: float(jnp.abs(jnp.asarray(a, jnp.float32)
                                                - b).max()), p2, params)
    assert max(jax.tree.leaves(d)) == 0.0
    assert o2 is not None
    # averaging
    save_checkpoint(tmp_path, 'step_20', params, None, {'cv_loss': 2.0})
    out = average_checkpoints([tmp_path / 'step_10.npz',
                               tmp_path / 'step_20.npz'],
                              tmp_path / 'avg.npz')
    pa, _, _ = load_checkpoint(out)
    d = jax.tree.map(lambda a, b: float(jnp.abs(jnp.asarray(a, jnp.float32)
                                                - b).max()), pa, params)
    assert max(jax.tree.leaves(d)) == 0.0  # averaging identical ckpts = same


@pytest.mark.slow
def test_multichip_dryrun():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_gradient_checkpointing_with_dropout_trains():
    """remat + dropout: per-layer keys passed into jax.checkpoint (a stateful
    Rngs closure leaks tracers on the backward replay)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from reverb_tpu.models.asr_model import (ModelConfig, compute_loss,
                                             init_params)
    from tests.test_model_forward import TINY
    conf = {k: (dict(v) if isinstance(v, dict) else v) for k, v in TINY.items()}
    conf['encoder_conf'] = dict(conf['encoder_conf'],
                                gradient_checkpointing=True)
    conf['decoder_conf'] = dict(conf['decoder_conf'],
                                gradient_checkpointing=True)
    conf['dtype'] = 'bf16'
    cfg = ModelConfig.from_config(conf)
    assert cfg.compute_dtype == jnp.bfloat16
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, T = 2, 37
    batch = {'feats': jnp.asarray(
                 np.random.RandomState(0).randn(B, T, 80), jnp.float32),
             'feats_lengths': jnp.array([T, T - 5]),
             'target': jnp.array([[1, 2, 3, -1], [4, 5, -1, -1]]),
             'target_lengths': jnp.array([3, 2]),
             'cat_embs': jnp.array([[1.0, 0.0], [0.0, 1.0]])}

    @jax.jit
    def loss_and_grad(p, rng):
        return jax.value_and_grad(
            lambda p: compute_loss(p, cfg, batch, rng=rng)['loss'])(p)

    l, g = loss_and_grad(params, jax.random.PRNGKey(3))
    assert np.isfinite(float(l))
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


@pytest.mark.slow
def test_remat_policy_grad_equality():
    """Remat must never change VALUES, only which intermediates are saved
    vs recomputed.  Two bit-equality checks:

    1. dropout off: non-remat == 'full' == 'dots' (with dropout on, remat
       layers legitimately draw different masks — the checkpointed step
       takes one fresh per-layer key while the plain path threads a single
       split chain, so cross-path equality only holds at rate 0).
    2. dropout on (TINY defaults): 'full' == 'dots' — both remat paths
       consume the identical per-layer key, so a policy that altered
       numerics (rather than just the save set) would show here.

    Loss must match bit-for-bit; grads to float32 fusion noise (remat
    changes which ops fuse, hence summation order, by ~1 ulp)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from reverb_tpu.models.asr_model import (ModelConfig, compute_loss,
                                             init_params)
    from tests.test_model_forward import TINY

    def grads(policy, drop):
        conf = {k: (dict(v) if isinstance(v, dict) else v)
                for k, v in TINY.items()}
        if not drop:
            # zero EVERY dropout field, including config defaults TINY does
            # not list (positional_dropout_rate defaults to 0.1 — a missed
            # one shifts keys with the rng-consumption count and breaks the
            # cross-path comparison below)
            zeros = {k: 0.0 for k in (
                'dropout_rate', 'positional_dropout_rate',
                'attention_dropout_rate', 'self_attention_dropout_rate',
                'src_attention_dropout_rate')}
            for sub in ('encoder_conf', 'decoder_conf'):
                conf[sub] = dict(conf[sub],
                                 **{k: v for k, v in zeros.items()})
        if policy is not None:
            conf['encoder_conf'] = dict(conf['encoder_conf'],
                                        gradient_checkpointing=True,
                                        remat_policy=policy)
            conf['decoder_conf'] = dict(conf['decoder_conf'],
                                        gradient_checkpointing=True,
                                        remat_policy=policy)
        cfg = ModelConfig.from_config(conf)
        params = init_params(jax.random.PRNGKey(0), cfg)
        B, T = 2, 37
        batch = {'feats': jnp.asarray(
                     np.random.RandomState(0).randn(B, T, 80), jnp.float32),
                 'feats_lengths': jnp.array([T, T - 5]),
                 'target': jnp.array([[1, 2, 3, -1], [4, 5, -1, -1]]),
                 'target_lengths': jnp.array([3, 2]),
                 'cat_embs': jnp.array([[1.0, 0.0], [0.0, 1.0]])}
        l, g = jax.jit(jax.value_and_grad(
            lambda p: compute_loss(p, cfg, batch,
                                   rng=jax.random.PRNGKey(3))['loss']))(params)
        return float(l), g

    def assert_equal(ref, got, msg):
        l0, g0 = ref
        l1, g1 = got
        assert l1 == l0, (msg, l1, l0)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6, err_msg=msg)

    base = grads(None, drop=False)
    for policy in ('full', 'dots'):
        assert_equal(base, grads(policy, drop=False), f'{policy} vs none')
    assert_equal(grads('full', drop=True), grads('dots', drop=True),
                 'dots vs full under dropout')


def test_train_prng_key_rbg():
    """train_prng_key: 'auto' maps to threefry off-TPU; an explicit 'rbg'
    key drives a full jitted train step (dropout sites split/fold the key
    inside jit) and produces finite, non-skipped updates."""
    from reverb_tpu.train.trainer import train_prng_key
    auto = train_prng_key(7)
    expected = 'rbg' if jax.default_backend() == 'tpu' else 'threefry2x32'
    assert str(jax.random.key_impl(auto)) == expected

    conf, cfg, tc, params = _setup()
    tx, _ = build_optimizer(tc)
    opt_state = tx.init(params)
    step_fn = jax.jit(make_train_step(cfg, tx, accum_grad=2))
    batch = _batch(cfg, B=4)
    rng = train_prng_key(7, 'rbg')
    rng, sub = jax.random.split(rng)
    params, opt_state, m = step_fn(params, opt_state, batch,
                                   jnp.asarray(0), sub)
    assert np.isfinite(float(m['loss']))
    assert float(m['skipped']) == 0.0


@pytest.mark.slow
def test_grad_clip_single_pass_equivalence():
    """make_train_step(grad_clip=c) (one global-norm pass) ==
    optax.chain(clip_by_global_norm(c), base) (the two-pass formulation)."""
    import optax
    conf, cfg, tc, params = _setup()
    tc.grad_clip = 0.5          # small enough to actually trigger clipping
    tx, _ = build_optimizer(tc)
    batch = _batch(cfg)

    new_step = jax.jit(make_train_step(cfg, tx, grad_clip=tc.grad_clip))
    ref_tx = optax.chain(optax.clip_by_global_norm(tc.grad_clip), tx)
    ref_step = jax.jit(make_train_step(cfg, ref_tx, grad_clip=0.0))

    p1, o1, m1 = new_step(params, tx.init(params), batch,
                          jnp.asarray(0), None)
    p2, o2, m2 = ref_step(params, ref_tx.init(params), batch,
                          jnp.asarray(0), None)
    assert float(m1['grad_norm']) > tc.grad_clip   # clip active
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_non_finite_grad_skips_update():
    """NaN loss → grads non-finite → the step is a no-op on params AND
    optimizer state (train_utils.py:699-701), flagged in metrics."""
    conf, cfg, tc, params = _setup()
    tx, _ = build_optimizer(tc)
    opt_state = tx.init(params)
    step_fn = jax.jit(make_train_step(cfg, tx, grad_clip=50.0))
    batch = _batch(cfg)
    batch['feats'] = batch['feats'].at[0, 0, 0].set(jnp.nan)
    p, o, m = step_fn(params, opt_state, batch, jnp.asarray(0), None)
    assert float(m['skipped']) == 1.0
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(o), jax.tree.leaves(opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
