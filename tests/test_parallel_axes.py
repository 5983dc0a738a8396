"""SP / EP / PP axes on the 8-virtual-device CPU mesh.

- sequence parallelism: train step on a ('data','seq','model') mesh matches
  the single-device loss bit-for-bit-ish (same math, different partitioning)
- expert parallelism: MoE forward under an 'expert' axis matches unsharded
- pipeline parallelism: GPipe shard_map schedule == sequential layer loop,
  forward and grads
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from reverb_tpu.parallel.mesh import constrain, make_mesh
from reverb_tpu.parallel.pipeline import (make_pipe_mesh, pipeline_apply,
                                          stack_layer_params)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 virtual devices')


def _mlp_layer(rng, d):
    k1, k2 = jax.random.split(rng)
    return {'w': jax.random.normal(k1, (d, d)) * 0.1,
            'b': jax.random.normal(k2, (d,)) * 0.1}


def _mlp_fn(p, x):
    return jnp.tanh(x @ p['w'] + p['b'])


def test_pipeline_matches_sequential_forward_and_grad():
    d, L, B, M = 8, 8, 16, 4
    layers = [_mlp_layer(jax.random.PRNGKey(i), d) for i in range(L)]
    stacked = stack_layer_params(layers)
    x = jax.random.normal(jax.random.PRNGKey(99), (B, 5, d))

    def sequential(stacked, x):
        def body(h, lp):
            return _mlp_fn(lp, h), None
        out, _ = jax.lax.scan(body, x, stacked)
        return out

    want = sequential(stacked, x)
    for S in (2, 4):
        mesh = make_pipe_mesh(S)
        got = pipeline_apply(_mlp_fn, stacked, x, M, mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    # grads through the pipeline == grads through the sequential loop
    mesh = make_pipe_mesh(4)

    def loss_pipe(stacked):
        return jnp.sum(pipeline_apply(_mlp_fn, stacked, x, M, mesh) ** 2)

    def loss_seq(stacked):
        return jnp.sum(sequential(stacked, x) ** 2)

    g_pipe = jax.grad(loss_pipe)(stacked)
    g_seq = jax.grad(loss_seq)(stacked)
    for a, b in zip(jax.tree.leaves(g_pipe), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_seq_and_expert_axes_train_step_matches_single_device():
    """Full hybrid train step on ('data','seq','expert','model')=(2,2,1,2)
    with MoE layers: loss equals the unsharded run."""
    from reverb_tpu.models.asr_model import (ModelConfig, compute_loss,
                                             init_params)
    from tests.test_model_forward import TINY

    conf = {k: (dict(v) if isinstance(v, dict) else v)
            for k, v in TINY.items()}
    conf['encoder_conf'] = dict(conf['encoder_conf'],
                                positionwise_layer_type='moe', n_expert=4,
                                n_expert_per_token=2, dropout_rate=0.0,
                                positional_dropout_rate=0.0)
    conf['model_conf'] = dict(conf['model_conf'])
    cfg = ModelConfig.from_config(conf)
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, T = 4, 64
    batch = {
        'feats': jnp.asarray(np.random.RandomState(0)
                             .randn(B, T, 80).astype(np.float32)),
        'feats_lengths': jnp.array([T, T, T - 9, T - 20]),
        'target': jnp.array([[1, 2, 3, -1], [4, 5, -1, -1],
                             [6, -1, -1, -1], [7, 8, 9, 10]]),
        'target_lengths': jnp.array([3, 2, 1, 4]),
        'cat_embs': jnp.tile(jnp.array([[1.0, 0.0]]), (B, 1)),
    }
    want = float(compute_loss(params, cfg, batch)['loss'])

    mesh = make_mesh(data=2, seq=2, expert=1, model=2)
    with jax.set_mesh(mesh):
        p_sh = jax.device_put(params, NamedSharding(mesh, P()))
        b_sh = jax.tree.map(
            lambda x: jax.device_put(
                x, NamedSharding(mesh, P('data', *([None] * (x.ndim - 1))))),
            batch)

        @jax.jit
        def step(p, b):
            b = dict(b, feats=constrain(b['feats'], None, 'seq', None))
            return compute_loss(p, cfg, b)['loss']

        got = float(step(p_sh, b_sh))
    np.testing.assert_allclose(got, want, rtol=2e-5)

    # expert axis active: (1,1,4,2) — EP over the MoE stack
    mesh_e = make_mesh(data=1, seq=1, expert=4, model=2)
    with jax.set_mesh(mesh_e):
        p_sh = jax.device_put(params, NamedSharding(mesh_e, P()))
        b_sh = jax.device_put(batch, NamedSharding(mesh_e, P()))

        @jax.jit
        def step_e(p, b):
            return compute_loss(p, cfg, b)['loss']

        got_e = float(step_e(p_sh, b_sh))
    np.testing.assert_allclose(got_e, want, rtol=2e-5)


def test_constrain_is_noop_without_mesh():
    x = jnp.ones((4, 6))
    y = constrain(x, 'data', 'seq')
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))


@pytest.mark.slow
def test_tp_zero_sharded_train_step_matches_single_device():
    """TP via param_shardings (model=2) + ZeRO opt-state sharding: losses,
    grad norms, and updated params must EQUAL the single-device run — a
    wrong TP_RULES entry must fail here, not just produce finite numbers
    (VERDICT r1 item 4)."""
    from reverb_tpu.models.asr_model import ModelConfig, init_params
    from reverb_tpu.models.presets import reverb_tiny
    from reverb_tpu.parallel.mesh import (make_mesh, opt_state_shardings,
                                          param_shardings, put_batch)
    from reverb_tpu.train.trainer import (TrainConfig, build_optimizer,
                                          make_train_step)

    conf = reverb_tiny()
    cfg = ModelConfig.from_config(conf)
    tc = TrainConfig.from_config(conf)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tx, _ = build_optimizer(tc)
    opt_state = tx.init(params)
    B, T, L = 8, 64, 5
    rng = np.random.RandomState(3)
    batch = {
        'feats': rng.randn(B, T, 80).astype(np.float32),
        'feats_lengths': np.full((B,), T, np.int32),
        'target': rng.randint(1, cfg.vocab_size - 2, (B, L)).astype(np.int32),
        'target_lengths': np.full((B,), L, np.int32),
        'cat_embs': np.tile(np.array([[1.0, 0.0]], np.float32), (B, 1)),
    }
    ts = make_train_step(cfg, tx, accum_grad=tc.accum_grad,
                         grad_clip=tc.grad_clip)

    dev0 = jax.devices()[0]
    p0, o0 = jax.device_put((params, opt_state), dev0)
    want = []
    for i in range(2):
        p0, o0, m = jax.jit(ts)(p0, o0, jax.device_put(
            jax.tree.map(jnp.asarray, batch), dev0),
            jnp.asarray(i), jax.random.PRNGKey(i))
        want.append((float(m['loss']), float(m['grad_norm'])))

    mesh = make_mesh(model=2)            # data=4, model=2
    p_sh = param_shardings(params, mesh)
    o_sh = opt_state_shardings(opt_state, params, mesh, zero=True)
    # sanity: TP rules actually sharded something
    specs = jax.tree.leaves(jax.tree.map(lambda s: s.spec, p_sh))
    assert any('model' in str(s) for s in specs)
    p1 = jax.device_put(params, p_sh)
    o1 = jax.device_put(opt_state, o_sh)
    got = []
    with jax.set_mesh(mesh):
        step = jax.jit(ts, in_shardings=(p_sh, o_sh, None, None, None),
                       out_shardings=(p_sh, o_sh, None))
        for i in range(2):
            p1, o1, m = step(p1, o1, put_batch(batch, mesh),
                             jnp.asarray(i), jax.random.PRNGKey(i))
            got.append((float(m['loss']), float(m['grad_norm'])))
    np.testing.assert_allclose(got, want, rtol=1e-4)
    dmax = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
               for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p0)))
    assert dmax <= 1e-4, dmax


def test_pp_composed_with_dp_tp_train_step_matches_single_device():
    """DP+PP(+TP) in ONE jitted train step: encoder_conf.pipeline_stages=2
    routes the homogeneous middle conformer stack through the GPipe region
    (manual over only 'pipe') while data/model stay under the GSPMD
    partitioner.  Loss/grad-norm/updated params must equal the
    single-device sequential run (dropout off: the pipelined region draws
    per-layer-per-microbatch keys, a different-but-valid stream)."""
    from reverb_tpu.models.asr_model import ModelConfig, init_params
    from reverb_tpu.models.presets import reverb_tiny
    from reverb_tpu.parallel.mesh import (make_mesh, opt_state_shardings,
                                          param_shardings, put_batch)
    from reverb_tpu.train.trainer import (TrainConfig, build_optimizer,
                                          make_train_step)

    conf = reverb_tiny()
    # 6 blocks: LSL first/last leave a 4-layer homogeneous middle — enough
    # for 2 stages (reverb_tiny's 3 blocks leave one, and the region would
    # silently stay sequential)
    enc = dict(conf['encoder_conf'], num_blocks=6,
               cnn_module_norm='layer_norm')
    for k in list(enc):
        if 'dropout' in k:
            enc[k] = 0.0
    # layer_norm conv modules: batch_norm computes train-time statistics
    # over whatever batch slice it sees, and the GPipe region sees B/M-row
    # microbatches — a REAL semantic difference of microbatched pipelines
    # (documented in parallel/pipeline.py), not a bug this test should hide
    dec = dict(conf['decoder_conf'])
    for k in list(dec):
        if 'dropout' in k:
            dec[k] = 0.0
    # default-on decoder dropouts (positional/attention) must go too: the
    # pipelined encoder consumes the per-layer key stream in a different
    # order, so any live dropout downstream draws different masks
    dec.setdefault('positional_dropout_rate', 0.0)
    dec.setdefault('self_attention_dropout_rate', 0.0)
    dec.setdefault('src_attention_dropout_rate', 0.0)
    conf = dict(conf, encoder_conf=enc, decoder_conf=dec)
    cfg_seq = ModelConfig.from_config(conf)
    conf_pp = dict(conf, encoder_conf=dict(
        enc, pipeline_stages=2, pipeline_microbatches=2))
    cfg_pp = ModelConfig.from_config(conf_pp)
    assert cfg_pp.encoder.pipeline_stages == 2
    tc = TrainConfig.from_config(conf)
    params = init_params(jax.random.PRNGKey(0), cfg_seq)
    tx, _ = build_optimizer(tc)
    opt_state = tx.init(params)
    B, T, L = 8, 64, 5
    rng = np.random.RandomState(3)
    batch = {
        'feats': rng.randn(B, T, 80).astype(np.float32),
        'feats_lengths': np.full((B,), T, np.int32),
        'target': rng.randint(1, cfg_seq.vocab_size - 2,
                              (B, L)).astype(np.int32),
        'target_lengths': np.full((B,), L, np.int32),
        'cat_embs': np.tile(np.array([[1.0, 0.0]], np.float32), (B, 1)),
    }

    dev0 = jax.devices()[0]
    ts_seq = make_train_step(cfg_seq, tx, accum_grad=tc.accum_grad,
                             grad_clip=tc.grad_clip)
    p0, o0 = jax.device_put((params, opt_state), dev0)
    want = []
    for i in range(2):
        p0, o0, m = jax.jit(ts_seq)(p0, o0, jax.device_put(
            jax.tree.map(jnp.asarray, batch), dev0),
            jnp.asarray(i), jax.random.PRNGKey(i))
        want.append((float(m['loss']), float(m['grad_norm'])))

    mesh = make_mesh(pipe=2, model=2)        # pipe=2, data=2, model=2
    ts_pp = make_train_step(cfg_pp, tx, accum_grad=tc.accum_grad,
                            grad_clip=tc.grad_clip)
    p_sh = param_shardings(params, mesh)
    o_sh = opt_state_shardings(opt_state, params, mesh, zero=True)
    p1 = jax.device_put(params, p_sh)
    o1 = jax.device_put(opt_state, o_sh)
    got = []
    with jax.set_mesh(mesh):
        step = jax.jit(ts_pp, in_shardings=(p_sh, o_sh, None, None, None),
                       out_shardings=(p_sh, o_sh, None))
        txt = step.lower(p1, o1, jax.tree.map(jnp.asarray, batch),
                         jnp.asarray(0), jax.random.PRNGKey(0)).as_text()
        # the GPipe region must actually engage (ring ppermute in the HLO)
        assert 'permute' in txt
        for i in range(2):
            p1, o1, m = step(p1, o1, put_batch(batch, mesh),
                             jnp.asarray(i), jax.random.PRNGKey(i))
            got.append((float(m['loss']), float(m['grad_norm'])))
    np.testing.assert_allclose(got, want, rtol=2e-4)
    dmax = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
               for a, b in zip(jax.tree.leaves(jax.device_get(p1)),
                               jax.tree.leaves(jax.device_get(p0))))
    assert dmax < 2e-4, dmax


def test_zero3_param_sharded_train_step_matches_single_device():
    """ZeRO-3 (param_shardings zero3=True): large params are STORED sharded
    over 'data' (each device holds 1/N) and gathered on use by XLA; the
    train step's losses/grad norms/updated params must equal the
    single-device run, and the shardings must actually shard params over
    'data' (plus an all-gather in the compiled HLO)."""
    from reverb_tpu.models.asr_model import ModelConfig, init_params
    from reverb_tpu.models.presets import reverb_tiny
    from reverb_tpu.parallel.mesh import (make_mesh, opt_state_shardings,
                                          param_shardings, put_batch)
    from reverb_tpu.train.trainer import (TrainConfig, build_optimizer,
                                          make_train_step)

    conf = reverb_tiny()
    cfg = ModelConfig.from_config(conf)
    tc = TrainConfig.from_config(conf)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tx, _ = build_optimizer(tc)
    opt_state = tx.init(params)
    B, T, L = 8, 64, 5
    rng = np.random.RandomState(3)
    batch = {
        'feats': rng.randn(B, T, 80).astype(np.float32),
        'feats_lengths': np.full((B,), T, np.int32),
        'target': rng.randint(1, cfg.vocab_size - 2, (B, L)).astype(np.int32),
        'target_lengths': np.full((B,), L, np.int32),
        'cat_embs': np.tile(np.array([[1.0, 0.0]], np.float32), (B, 1)),
    }
    ts = make_train_step(cfg, tx, accum_grad=tc.accum_grad,
                         grad_clip=tc.grad_clip)
    dev0 = jax.devices()[0]
    p0, o0 = jax.device_put((params, opt_state), dev0)
    want = []
    for i in range(2):
        p0, o0, m = jax.jit(ts)(p0, o0, jax.device_put(
            jax.tree.map(jnp.asarray, batch), dev0),
            jnp.asarray(i), jax.random.PRNGKey(i))
        want.append((float(m['loss']), float(m['grad_norm'])))

    mesh = make_mesh(model=2)            # data=4, model=2
    # small tiny-model dims: lower the size floor so the test exercises it
    p_sh = param_shardings(params, mesh, zero3=True, zero3_min_size=1024)
    o_sh = opt_state_shardings(opt_state, params, mesh, zero=True)
    specs = jax.tree.leaves(jax.tree.map(lambda s: str(s.spec), p_sh))
    assert any('data' in s for s in specs), 'zero3 sharded nothing'
    p1 = jax.device_put(params, p_sh)
    o1 = jax.device_put(opt_state, o_sh)
    # each device really stores a shard: addressable bytes ~ 1/data of big
    big = [l for l, s in zip(jax.tree.leaves(p1), specs) if 'data' in s][0]
    frac = big.addressable_shards[0].data.size / big.size
    assert frac <= 1 / mesh.shape['data'] + 1e-6, frac
    got = []
    with jax.set_mesh(mesh):
        step = jax.jit(ts, in_shardings=(p_sh, o_sh, None, None, None),
                       out_shardings=(p_sh, o_sh, None))
        txt = step.lower(p1, o1, jax.tree.map(jnp.asarray, batch),
                         jnp.asarray(0), jax.random.PRNGKey(0)
                         ).compile().as_text()   # collectives appear only
        #                                          after SPMD partitioning
        assert 'all-gather' in txt or 'all_gather' in txt
        for i in range(2):
            p1, o1, m = step(p1, o1, put_batch(batch, mesh),
                             jnp.asarray(i), jax.random.PRNGKey(i))
            got.append((float(m['loss']), float(m['grad_norm'])))
    np.testing.assert_allclose(got, want, rtol=1e-4)
    dmax = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
               for a, b in zip(jax.tree.leaves(jax.device_get(p1)),
                               jax.tree.leaves(jax.device_get(p0))))
    assert dmax < 2e-4, dmax
