"""Flash attention with in-graph dropout (ops/flash_attention.py).

The kernel applies an externally-drawn bernoulli keep-mask — the very same
`jax.random.bernoulli(rng, keep, attn.shape)` draw the XLA path's
modules.dropout makes — so the fused path must match the unfused path
EXACTLY given the same rng, in both forward and gradients (interpret mode).
"""

import pytest
import math

import jax
import jax.numpy as jnp
import numpy as np

from reverb_tpu.ops import flash_attention as fa


def _inputs(B=2, H=4, T=40, dk=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    q = jax.random.normal(ks[0], (B, H, T, dk))
    k = jax.random.normal(ks[1], (B, H, T, dk))
    v = jax.random.normal(ks[2], (B, H, T, dk))
    pos = jax.random.normal(ks[3], (1, H, T, dk))
    u = jax.random.normal(ks[4], (H, dk)) * 0.1
    vb = jax.random.normal(ks[5], (H, dk)) * 0.1
    lens = jnp.asarray([T, T - 7][:B], jnp.int32)
    return q, k, v, pos, u, vb, lens


def _xla_with_same_draw(q, k, v, pos, u, vb, lens, rate, rng):
    """The unfused formulation with the identical bernoulli draw."""
    B, H, T, dk = q.shape
    qu = q + u[None, :, None, :]
    qv = q + vb[None, :, None, :]
    scores = (jnp.einsum('bhtd,bhsd->bhts', qu, k)
              + jnp.einsum('bhtd,hsd->bhts', qv, pos[0])) / math.sqrt(dk)
    valid = (jnp.arange(T)[None, None, None, :] < lens[:, None, None, None])
    scores = jnp.where(valid, scores, -1e9)
    attn = jnp.where(valid, jax.nn.softmax(scores, axis=-1), 0.0)
    if rate > 0.0:
        keep = jax.random.bernoulli(rng, 1.0 - rate, attn.shape)
        attn = jnp.where(keep, attn / (1.0 - rate), 0.0)
    return jnp.einsum('bhts,bhsd->bhtd', attn, v)


def test_flash_dropout_forward_matches():
    q, k, v, pos, u, vb, lens = _inputs()
    rng = jax.random.PRNGKey(42)
    out = fa.rel_pos_flash_attention(q, k, v, pos, u, vb, lens,
                                     interpret=True, rate=0.3, rng=rng)
    ref = _xla_with_same_draw(q, k, v, pos, u, vb, lens, 0.3, rng)
    B, T = q.shape[0], q.shape[2]
    for b in range(B):
        L = int(lens[b])
        np.testing.assert_allclose(np.asarray(out)[b, :, :L],
                                   np.asarray(ref)[b, :, :L],
                                   rtol=2e-5, atol=2e-5)


def test_flash_dropout_gradients_match():
    q, k, v, pos, u, vb, lens = _inputs(T=32)
    rng = jax.random.PRNGKey(7)
    w = (jnp.arange(q.shape[2])[None, None, :, None]
         < lens[:, None, None, None])

    def loss_flash(q, k, v, pos, u, vb):
        out = fa.rel_pos_flash_attention(q, k, v, pos, u, vb, lens,
                                         interpret=True, rate=0.25, rng=rng)
        return jnp.sum(jnp.where(w, out, 0.0) ** 2)

    def loss_ref(q, k, v, pos, u, vb):
        out = _xla_with_same_draw(q, k, v, pos, u, vb, lens, 0.25, rng)
        return jnp.sum(jnp.where(w, out, 0.0) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, pos, u, vb)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, pos, u, vb)
    for a, b, name in zip(g1, g2, ['q', 'k', 'v', 'pos', 'u', 'vb']):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5, err_msg=name)


def test_flash_dropout_keep_fraction():
    q, k, v, pos, u, vb, lens = _inputs(B=1, T=64)
    rng = jax.random.PRNGKey(3)
    out_drop = fa.rel_pos_flash_attention(q, k, v, pos, u, vb, lens,
                                          interpret=True, rate=0.5, rng=rng)
    out_full = fa.rel_pos_flash_attention(q, k, v, pos, u, vb, lens,
                                          interpret=True)
    # dropout is unbiased in expectation but must actually change the output
    assert not np.allclose(np.asarray(out_drop), np.asarray(out_full))


@pytest.mark.slow
def test_flash_dropout_full_train_step_subprocess():
    """Full compute_loss train step with attention dropout engaged, fused vs
    unfused, same rng. Runs in a subprocess on ONE cpu device because the
    dropout kernel path is gated to single-device processes and the main
    suite forces 8 virtual devices."""
    import json
    import os
    import subprocess
    import sys

    worker = os.path.join(os.path.dirname(__file__),
                          'flash_dropout_worker.py')
    env = {k: v for k, v in os.environ.items() if k != 'XLA_FLAGS'}
    out = subprocess.run([sys.executable, worker], env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    # identical bernoulli draw => identical loss up to kernel reduction order
    np.testing.assert_allclose(res['loss_flash'], res['loss_xla'],
                               rtol=1e-5)
    # grads accumulate f32 reduction-order noise through the whole model;
    # a wrong mask/scaling would show up as O(1) relative error
    assert res['max_rel_grad'] < 0.05, res


def test_dropout_eligibility_gate():
    """rate>0 keeps the kernel whenever no >1-device mesh is ambient (the
    kernel shard_maps itself under registered meshes — covered by
    test_pallas_mesh) and can be env-disabled."""
    import os
    mask = jnp.ones((2, 1, 8), bool)
    rng = jax.random.PRNGKey(0)
    fa.set_use_pallas(True)
    try:
        assert fa.flash_attention_eligible(mask, 0.1, rng, None)
        # rate>0 with no rng == eval mode: always eligible
        assert fa.flash_attention_eligible(mask, 0.1, None, None)
        os.environ['REVERB_TPU_NO_FLASH_DROPOUT'] = '1'
        try:
            assert not fa.flash_attention_eligible(mask, 0.1, rng, None)
        finally:
            os.environ['REVERB_TPU_NO_FLASH_DROPOUT'] = ''
    finally:
        fa.set_use_pallas(None)
