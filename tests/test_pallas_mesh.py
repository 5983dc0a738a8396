"""Pallas kernels under a GSPMD mesh via shard_map (ops/pallas_mesh.py).

Round-2 gates simply disabled the flash-attention and beam-scan kernels
whenever a multi-device mesh was active.  Now a registered concrete mesh
lets the kernel entries shard_map themselves over the batch-like axes; on
the CPU test mesh the kernels run in interpret mode, so these tests verify
the sharding plumbing (specs, local shapes, gradients) — numerics must be
IDENTICAL to the unsharded launch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from reverb_tpu.ops.pallas_mesh import set_pallas_mesh


@pytest.fixture
def mesh42():
    m = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ('data', 'model'))
    yield m
    set_pallas_mesh(None)


def _flash_inputs(B=8, H=4, T=24, dk=8, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, H, T, dk), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, T, dk), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, T, dk), jnp.float32)
    pos = jnp.asarray(rng.randn(1, H, T, dk), jnp.float32)
    u = jnp.asarray(rng.randn(H, dk), jnp.float32)
    vb = jnp.asarray(rng.randn(H, dk), jnp.float32)
    lens = jnp.asarray(rng.randint(T // 2, T + 1, (B,)), jnp.int32)
    return q, k, v, pos, u, vb, lens


def test_flash_attention_shard_map_matches_unsharded(mesh42):
    from reverb_tpu.ops.flash_attention import rel_pos_flash_attention
    args = _flash_inputs()
    ref = rel_pos_flash_attention(*args, interpret=True)
    set_pallas_mesh(mesh42)
    q = jax.device_put(args[0], NamedSharding(mesh42,
                                              P('data', 'model', None, None)))
    got = rel_pos_flash_attention(q, *args[1:], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_flash_attention_shard_map_gradients(mesh42):
    """Autodiff through the shard_map region: the custom-vjp backward runs
    per shard and the per-head bias grads psum correctly over 'data'."""
    from reverb_tpu.ops.flash_attention import rel_pos_flash_attention
    args = _flash_inputs(seed=3)

    def loss(q, k, v, pos, u, vb, lens):
        out = rel_pos_flash_attention(q, k, v, pos, u, vb, lens,
                                      interpret=True)
        return jnp.sum(out * out)

    g_ref = jax.grad(loss, argnums=(0, 4, 5))(*args)
    set_pallas_mesh(mesh42)
    g_got = jax.grad(loss, argnums=(0, 4, 5))(*args)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_flash_attention_indivisible_shapes_run_unsharded(mesh42):
    """B=6 doesn't divide data=4: the entry must quietly run whole-batch."""
    from reverb_tpu.ops.flash_attention import rel_pos_flash_attention
    args = _flash_inputs(B=6, seed=5)
    ref = rel_pos_flash_attention(*args, interpret=True)
    set_pallas_mesh(mesh42)
    got = rel_pos_flash_attention(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_beam_kernel_shard_map_matches_unsharded(mesh42):
    from reverb_tpu.decode.prefix_beam import _search_batched
    B, T, K2, K, V = 8, 40, 4, 4, 32
    rng = np.random.RandomState(0)
    probs = rng.randn(B, T, V).astype(np.float32)
    probs = probs - np.log(np.exp(probs).sum(-1, keepdims=True))
    topk_logp, topk_idx = jax.lax.top_k(jnp.asarray(probs), K2)
    num_t = jnp.asarray(rng.randint(T // 2, T + 1, (B,)), jnp.int32)
    ref = _search_batched(topk_logp, topk_idx.astype(jnp.int32), num_t, K,
                          0, T, interpret=True)
    set_pallas_mesh(mesh42)
    got = _search_batched(topk_logp, topk_idx.astype(jnp.int32), num_t, K,
                          0, T, interpret=True)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eligibility_requires_plan_under_mesh(mesh42):
    """Tracing under an ambient >1-device mesh (jax.set_mesh — how
    bin/train.py and __graft_entry__ run), the flash gate must refuse when
    no concrete mesh is registered (a pallas op there has no partitioning
    rule) and accept once one is registered with dividing shapes."""
    from reverb_tpu.ops import flash_attention as fa
    mask = jnp.ones((8, 1, 16), bool)
    seen = {}

    def make_probe(tag):
        # distinct function objects: jax.jit memoizes traces on the
        # underlying callable, and the gate must be re-evaluated per trace
        def probe(x):
            seen[tag] = fa.flash_attention_eligible(mask, 0.0, None, None,
                                                    batch=8, heads=4)
            return x
        return probe

    old = fa._OVERRIDE
    fa.set_use_pallas(True)
    try:
        with jax.set_mesh(mesh42):
            jax.jit(make_probe('before'))(jnp.ones((8, 4)))
            assert seen['before'] is False
            set_pallas_mesh(mesh42)
            jax.jit(make_probe('after'))(jnp.ones((8, 4)))
            assert seen['after'] is True
            # indivisible heads -> no plan -> XLA path
            seen2 = fa.flash_attention_eligible(mask, 0.0, None, None,
                                                batch=8, heads=3)
            assert seen2 is False
    finally:
        fa.set_use_pallas(old)
