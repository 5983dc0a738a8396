"""Pallas kernel parity tests (interpret mode on CPU).

The flash rel-pos attention kernel must match the XLA formulation in
reverb_tpu.models.attention.rel_pos_mha bit-for-tolerance, including key
padding and gradients (custom VJP recomputes through the XLA path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reverb_tpu.models import attention as att
from reverb_tpu.models.modules import init_linear
from reverb_tpu.ops import flash_attention as fa


def _mk_params(rng, d, h):
    ks = jax.random.split(rng, 6)
    p = {
        'linear_q': init_linear(ks[0], d, d),
        'linear_k': init_linear(ks[1], d, d),
        'linear_v': init_linear(ks[2], d, d),
        'linear_out': init_linear(ks[3], d, d),
        'linear_pos': init_linear(ks[4], d, d, bias=False),
        'pos_bias_u': jax.random.normal(ks[5], (h, d // h)) * 0.1,
        'pos_bias_v': jax.random.normal(ks[5], (h, d // h)) * 0.1,
    }
    return p


@pytest.mark.parametrize('T,lens', [(37, (37, 21)), (130, (130, 64))])
def test_flash_matches_xla_path(T, lens):
    d, h, B = 64, 4, 2
    rng = jax.random.PRNGKey(0)
    p = _mk_params(rng, d, h)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, d))
    pos = jax.random.normal(jax.random.PRNGKey(2), (1, T, d))
    mask = (jnp.arange(T)[None, None, :] <
            jnp.asarray(lens)[:, None, None])

    fa.set_use_pallas(False)
    try:
        ref, _ = att.rel_pos_mha(p, x, x, x, mask, pos, h)
        fa.set_use_pallas(True)
        out, _ = att.rel_pos_mha(p, x, x, x, mask, pos, h)
    finally:
        fa.set_use_pallas(None)
    # padded query rows may differ (both get masked downstream); compare valid
    for b, L in enumerate(lens):
        np.testing.assert_allclose(np.asarray(out)[b, :L],
                                   np.asarray(ref)[b, :L],
                                   rtol=2e-5, atol=2e-5)


def test_flash_gradients_match():
    d, h, B, T = 64, 4, 2, 48
    p = _mk_params(jax.random.PRNGKey(0), d, h)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, d))
    pos = jax.random.normal(jax.random.PRNGKey(2), (1, T, d))
    mask = (jnp.arange(T)[None, None, :] <
            jnp.asarray([T, T - 9])[:, None, None])

    def loss(params, x, enable):
        fa.set_use_pallas(enable)
        try:
            out, _ = att.rel_pos_mha(params, x, x, x, mask, pos, h)
        finally:
            fa.set_use_pallas(None)
        w = mask[:, 0, :, None]
        return jnp.sum(jnp.where(w, out, 0.0) ** 2)

    g_ref = jax.grad(loss)(p, x, False)
    g_new = jax.grad(loss)(p, x, True)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5), g_ref, g_new)


def test_flash_bf16_runs():
    d, h, B, T = 64, 2, 1, 40
    p = _mk_params(jax.random.PRNGKey(0), d, h)
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, d), jnp.bfloat16)
    pos = jax.random.normal(jax.random.PRNGKey(2), (1, T, d), jnp.bfloat16)
    mask = jnp.ones((B, 1, T), bool)
    fa.set_use_pallas(True)
    try:
        out, _ = att.rel_pos_mha(p, x, x, x, mask, pos, h)
    finally:
        fa.set_use_pallas(None)
    assert out.dtype == jnp.bfloat16 and out.shape == (B, T, d)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_ineligible_cases_fall_back():
    # chunk mask (B,T,T) and KV cache must not take the kernel path
    assert not fa.flash_attention_eligible(jnp.ones((2, 8, 8), bool), 0.0,
                                           None, None) or not \
        fa.use_pallas_enabled()
    fa.set_use_pallas(True)
    try:
        assert not fa.flash_attention_eligible(jnp.ones((2, 8, 8), bool),
                                               0.0, None, None)
        assert not fa.flash_attention_eligible(jnp.ones((2, 1, 8), bool),
                                               0.0, None,
                                               jnp.zeros((2, 4, 0, 32)))
        assert fa.flash_attention_eligible(jnp.ones((2, 1, 8), bool), 0.0,
                                           None, None)
    finally:
        fa.set_use_pallas(None)


def test_topk_lastdim_matches_lax_topk():
    """Blocked exact top-k == lax.top_k bit-for-bit, including ties
    (ops/topk.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from reverb_tpu.ops.topk import topk_lastdim
    rng = np.random.RandomState(0)
    for shape, k, block in (((3, 7, 2000), 10, 128), ((2, 555), 4, 64),
                            ((5, 1030), 7, 128), ((4, 100), 3, 128)):
        x = rng.randn(*shape).astype(np.float32)
        # force ties to exercise lexicographic masking
        x[..., ::7] = x[..., 1::7][..., :x[..., ::7].shape[-1]] \
            if x[..., 1::7].shape[-1] >= x[..., ::7].shape[-1] else x[..., ::7]
        flat = x.reshape(-1, x.shape[-1])
        flat[:, 3] = flat[:, 11]   # exact duplicates
        v1, i1 = jax.lax.top_k(jnp.asarray(x), k)
        v2, i2 = topk_lastdim(jnp.asarray(x), k, block=block)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_kernel_probes_detect_failure_inside_trace(monkeypatch):
    """A kernel probe first reached while TRACING an enclosing jit must
    still execute (ensure_compile_time_eval + an own jit) so a lowering
    failure is caught and stamped unavailable — previously the probe ops
    bound to the ambient trace, no lowering ran, no error could surface,
    and the broken kernel crashed the enclosing program's compile instead
    of falling back.  On the CPU test backend interpret=False IS a real
    lowering failure, so this drives the genuine probe code path."""
    import jax
    import jax.numpy as jnp
    from reverb_tpu.ops import beam_scan as bs
    from reverb_tpu.ops import flash_attention as fa

    monkeypatch.setattr(fa, '_BWD_OK', None)
    monkeypatch.setattr(bs, '_KERNEL_OK', None)

    probed = {}

    def probe_in_trace(x):
        probed['flash'] = fa._bwd_kernel_available(False)
        probed['beam'] = bs.kernel_available()
        return x

    jax.jit(probe_in_trace)(jnp.ones(2))
    assert probed['flash'] is False
    assert probed['beam'] is False


# ---------------- fused LayerNorm (ops/layer_norm.py) ----------------

def _ln_xla(p, x, eps):
    """The modules.layer_norm XLA formulation, pallas-free."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True)
                      - mean * mean, 0.0)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return y * p['weight'].astype(x.dtype) + p['bias'].astype(x.dtype)


@pytest.mark.parametrize('shape,eps', [((3, 40, 128), 1e-5),
                                       ((2, 7, 256), 1e-12),
                                       ((5, 128), 1e-5)])
def test_fused_ln_forward_matches_xla(shape, eps):
    from reverb_tpu.ops.layer_norm import eligible, fused_layer_norm
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    p = {'weight': jnp.asarray(rng.randn(shape[-1]), jnp.float32),
         'bias': jnp.asarray(rng.randn(shape[-1]), jnp.float32)}
    assert eligible(x)
    got = fused_layer_norm(x, p['weight'], p['bias'], eps)
    ref = _ln_xla(p, x, eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_fused_ln_forward_bf16():
    from reverb_tpu.ops.layer_norm import fused_layer_norm
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 33, 128), jnp.bfloat16)   # odd rows: 132
    p = {'weight': jnp.asarray(rng.randn(128), jnp.float32),
         'bias': jnp.asarray(rng.randn(128), jnp.float32)}
    got = fused_layer_norm(x, p['weight'], p['bias'], 1e-5)
    ref = _ln_xla(p, x, 1e-5)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_fused_ln_grads_match_xla(dtype):
    """dx/dgamma/dbeta of the Pallas custom VJP vs autodiff of the XLA
    formulation — including the ragged last row-block's masking."""
    from reverb_tpu.ops.layer_norm import fused_layer_norm
    rng = np.random.RandomState(2)
    B, T, C = 3, 37, 256                       # 111 rows: ragged tail
    x = jnp.asarray(rng.randn(B, T, C), dtype)
    w = jnp.asarray(rng.randn(C), jnp.float32)
    b = jnp.asarray(rng.randn(C), jnp.float32)
    g = jnp.asarray(rng.randn(B, T, C), dtype)

    def f_pallas(x, w, b):
        return jnp.vdot(fused_layer_norm(x, w, b, 1e-5).astype(jnp.float32),
                        g.astype(jnp.float32))

    def f_xla(x, w, b):
        return jnp.vdot(_ln_xla({'weight': w, 'bias': b}, x,
                                1e-5).astype(jnp.float32),
                        g.astype(jnp.float32))

    gp = jax.grad(f_pallas, argnums=(0, 1, 2))(x, w, b)
    if dtype == jnp.float32:
        gr = jax.grad(f_xla, argnums=(0, 1, 2))(x, w, b)
        tol = dict(rtol=1e-5, atol=1e-5)
    else:
        # bf16: the XLA path's dgamma/dbeta accumulate in bf16 (quantized);
        # the kernel accumulates in f32 — compare both against the f32
        # ground truth instead, where the kernel must be at least as close
        gr = jax.grad(f_xla, argnums=(0, 1, 2))(
            x.astype(jnp.float32), w, b)
        tol = dict(rtol=3e-2, atol=5e-2)
    for got, ref in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32), **tol)


def test_fused_ln_ineligible_shapes():
    from reverb_tpu.ops.layer_norm import eligible
    assert not eligible(jnp.zeros((4, 100)))        # C not lane-aligned
    assert not eligible(jnp.zeros((4, 16384)))      # C over VMEM budget
    assert not eligible(jnp.zeros((8,)))            # 1-D
    assert not eligible(jnp.zeros((4, 128), jnp.int32))


def test_modules_layer_norm_uses_fused_when_forced(monkeypatch):
    """modules.layer_norm routes through the Pallas kernel when BOTH the
    opt-in env (REVERB_TPU_PALLAS_LN — measured non-win on the flagship
    train step, so off by default) and the pallas toggle force it on, and
    matches the XLA path exactly."""
    from reverb_tpu.models.modules import layer_norm
    from reverb_tpu.ops import set_use_pallas
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 19, 128), jnp.float32)
    p = {'weight': jnp.asarray(rng.randn(128), jnp.float32),
         'bias': jnp.asarray(rng.randn(128), jnp.float32)}
    ref = layer_norm(p, x)
    monkeypatch.setenv('REVERB_TPU_PALLAS_LN', '1')
    set_use_pallas(True)
    try:
        got = layer_norm(p, x)
    finally:
        set_use_pallas(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
