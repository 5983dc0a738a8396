"""Rel-pos attention (no rel_shift) vs an inline torch computation of the same
formula, plus masking semantics."""

import numpy as np
import torch
import jax.numpy as jnp

from reverb_tpu.models.attention import mha, rel_pos_mha
from reverb_tpu.models.modules import init_linear
import jax

H, D, T = 2, 16, 7
DK = D // H
RNG = np.random.RandomState(42)


def _mk_linear(rng, din, dout, bias=True):
    w = rng.randn(dout, din).astype(np.float32) * 0.1
    p = {'weight': jnp.asarray(w)}
    t = {'weight': torch.from_numpy(w)}
    if bias:
        b = rng.randn(dout).astype(np.float32) * 0.1
        p['bias'] = jnp.asarray(b)
        t['bias'] = torch.from_numpy(b)
    return p, t


def _torch_linear(t, x):
    return torch.nn.functional.linear(x, t['weight'], t.get('bias'))


def test_rel_pos_mha_matches_formula():
    rng = RNG
    pq, tq = _mk_linear(rng, D, D)
    pk, tk = _mk_linear(rng, D, D)
    pv, tv = _mk_linear(rng, D, D)
    po, to = _mk_linear(rng, D, D)
    pp, tp = _mk_linear(rng, D, D, bias=False)
    u = rng.randn(H, DK).astype(np.float32) * 0.1
    v = rng.randn(H, DK).astype(np.float32) * 0.1
    params = {'linear_q': pq, 'linear_k': pk, 'linear_v': pv, 'linear_out': po,
              'linear_pos': pp, 'pos_bias_u': jnp.asarray(u),
              'pos_bias_v': jnp.asarray(v)}

    x = rng.randn(1, T, D).astype(np.float32)
    pos = rng.randn(1, T, D).astype(np.float32)
    mask = np.ones((1, 1, T), dtype=bool)

    ours, _ = rel_pos_mha(params, jnp.asarray(x), jnp.asarray(x),
                          jnp.asarray(x), jnp.asarray(mask), jnp.asarray(pos),
                          H)

    # inline torch: scores = ((q+u)k^T + (q+v)p^T)/sqrt(dk), NO rel_shift
    xt = torch.from_numpy(x)
    q = _torch_linear(tq, xt).view(1, T, H, DK).transpose(1, 2)
    k = _torch_linear(tk, xt).view(1, T, H, DK).transpose(1, 2)
    val = _torch_linear(tv, xt).view(1, T, H, DK).transpose(1, 2)
    p_ = _torch_linear(tp, torch.from_numpy(pos)).view(1, T, H, DK).transpose(1, 2)
    ut = torch.from_numpy(u)[None, :, None, :]
    vt = torch.from_numpy(v)[None, :, None, :]
    scores = ((q + ut) @ k.transpose(-2, -1)
              + (q + vt) @ p_.transpose(-2, -1)) / np.sqrt(DK)
    attn = torch.softmax(scores, dim=-1)
    out = (attn @ val).transpose(1, 2).reshape(1, T, D)
    theirs = _torch_linear(to, out).numpy()

    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-5)


def test_mha_masking():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    params = {'linear_q': init_linear(ks[0], D, D),
              'linear_k': init_linear(ks[1], D, D),
              'linear_v': init_linear(ks[2], D, D),
              'linear_out': init_linear(ks[3], D, D)}
    x = jnp.asarray(RNG.randn(2, T, D).astype(np.float32))
    # row 1 masks the last 3 keys; changing masked keys must not change output
    mask = np.ones((2, 1, T), dtype=bool)
    mask[1, :, -3:] = False
    out1, _ = mha(params, x, x, x, jnp.asarray(mask), H)
    x2 = x.at[1, -3:, :].set(999.0)
    out2, _ = mha(params, x2, x2, x2, jnp.asarray(mask), H)
    np.testing.assert_allclose(np.asarray(out1[1, :T - 3]),
                               np.asarray(out2[1, :T - 3]), rtol=1e-4,
                               atol=1e-4)


def test_mha_kv_cache_concat():
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 4)
    params = {'linear_q': init_linear(ks[0], D, D),
              'linear_k': init_linear(ks[1], D, D),
              'linear_v': init_linear(ks[2], D, D),
              'linear_out': init_linear(ks[3], D, D)}
    x = jnp.asarray(RNG.randn(1, T, D).astype(np.float32))
    full, _ = mha(params, x, x, x, None, H)
    # split: run first T-2 to build cache, then query last 2 with cache
    _, cache = mha(params, x[:, :T - 2], x[:, :T - 2], x[:, :T - 2], None, H)
    out2, _ = mha(params, x[:, T - 2:], x[:, T - 2:], x[:, T - 2:], None, H,
                  cache=cache)
    np.testing.assert_allclose(np.asarray(full[:, T - 2:]), np.asarray(out2),
                               rtol=1e-4, atol=1e-4)
