"""Numeric validation of low-level ops against torch primitives (torch is a
numeric oracle here — no reference code involved)."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from reverb_tpu.models.modules import (batch_norm_1d, conv1d, conv2d, glu,
                                       layer_norm, linear, swish)

RNG = np.random.RandomState(0)


def _np(x):
    return np.asarray(x)


def test_linear_matches_torch():
    x = RNG.randn(2, 5, 8).astype(np.float32)
    w = RNG.randn(6, 8).astype(np.float32)
    b = RNG.randn(6).astype(np.float32)
    ours = _np(linear({'weight': jnp.asarray(w), 'bias': jnp.asarray(b)},
                      jnp.asarray(x)))
    theirs = F.linear(torch.from_numpy(x), torch.from_numpy(w),
                      torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_layer_norm_matches_torch():
    x = RNG.randn(3, 7, 16).astype(np.float32)
    w = RNG.rand(16).astype(np.float32) + 0.5
    b = RNG.randn(16).astype(np.float32)
    for eps in (1e-5, 1e-12):
        ours = _np(layer_norm({'weight': jnp.asarray(w), 'bias': jnp.asarray(b)},
                              jnp.asarray(x), eps))
        theirs = F.layer_norm(torch.from_numpy(x), (16,), torch.from_numpy(w),
                              torch.from_numpy(b), eps).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_conv1d_matches_torch():
    x = RNG.randn(2, 4, 20).astype(np.float32)
    w = RNG.randn(8, 4, 3).astype(np.float32)
    b = RNG.randn(8).astype(np.float32)
    ours = _np(conv1d({'weight': jnp.asarray(w), 'bias': jnp.asarray(b)},
                      jnp.asarray(x), stride=1, padding=1))
    theirs = F.conv1d(torch.from_numpy(x), torch.from_numpy(w),
                      torch.from_numpy(b), padding=1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_depthwise_conv1d_matches_torch():
    x = RNG.randn(2, 6, 20).astype(np.float32)
    w = RNG.randn(6, 1, 15).astype(np.float32)
    ours = _np(conv1d({'weight': jnp.asarray(w)}, jnp.asarray(x),
                      padding=7, groups=6))
    theirs = F.conv1d(torch.from_numpy(x), torch.from_numpy(w),
                      padding=7, groups=6).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_conv2d_stride2_matches_torch():
    x = RNG.randn(2, 1, 30, 80).astype(np.float32)
    w = RNG.randn(16, 1, 3, 3).astype(np.float32)
    b = RNG.randn(16).astype(np.float32)
    ours = _np(conv2d({'weight': jnp.asarray(w), 'bias': jnp.asarray(b)},
                      jnp.asarray(x), stride=(2, 2)))
    theirs = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                      torch.from_numpy(b), stride=2).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_batch_norm_matches_torch():
    x = RNG.randn(2, 5, 12).astype(np.float32)
    w = RNG.rand(5).astype(np.float32) + 0.5
    b = RNG.randn(5).astype(np.float32)
    rm = RNG.randn(5).astype(np.float32)
    rv = RNG.rand(5).astype(np.float32) + 0.5
    p = {'weight': jnp.asarray(w), 'bias': jnp.asarray(b),
         'running_mean': jnp.asarray(rm), 'running_var': jnp.asarray(rv)}
    ours = _np(batch_norm_1d(p, jnp.asarray(x)))
    theirs = F.batch_norm(torch.from_numpy(x), torch.from_numpy(rm),
                          torch.from_numpy(rv), torch.from_numpy(w),
                          torch.from_numpy(b), training=False).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_glu_swish_match_torch():
    x = RNG.randn(2, 8, 10).astype(np.float32)
    np.testing.assert_allclose(_np(glu(jnp.asarray(x), axis=1)),
                               F.glu(torch.from_numpy(x), dim=1).numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(_np(swish(jnp.asarray(x))),
                               F.silu(torch.from_numpy(x)).numpy(),
                               rtol=1e-5, atol=1e-6)
