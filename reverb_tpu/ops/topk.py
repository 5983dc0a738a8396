"""Exact last-dim top-k without XLA's full sort.

`jax.lax.top_k` over a large vocab lowers to a whole-row sort on TPU — for
the (B, T≈512, V=10⁴) CTC log-prob tensor that sort was 145 ms of device
time, 45% of the entire long-form pipeline.  This blocked formulation is
exact and ~13× faster (11 ms measured, same shapes):

  1. one full pass computes per-block max+argmax over V/block blocks;
  2. k small iterations each pick the global winner from the (.., G) block
     table and re-derive just the winning block's next candidate with the
     already-extracted elements masked lexicographically ((value, -index)
     order — identical tie-breaking to lax.top_k, verified element-exact).

Cost ≈ one memory pass over x + k·(V/block) instead of O(V log V) sort work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def topk_lastdim(x, k: int, block: int = 128):
    """Exact (values, indices) of the k largest along the last dim.

    Bit-identical to jax.lax.top_k (values descending, ties by ascending
    index).  Use for large last dims on TPU; falls back to lax.top_k when
    the last dim is too small for blocking to help.
    """
    V = x.shape[-1]
    if V <= 4 * block or k >= block:
        return jax.lax.top_k(x, k)
    Vp = -(-V // block) * block
    if Vp != V:
        x = jnp.concatenate(
            [x, jnp.full(x.shape[:-1] + (Vp - V,), -jnp.inf, x.dtype)], -1)
    G = Vp // block
    xb = x.reshape(x.shape[:-1] + (G, block))
    bmax = jnp.max(xb, -1)                                   # full pass
    barg = jnp.argmax(xb, -1).astype(jnp.int32)
    garange = jax.lax.broadcasted_iota(jnp.int32, bmax.shape, bmax.ndim - 1)
    vals, idxs = [], []
    for _ in range(k):
        g = jnp.argmax(bmax, -1).astype(jnp.int32)
        v = jnp.take_along_axis(bmax, g[..., None], -1)[..., 0]
        ib = jnp.take_along_axis(barg, g[..., None], -1)[..., 0]
        gi = g * block + ib
        vals.append(v)
        idxs.append(gi)
        # winning block's next candidate, extracted elements masked out
        blk = jnp.take_along_axis(xb, g[..., None, None], -2)[..., 0, :]
        bgi = g[..., None] * block + jnp.arange(block)
        cond = (blk < v[..., None]) | ((blk == v[..., None])
                                       & (bgi > gi[..., None]))
        mblk = jnp.where(cond, blk, -jnp.inf)
        upd = garange == g[..., None]
        bmax = jnp.where(upd, jnp.max(mblk, -1)[..., None], bmax)
        barg = jnp.where(upd,
                         jnp.argmax(mblk, -1).astype(jnp.int32)[..., None],
                         barg)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)
