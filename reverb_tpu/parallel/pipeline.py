"""Pipeline parallelism: GPipe microbatch schedule over a 'pipe' mesh axis.

The reference scales with data parallelism only (SURVEY.md §2.11); this is
the TPU-native scale-out path for encoders too deep for one chip's HBM.

Design (idiomatic shard_map, not an NCCL translation): per-layer params are
stacked with a leading stage axis sharded over 'pipe', activations advance
stage→stage with `lax.ppermute` ring shifts, and the M-microbatch GPipe
schedule runs M+S-1 ticks inside a `lax.scan`.  Each device computes only its
own stage's layers every tick; bubbles are (S-1)/(M+S-1).  Because the whole
schedule is one jitted scan, reverse-mode AD through it gives the standard
GPipe backward (activations rematerialized per-stage via jax.checkpoint on
the stage body).

Works on any ('pipe', ...) mesh — tests use the 8-device CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_pipe_mesh(pipe: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) % pipe == 0, (len(devices), pipe)
    arr = np.asarray(devices).reshape(pipe, len(devices) // pipe)
    return Mesh(arr, ('pipe', 'data'))


def stack_layer_params(layer_params_list):
    """[per-layer pytree] → pytree with leading layer axis (L, ...).

    All layers must be homogeneous (same tree structure/shapes) — the
    conformer middle stack is; LSL first/last layers stay outside the
    pipelined region.
    """
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params_list)


def pipeline_apply(layer_fn: Callable, stacked_params, x, n_microbatches: int,
                   mesh: Mesh, axis: str = 'pipe', remat: bool = True,
                   batch_args: tuple = (), takes_mb_index: bool = False):
    """Run `x` through L stacked layers pipelined over `axis`.

    layer_fn(params_of_one_layer, x, *mb_args) → x' must preserve x's shape
    (with takes_mb_index=True the call is layer_fn(lp, x, mb_idx, *mb_args);
    mb_idx is the microbatch index currently at this stage — fold it into
    dropout keys so microbatches draw independent masks).
    stacked_params: leading axis L (divisible by the stage count S);
    x: (B, ...) with B divisible by n_microbatches; batch_args: per-batch
    tensors (e.g. attention masks, leading dim B) that follow their
    microbatch through the pipeline.  Static shapes only.

    The shard_map is manual over ONLY `axis` (axis_names={axis}), so the
    call composes inside a jitted step over a larger
    ('pipe','data',...,'model') mesh: batch/model dims stay under the
    GSPMD partitioner (DP+PP+TP in one program).

    Returns layer_fn applied L times to x, numerically identical to the
    sequential loop (same order of layer application per microbatch).
    Caveat (standard GPipe semantics): batch-statistics layers inside
    layer_fn (train-mode batch norm, as in the conformer conv module's
    default cnn_module_norm='batch_norm') compute their statistics over
    one MICROBATCH (B/M rows), not the full batch — a train-time
    distribution shift, not a numerical bug.  Exact equality with the
    sequential loop holds for microbatch-independent layers (layer_norm).
    """
    S = mesh.shape[axis]
    M = n_microbatches
    L = jax.tree.leaves(stacked_params)[0].shape[0]
    assert L % S == 0, (L, S)
    B = x.shape[0]
    assert B % M == 0, (B, M)
    micro = x.reshape((M, B // M) + x.shape[1:])
    margs = tuple(a.reshape((M, B // M) + a.shape[1:]) for a in batch_args)

    def stage_fn(params_stage, xb, args_mb, mb_idx):
        """Apply this stage's L/S layers sequentially."""
        def body(h, lp):
            if takes_mb_index:
                return layer_fn(lp, h, mb_idx, *args_mb), None
            return layer_fn(lp, h, *args_mb), None
        step = jax.checkpoint(body) if remat else body
        out, _ = jax.lax.scan(step, xb, params_stage)
        return out

    def per_device(params_stage, micro_all, args_all):
        # params_stage: (L/S, ...) — this device's layers (shard_map slice)
        # micro_all: (M, mb, ...) — microbatches (replicated over 'pipe')
        sidx = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % S) for i in range(S)]
        mb_shape = micro_all.shape[1:]

        def tick(carry, t):
            inbuf = carry                       # activation entering my stage
            feed = micro_all[jnp.minimum(t, M - 1)]
            my_in = jnp.where(sidx == 0,
                              jnp.where(t < M, feed, jnp.zeros(mb_shape,
                                                               x.dtype)),
                              inbuf)
            # at tick t stage s holds microbatch t-s; its per-batch args
            # (masks etc.) must travel with it
            mb_idx = jnp.clip(t - sidx, 0, M - 1)
            args_mb = tuple(a[mb_idx] for a in args_all)
            out = stage_fn(params_stage, my_in, args_mb, mb_idx)
            nxt = jax.lax.ppermute(out, axis, perm)
            # the last stage emits microbatch t-(S-1) at tick t
            emit = jnp.where(sidx == S - 1, out, jnp.zeros_like(out))
            return nxt, emit

        # vma tracking (check_vma): the carry becomes device-varying after
        # the first tick (axis_index branch), so the initial zero must be
        # marked varying too
        zero = jax.lax.pvary(jnp.zeros(mb_shape, x.dtype), (axis,))
        _, emits = jax.lax.scan(tick, zero, jnp.arange(M + S - 1))
        # emits[t] is valid on the last stage for t in [S-1, M+S-1); psum
        # broadcasts it (every other stage contributed zeros)
        outs = jax.lax.psum(emits[S - 1:], axis)
        return outs                              # (M, mb, ...)

    pspec = P(axis)
    out = jax.shard_map(per_device, mesh=mesh,
                        in_specs=(pspec, P(), tuple(P() for _ in margs)),
                        out_specs=P(), axis_names={axis},
                        check_vma=True)(stacked_params, micro, margs)
    return out.reshape((B,) + x.shape[1:])


def pipeline_apply_fn(layer_fn: Callable, n_microbatches: int, mesh: Mesh,
                      axis: str = 'pipe', remat: bool = True):
    """Partial-application convenience returning f(stacked_params, x)."""
    return functools.partial(pipeline_apply, layer_fn,
                             n_microbatches=n_microbatches, mesh=mesh,
                             axis=axis, remat=remat)
