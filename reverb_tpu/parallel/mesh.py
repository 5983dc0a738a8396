"""Device mesh + sharding rules: the TPU-native replacement for the
reference's NCCL DDP / DeepSpeed ZeRO stack (SURVEY.md §2.11).

Reference capabilities covered:
  - DDP data parallelism (utils/train_utils.py:353-371)  → 'data' mesh axis;
    gradients are psum-reduced by XLA from the sharded-batch pjit train step.
  - DeepSpeed ZeRO-1/2 optimizer-state sharding (train_utils.py:372-391)
    → optimizer state sharded along 'data' via sharding rules (ZeRO≙sharded
    adam moments; XLA inserts reduce-scatter/all-gather on ICI).
  - NEW (no reference counterpart): tensor parallelism over a 'model' axis —
    attention heads and FFN hidden dims sharded, collectives ride ICI;
    sequence parallelism over a 'seq' axis (encoder time dim sharded for
    long-form single-pass encoding, SURVEY.md §5 long-context); expert
    parallelism over an 'expert' axis for the MoE FFN; pipeline parallelism
    over a 'pipe' axis (parallel/pipeline.py).

All axes are Auto-typed: params/batches are placed with device_put
NamedShardings, activations/stacked expert weights get
`with_sharding_constraint` hints, and XLA's SPMD partitioner propagates
(halo exchange for convs, all-gather for attention scores) exactly as the
scaling-book recipe prescribes.  (Explicit axis types would demand reshard
calls at every replicated↔sharded concat inside the model code — strictly
worse ergonomics for identical compiled programs.)

The param pytree keys mirror torch paths, so sharding rules are regex→
PartitionSpec tables over the flattened dotted path.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import AxisType, Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, seq: int = 1, expert: int = 1,
              pipe: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('pipe','data','seq','expert','model') mesh; data=-1 → all
    remaining devices.  Size-1 axes cost nothing; legacy ('data','model')
    callers are unchanged.  'pipe' leads: pipeline stages are the coarsest
    split (stage-to-stage ppermute traffic is one activation per tick vs
    per-op collectives on the inner axes)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (model * seq * expert * pipe) == 0, \
            (n, model, seq, expert, pipe)
        data = n // (model * seq * expert * pipe)
    assert data * model * seq * expert * pipe == n, \
        (pipe, data, seq, expert, model, n)
    arr = np.asarray(devices).reshape(pipe, data, seq, expert, model)
    return Mesh(arr, ('pipe', 'data', 'seq', 'expert', 'model'))


def constrain(x, *axis_names):
    """Hint the ambient-mesh sharding of `x`: one mesh-axis name (or None)
    per array dim.  No-op outside a mesh; silently drops axes that are
    missing, size-1, non-Auto, or don't divide the dim — so model code can
    annotate unconditionally and still run on CPU unit-test meshes.
    """
    am = jax.sharding.get_abstract_mesh()
    if not getattr(am, 'shape_tuple', ()):
        return x
    sizes = dict(am.shape_tuple)
    types = dict(zip(am.axis_names, am.axis_types))
    spec = []
    for d, name in enumerate(axis_names):
        ok = (name is not None and sizes.get(name, 1) > 1
              and types.get(name) == AxisType.Auto   # Explicit needs reshard
              and d < x.ndim and x.shape[d] % sizes[name] == 0)
        spec.append(name if ok else None)
    if not any(spec):
        return x
    return jax.lax.with_sharding_constraint(x, P(*spec))


# (regex over dotted param path) → PartitionSpec. First match wins.
# Torch Linear weight is (out, in): shard `out` for column-parallel,
# `in` for row-parallel.
TP_RULES = [
    # attention QKV: column-parallel (heads split across 'model')
    (r'.*self_attn\.linear_[qkv]\.weight$', P('model', None)),
    (r'.*self_attn\.linear_[qkv]\.bias$', P('model')),
    (r'.*src_attn\.linear_[qkv]\.weight$', P('model', None)),
    (r'.*src_attn\.linear_[qkv]\.bias$', P('model')),
    (r'.*attn\.linear_pos\.weight$', P('model', None)),
    (r'.*attn\.pos_bias_[uv]$', P('model', None)),
    # attention output: row-parallel
    (r'.*attn\.linear_out\.weight$', P(None, 'model')),
    # FFN: w_1 column-parallel, w_2 row-parallel
    (r'.*feed_forward(_macaron)?\.w_1\.weight$', P('model', None)),
    (r'.*feed_forward(_macaron)?\.w_1\.bias$', P('model')),
    (r'.*feed_forward(_macaron)?\.w_2\.weight$', P(None, 'model')),
    # conformer conv module: channel-sharded pointwise/depthwise
    (r'.*pointwise_conv1\.weight$', P('model', None, None)),
    (r'.*pointwise_conv1\.bias$', P('model')),
    (r'.*depthwise_conv\.weight$', P('model', None, None)),
    (r'.*depthwise_conv\.bias$', P('model')),
    (r'.*pointwise_conv2\.weight$', P(None, 'model', None)),
    # vocab projections: column-parallel over vocab
    (r'.*output_layer\.weight$', P('model', None)),
    (r'.*output_layer\.bias$', P('model')),
    (r'.*ctc_lo\.weight$', P('model', None)),
    (r'.*ctc_lo\.bias$', P('model')),
    (r'.*embed\.0\.weight$', P('model', None)),   # token embedding (V, d)
]


def _path_str(path) -> str:
    parts = []
    for k in path:
        if isinstance(k, jax.tree_util.DictKey):
            parts.append(str(k.key))
        elif isinstance(k, jax.tree_util.SequenceKey):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return '.'.join(parts)


def param_pspec(path, leaf, rules=TP_RULES) -> P:
    s = _path_str(path)
    for pat, spec in rules:
        if re.match(pat, s):
            # drop trailing axes the leaf doesn't have
            ndim = np.ndim(leaf)
            spec_t = tuple(spec)
            if len(spec_t) > ndim:
                spec_t = spec_t[:ndim]
            return P(*spec_t)
    return P()


def param_shardings(params, mesh: Mesh, rules=TP_RULES,
                    zero3: bool = False, zero3_min_size: int = 65536):
    """Pytree of NamedShardings for the param tree (TP over 'model';
    replicated over 'data' by default).

    zero3=True is the DeepSpeed ZeRO-3 equivalent (train_utils.py:372-391,
    435-455 reach stage 3 via deepspeed config): every large-enough param
    additionally shards its first free divisible axis over 'data', so each
    device STORES 1/data_size of the weights; XLA inserts all-gathers at
    use sites (gather-on-use) and the updated params come back sharded.
    Small leaves (< zero3_min_size elements: biases, norms) stay replicated
    — gathering them costs more latency than their memory is worth.
    """
    data_size = mesh.shape['data']

    def one(path, leaf):
        spec = list(param_pspec(path, leaf, rules))
        ndim = np.ndim(leaf)
        while len(spec) < ndim:
            spec.append(None)
        if zero3 and np.size(leaf) >= zero3_min_size:
            for ax in range(ndim):
                if spec[ax] is None and leaf.shape[ax] % data_size == 0 \
                        and leaf.shape[ax] >= data_size:
                    spec[ax] = 'data'
                    break
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(one, params)


def opt_state_shardings(opt_state, params, mesh: Mesh, zero: bool = True,
                        rules=TP_RULES):
    """Shardings for optax optimizer state.

    When `zero` (ZeRO-style), adam moments additionally shard their first
    axis over 'data' where divisible — the TPU equivalent of DeepSpeed
    ZeRO-1/2 (train_utils.py:372-391).
    """
    data_size = mesh.shape['data']

    def leaf_sharding(path, leaf):
        if not hasattr(leaf, 'ndim') or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        spec = list(param_pspec(path, leaf, rules))
        while len(spec) < leaf.ndim:
            spec.append(None)
        if zero:
            for ax in range(leaf.ndim):
                if spec[ax] is None and leaf.shape[ax] % data_size == 0 and \
                        leaf.shape[ax] >= data_size:
                    spec[ax] = 'data'
                    break
        return NamedSharding(mesh, P(*spec))

    # moments mirror the param tree structure inside the optax state
    def map_state(state):
        return jax.tree_util.tree_map_with_path(leaf_sharding, state)

    return map_state(opt_state)


def batch_shardings(batch, mesh: Mesh, local_divisor: Optional[int] = None):
    """Shard the leading batch dim of every batch leaf over 'data'
    (replicate leaves whose dim 0 doesn't divide, e.g. a batch-level
    cat_embs vector). `local_divisor` overrides the divisibility check for
    per-process local slices (data_size // process_count)."""
    div = local_divisor or mesh.shape['data']

    def leaf(x):
        if hasattr(x, 'ndim') and x.ndim >= 1 and x.shape[0] % div == 0:
            return NamedSharding(mesh, P('data', *([None] * (x.ndim - 1))))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map(leaf, batch)


def put_batch(batch, mesh: Optional[Mesh]):
    """Place a host batch onto the mesh as globally-sharded arrays.

    Single-process: device_put with the 'data'-sharded layout (the SPMD
    equivalent of DDP's per-rank batches). Multi-process (after
    jax.distributed.initialize): each process passes its PER-PROCESS slice
    of the global batch and `jax.make_array_from_process_local_data`
    assembles the global array — the glue the reference gets from
    DDP/DistributedSampler (utils/train_utils.py:199-212, 301-349). All
    processes must supply equal local shapes (pad to static shapes, as the
    static/bucket batchers do).
    """
    if mesh is None:
        return jax.tree_util.tree_map(jax.numpy.asarray, batch)
    nproc = jax.process_count()
    if nproc > 1:
        shards = batch_shardings(batch, mesh,
                                 local_divisor=max(
                                     mesh.shape['data'] // nproc, 1))
        return jax.tree_util.tree_map(
            lambda v, s: jax.make_array_from_process_local_data(
                s, np.asarray(v)), batch, shards)
    shards = batch_shardings(batch, mesh)
    return jax.tree_util.tree_map(
        lambda v, s: jax.device_put(jax.numpy.asarray(v), s), batch, shards)
