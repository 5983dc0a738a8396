"""Concrete-mesh registry for running Pallas kernels under GSPMD programs.

A `pallas_call` has no GSPMD partitioning rule, so a kernel reached inside a
jit compiled over a multi-device mesh cannot be auto-partitioned — round 2
simply handed off to the XLA formulations whenever a mesh was active
(losing the fused flash attention and the single-launch beam kernel on
every multi-chip path).  The TPU-native answer is `jax.shard_map`: split
the batch-independent kernel over the mesh's batch-like axes so each device
runs the unchanged single-chip kernel on its local shard.

`shard_map` needs the CONCRETE mesh (devices, not just axis names), which
is only known outside the traced region (`jax.sharding.get_mesh()` raises
inside jit).  Callers that build a mesh (serving `--data_parallel`, the
trainer, `__graft_entry__.dryrun_multichip`) register it here; kernel entry
points consult the registry at trace time and wrap themselves when the
shapes divide the registered axes — otherwise they fall back exactly as
before.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

from jax.sharding import Mesh

# (mesh, data_axes, model_axes) — data_axes shard batch-like leading dims,
# model_axes shard attention heads
_REGISTERED: Optional[Tuple[Mesh, Tuple[str, ...], Tuple[str, ...]]] = None


def set_pallas_mesh(mesh: Optional[Mesh],
                    data_axes: Sequence[str] = ('data',),
                    model_axes: Sequence[str] = ('model',)) -> None:
    """Register (or clear, with None) the mesh Pallas kernels shard over.
    Axis names not present in the mesh are ignored at use time."""
    global _REGISTERED
    if mesh is None:
        _REGISTERED = None
    else:
        _REGISTERED = (mesh,
                       tuple(a for a in data_axes if a in mesh.axis_names),
                       tuple(a for a in model_axes if a in mesh.axis_names))


def get_pallas_mesh():
    return _REGISTERED


def axis_size(mesh: Mesh, axes: Sequence[str]) -> int:
    return math.prod(mesh.shape[a] for a in axes) if axes else 1


def spec_entry(mesh: Mesh, axes: Sequence[str]):
    """PartitionSpec entry for one array dim sharded over `axes`, dropping
    size-1 axes (a spec naming a size-1 axis is legal but noisy)."""
    live = tuple(a for a in axes if mesh.shape[a] > 1)
    if not live:
        return None
    return live[0] if len(live) == 1 else live
