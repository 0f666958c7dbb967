"""Mesh construction and sharding helpers.

TPU-native replacement for the reference's process-group setup
(ref examples/evaluate_copy_detection.py:117-150 ``init_distributed_mode``):
instead of NCCL rank/world-size plumbing, build a `jax.sharding.Mesh` once
and annotate shardings; gradient/metric reduction and feature gathering
become XLA collectives over ICI.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "local_mesh", "batch_sharding", "replicated", "shard_batch"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    axis_shapes: Sequence[int] | None = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a mesh over ``devices`` (default: all).

    With the default single ``data`` axis this reproduces the reference's DDP
    topology (SURVEY.md §2.5); pass e.g. ``axis_shapes=(4, 2),
    axis_names=('data', 'model')`` for hybrid layouts.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if axis_shapes is None:
        axis_shapes = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(axis_shapes), axis_names)


def local_mesh(max_devices: int | None = None) -> Mesh:
    """Single-axis data mesh over (a prefix of) the local devices."""
    devs = jax.devices()
    if max_devices is not None:
        devs = devs[:max_devices]
    return make_mesh(devices=devs)


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, optimizer state under DP)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Place a host batch (pytree of arrays) sharded over the data axis."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
