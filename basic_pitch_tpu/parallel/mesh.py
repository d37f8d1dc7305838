"""Device mesh construction and sharding helpers.

The model family is sub-1M parameters, so the productive parallelism axes
are data parallelism (training batches) and window parallelism (inference —
the TPU-native analogue of the reference's host-side window streaming,
SURVEY §2.6). Tensor/pipeline/expert parallelism are intentionally N/A at
this scale: parameters are replicated and gradients are combined with a
single `psum` that XLA emits from the sharding annotations, riding ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices, for data/window parallelism."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def batch_sharded(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch/window) dimension across the mesh."""
    return NamedSharding(mesh, PartitionSpec(axis))


def shard_batch(mesh: Mesh, tree: object) -> object:
    """Place a pytree of arrays with their leading axis sharded on the mesh."""
    return jax.device_put(tree, batch_sharded(mesh))


def stacked_batch_sharded(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Sharding for a `train_loop.stack_batches` group: axis 0 is the step
    axis (scanned sequentially, unsharded), axis 1 the batch axis."""
    return NamedSharding(mesh, PartitionSpec(None, axis))


def shard_stacked_batch(mesh: Mesh, tree: object) -> object:
    """Place a stacked k-step batch with each micro-batch mesh-sharded."""
    return jax.device_put(tree, stacked_batch_sharded(mesh))


def replicate(mesh: Mesh, tree: object) -> object:
    """Place a pytree of arrays fully replicated on the mesh."""
    return jax.device_put(tree, replicated(mesh))
