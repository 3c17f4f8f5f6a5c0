"""Device-mesh utilities.

The reference has no distributed machinery at all (SURVEY.md §2
'Parallelism'); the TPU-native scaling axis for this CNN workload is the
batch: data parallelism over a 1-D ``jax.sharding.Mesh``, with XLA
emitting the ICI collectives (psum for gradient/metric reductions).
These helpers are the single place mesh/sharding policy lives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    axis_name: str = "data",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis_name,))


def shard_batch(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Batch-dim sharding for NHWC activations."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_sharded(batch, mesh: Mesh, axis_name: str = "data"):
    """Host batch -> device(s), split along dim 0."""
    return jax.device_put(batch, shard_batch(mesh, axis_name))


def put_replicated(tree, mesh: Mesh):
    return jax.device_put(tree, replicate(mesh))
