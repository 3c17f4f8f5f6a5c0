"""Device-mesh utilities — the single place mesh/sharding policy lives.

The reference has no distributed machinery at all (SURVEY.md §2
'Parallelism'); the TPU-native scaling axes for this CNN workload are

* ``data``  — batch dimension (data parallelism): gradients/metrics
  reduce via XLA psum over ICI,
* ``space`` — image-height dimension (spatial partitioning): XLA's SPMD
  partitioner inserts collective-permute halo exchanges around every
  conv window that crosses a shard boundary.  This is the axis that
  cuts single-image latency on a pod: a CNN has no sequence/attention
  dimension to tensor-shard, but its H axis divides cleanly and convs
  only need (k-1)/2 rows of halo.

  ``space`` is an INFERENCE/EVAL axis only.  The forward is exact under
  it (bit-identical at full width, tests/test_spatial.py), but
  grad-of-depthwise-conv is wrong under SPMD spatial partitioning at
  degenerate shard extents (measured in f64:
  docs/probe_r3_sp_grad.json), so the Trainer rejects meshes carrying
  this axis.

Meshes are 1-D ``('data',)`` (the default), 1-D ``('space',)`` (pure
latency sharding at batch 1), or 2-D ``('data', 'space')``.  Everything
downstream derives its NHWC PartitionSpec from the mesh's axis names via
``activation_spec`` — no other module hardcodes axis layouts.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(
    num_devices: Optional[int] = None,
    axis_name: str = DATA_AXIS,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D mesh over the first ``num_devices`` devices.  Raises when
    fewer are available (like ``make_mesh_2d``) — silently running a
    smaller topology than requested is a misconfiguration, not a
    fallback."""
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices is not None:
        if len(devs) < num_devices:
            raise ValueError(f"need {num_devices} devices for the mesh, "
                             f"have {len(devs)}")
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis_name,))


def make_mesh_2d(
    n_data: int,
    n_space: int,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """2-D ``(data, space)`` mesh: batch sharded ``n_data``-way, image
    height ``n_space``-way.  ``space`` is the minor (fast) mesh axis so
    halo exchanges ride neighbouring ICI links."""
    devs = list(devices) if devices is not None else jax.devices()
    need = n_data * n_space
    if len(devs) < need:
        raise ValueError(f"need {need} devices for a {n_data}x{n_space} mesh, "
                         f"have {len(devs)}")
    return Mesh(
        np.array(devs[:need]).reshape(n_data, n_space),
        (DATA_AXIS, SPACE_AXIS),
    )


def mesh_from_cli(n_data: Optional[int], n_space: Optional[int],
                  image_height: Optional[int] = None,
                  batch_size: Optional[int] = None) -> Optional[Mesh]:
    """Shared CLI mesh-construction rule (cli.evaluate / cli.serve):
    ``--mesh-devices N --mesh-spatial S`` -> (N or 1, S) 2-D mesh;
    N alone -> 1-D data mesh; neither -> None.  Validates divisibility
    upfront (SystemExit with the flag names) so a misconfiguration never
    reaches checkpoint loading or a low-level sharding error."""
    if n_data and batch_size is not None and batch_size % n_data:
        raise SystemExit(
            f"--batch-size {batch_size} must divide by --mesh-devices {n_data}")
    if n_space:
        if image_height is not None and image_height % n_space:
            raise SystemExit(
                f"--mesh-spatial {n_space} must divide the "
                f"{image_height}-row image height")
        return make_mesh_2d(n_data or 1, n_space)
    if n_data:
        return make_mesh(n_data)
    return None


def activation_spec(mesh: Mesh) -> P:
    """NHWC activation PartitionSpec implied by the mesh's axis names:
    batch over ``data`` (if present), height over ``space`` (if
    present).  A mesh carrying neither axis is a misconfiguration (it
    would silently replicate all work to every device), so it raises."""
    batch_ax = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
    space_ax = SPACE_AXIS if SPACE_AXIS in mesh.axis_names else None
    if batch_ax is None and space_ax is None:
        raise ValueError(
            f"mesh axes {mesh.axis_names} carry neither "
            f"'{DATA_AXIS}' nor '{SPACE_AXIS}'; sharding would silently "
            f"replicate every activation (use make_mesh / make_mesh_2d)")
    return P(batch_ax, space_ax)


def metrics_spec(mesh: Mesh) -> P:
    """(num_fields, N) per-image metric stack: fields replicated, images
    over ``data``.  With a ``space`` axis present the spec leaves it
    unmentioned — the SPMD partitioner closes the per-image spatial sums
    with an all-reduce over ``space`` automatically."""
    batch_ax = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
    return P(None, batch_ax)


def shard_activations(mesh: Mesh) -> NamedSharding:
    """Sharding for NHWC activations per the mesh policy."""
    return NamedSharding(mesh, activation_spec(mesh))


def shard_batch(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Batch-dim-only sharding for NHWC activations (1-D mesh helper;
    for policy-driven placement on any mesh use ``shard_activations``).
    Raises if ``axis_name`` is not a mesh axis — a missing axis means a
    misconfigured mesh, not a request for replication."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_sharded(batch, mesh: Mesh, axis_name: Optional[str] = None):
    """Host batch -> device(s) per the mesh policy (batch over ``data``,
    height over ``space``).  ``axis_name`` forces batch-only sharding on
    that axis (back-compat for 1-D call sites).

    Multi-process (``jax.process_count() > 1``, multi-host SPMD over a
    pod): ``batch`` is this PROCESS'S shard — each process feeds its
    local portion and the pieces assemble into one global array
    (``jax.make_array_from_process_local_data``; the global batch is
    ``local * n_processes`` along the sharded axis).  Single-process
    callers are unchanged: ``batch`` is the whole (global) batch."""
    sharding = (shard_batch(mesh, axis_name) if axis_name is not None
                else shard_activations(mesh))
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, batch)
    return jax.device_put(batch, sharding)


def put_replicated(tree, mesh: Mesh):
    """Replicate a (host-identical) pytree to every mesh device.  In
    multi-process mode every process must pass the SAME host values
    (params/state are deterministic or checkpoint-loaded on all hosts —
    the jax.distributed single-program convention)."""
    if jax.process_count() > 1:
        sharding = replicate(mesh)
        # fetch_global, not np.asarray: a leaf may ALREADY be a global
        # array (e.g. re-replicating a trained param tree for an
        # Evaluator), and np.asarray raises on non-addressable shards
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(
                sharding, fetch_global(a)),
            tree,
        )
    return jax.device_put(tree, replicate(mesh))


def fetch_global(x) -> np.ndarray:
    """Device array -> host numpy of the GLOBAL value, on every process.

    Single-process (or fully-addressable / fully-replicated arrays):
    one plain fetch.  Multi-process sharded arrays are not fully
    addressable — each host holds only its shards — so the global view
    is assembled with an all-gather over the processes
    (jax.experimental.multihost_utils.process_allgather), which is how
    e.g. the Evaluator's per-image metric stack reaches the report on a
    pod."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    if x.sharding.is_fully_replicated:
        # every process already holds a complete replica — no collective
        return np.asarray(x.addressable_data(0))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
