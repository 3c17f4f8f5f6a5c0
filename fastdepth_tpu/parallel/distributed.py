"""Multi-process (multi-host SPMD) runtime wiring for the public CLIs.

The reference is strictly single-host (SURVEY.md §2 'Parallelism'); the
TPU-native pod story is JAX's single-program convention: every process
runs the SAME command, ``jax.distributed.initialize`` links them through
a coordinator, and each process feeds its own shard of every global
batch (``BatchLoader(num_shards=, shard_id=)``) while holding identical
replicated state.  This module is the one place the CLI flag surface for
that lives:

    python -m fastdepth_tpu.cli.train --coord HOST:PORT \
        --num-processes N --process-id K ...

or via environment auto-detect (``FDTPU_COORD`` / ``FDTPU_NUM_PROCESSES``
/ ``FDTPU_PROCESS_ID``), so launchers can template one command for all
ranks.  On real multi-host TPU pods JAX can usually infer everything, so
``--coord`` alone (or even none of the flags, relying on the TPU
metadata server) also works; the explicit triple is what CPU/Gloo
dryruns and generic clusters need.
"""

from __future__ import annotations

import os
from typing import Optional


def add_distributed_args(parser) -> None:
    """Install the multi-process flags on an argparse parser (shared by
    cli.train / cli.evaluate).  Defaults come from the FDTPU_* env vars
    so a launcher can export once and run the same command per rank."""
    g = parser.add_argument_group(
        "distributed", "multi-process SPMD (every process runs this same "
        "command; batches shard per process, state replicates)")
    g.add_argument(
        "--coord", default=os.environ.get("FDTPU_COORD"),
        metavar="HOST:PORT",
        help="jax.distributed coordinator address; presence (flag or "
             "FDTPU_COORD) turns multi-process mode on")
    g.add_argument(
        "--num-processes", type=int, metavar="N",
        default=int(os.environ["FDTPU_NUM_PROCESSES"])
        if os.environ.get("FDTPU_NUM_PROCESSES") else None,
        help="total process count (FDTPU_NUM_PROCESSES)")
    g.add_argument(
        "--process-id", type=int, metavar="K",
        default=int(os.environ["FDTPU_PROCESS_ID"])
        if os.environ.get("FDTPU_PROCESS_ID") else None,
        help="this process's rank in [0, N) (FDTPU_PROCESS_ID)")


def init_distributed(args) -> bool:
    """Wire ``jax.distributed`` from the parsed CLI args; returns True
    when multi-process mode engaged.  Must run before any other jax use
    (device enumeration binds the backend).  Validation is up-front
    SystemExit — a bad rank otherwise dies minutes later inside a
    collective with an opaque Gloo/ICI error."""
    coord = getattr(args, "coord", None)
    n = getattr(args, "num_processes", None)
    pid = getattr(args, "process_id", None)
    if coord is None and n is None and pid is None:
        return False
    if coord is None:
        raise SystemExit(
            "--num-processes/--process-id need --coord HOST:PORT "
            "(or FDTPU_COORD)")
    if (n is None) != (pid is None):
        raise SystemExit(
            "--num-processes and --process-id come as a pair "
            "(both, or neither for TPU-pod auto-detection)")
    if n is not None:
        if not 0 <= pid < n:
            raise SystemExit(
                f"--process-id {pid} out of range for "
                f"--num-processes {n}")
        if n < 2:
            raise SystemExit(
                f"--num-processes {n}: multi-process mode needs >= 2 "
                "(drop the distributed flags to run single-process)")
    import jax

    jax.distributed.initialize(
        coordinator_address=coord, num_processes=n, process_id=pid)
    _warmup_collective()
    return True


def _warmup_collective() -> None:
    """Establish the cross-process collective context NOW, while every
    rank is still within milliseconds of the coordinator barrier it just
    cleared.  The full-mesh connect inside the FIRST collective has a
    hard ~30 s key-exchange window (Gloo on CPU; jax exposes no knob —
    ``make_gloo_tcp_collectives`` takes none); if that first collective
    instead runs after minutes of compilation, a rank whose compile was
    faster (cache hit, scheduler luck on a loaded host) times out
    waiting for the slow one's keys.  One trivial allgather here pins
    context creation to this synchronized point; the runtime caches the
    clique, so the real collectives later reuse the connected context.
    Measured failure mode: tests/test_multiprocess.py under a loaded
    single-core host — 'Gloo context initialization failed:
    DEADLINE_EXCEEDED: GetKeyValue() timed out ... 29.99s'."""
    import numpy as np
    from jax.experimental import multihost_utils

    multihost_utils.process_allgather(np.zeros((), np.float32))


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_primary() -> bool:
    """True on the rank that owns the side effects (prints, CSV,
    checkpoints, comparison PNGs).  All ranks run the same collectives;
    only the primary writes."""
    return process_index() == 0


def shard_kwargs() -> dict:
    """BatchLoader kwargs for this process's shard of every global batch
    (identity in single-process mode)."""
    return {"num_shards": process_count(), "shard_id": process_index()}


def validate_distributed_batches(distributed: bool, mesh_devices,
                                 **batch_sizes) -> None:
    """Shared CLI-arg validation for multi-process runs, raising
    SystemExit BEFORE any checkpoint/data/device work (a non-divisor
    would otherwise surface as a low-level sharding error on batch 1).
    One source for both cli.train and cli.evaluate so the rules cannot
    drift: multi-process mode requires an explicit global mesh, and
    every batch size must divide by the process count (each process
    feeds an equal shard of each global batch).

    ``batch_sizes``: flag-name -> value pairs, e.g.
    ``validate_distributed_batches(dist, args.mesh_devices,
    **{"--batch-size": args.batch_size})``."""
    if distributed and not mesh_devices:
        raise SystemExit(
            "multi-process mode needs --mesh-devices (the GLOBAL device "
            "count across all processes): the mesh is what ties the "
            "per-process batch shards into one SPMD step")
    n_proc = process_count()
    for flag, value in batch_sizes.items():
        if value % n_proc:
            raise SystemExit(
                f"{flag} {value} must divide by the process count "
                f"{n_proc}: every process feeds an equal shard of each "
                "global batch")
