"""Multi-process (multi-host SPMD) readiness — public CLI surface.

The heavyweight check is scripts/dryrun_multiprocess.py: two REAL
``jax.distributed`` processes (4 CPU devices each, Gloo collectives)
run the SHIPPED commands — ``cli.train --coord ... --num-processes 2
--process-id K`` through epochs/checkpoints/validate, then
``cli.evaluate`` over the trained checkpoint — and every artifact
(train/test CSVs, checkpoints, eval CSV) must match the identical
single-process run.  It runs in subprocesses because jax.distributed
cannot initialize inside this already-initialized test session.

The light tests cover the single-process behavior of the multi-process
plumbing (fetch_global, put_* fall-through, BatchLoader sharding,
distributed-flag validation) on the 8-device test mesh.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdepth_tpu.parallel import mesh as mesh_lib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fetch_global_single_process_is_plain_fetch(rng):
    mesh = mesh_lib.make_mesh(8)
    x = rng.rand(16, 4).astype(np.float32)
    sharded = mesh_lib.put_sharded(x, mesh, axis_name=mesh_lib.DATA_AXIS)
    np.testing.assert_array_equal(mesh_lib.fetch_global(sharded), x)
    repl = mesh_lib.put_replicated({"a": x}, mesh)
    np.testing.assert_array_equal(mesh_lib.fetch_global(repl["a"]), x)
    # plain host/np inputs pass through
    np.testing.assert_array_equal(mesh_lib.fetch_global(x), x)
    np.testing.assert_array_equal(
        mesh_lib.fetch_global(jnp.asarray(x)), x)


@pytest.mark.slow
def test_two_process_dryrun_matches_single_process():
    """scripts/dryrun_multiprocess.py end-to-end over the PUBLIC CLI:
    2-process cli.train + cli.evaluate artifacts (train/test CSVs,
    checkpoints, eval CSV) match the single-process 8-device run."""
    env = dict(os.environ)
    # the script manages its own platform/device-count flags; the test
    # session's 8-virtual-device XLA_FLAGS must not leak into children
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p])
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "dryrun_multiprocess.py")],
        env=env, capture_output=True, text=True, timeout=2500)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    report = json.loads(proc.stdout[proc.stdout.index("{"):])
    assert report["ok"] is True
    assert report["checks"]["train_loss_ok"]
    assert report["checks"]["val_metrics_ok"]
    assert report["checks"]["eval_cli_ok"]
    assert report["checks"]["best_config_equal"]


def test_committed_dryrun_report_is_green():
    """The committed artifact (docs/multiprocess_dryrun_r5.json) must be
    the passing output of the current script protocol — a stale or red
    report would misrepresent the multi-process story."""
    path = os.path.join(REPO, "docs", "multiprocess_dryrun_r5.json")
    with open(path) as f:
        report = json.load(f)
    assert report["ok"] is True
    assert "cli.train" in report["surface"] or "public CLI" in report["surface"]
    for k in ("train_loss_ok", "val_metrics_ok", "eval_cli_ok"):
        assert report["checks"][k] is True, k


def test_batchloader_shards_reassemble_global_batches(rng):
    """Contiguous per-shard rows: concatenating the two shards' batches
    reproduces the unsharded loader's batches exactly, counts stay
    GLOBAL, and epoch-seeded shuffles agree across shards (the resume
    contract under multi-process)."""
    from fastdepth_tpu.data.loader import BatchLoader

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return (np.full((4, 4, 3), i, np.float32),
                    np.full((4, 4, 1), i, np.float32))

    ds = DS()
    kw = dict(batch_size=4, num_workers=2, pad_last=True, shuffle=True,
              seed=7)
    ref = BatchLoader(ds, **kw)
    shards = [BatchLoader(ds, num_shards=2, shard_id=p, **kw)
              for p in (0, 1)]
    for ld in (ref, *shards):
        ld.set_epoch(3)
    got = [list(ld) for ld in shards]
    for k, (r_rgb, r_dep, r_cnt) in enumerate(ref):
        assert got[0][k][2] == got[1][k][2] == r_cnt  # global count
        np.testing.assert_array_equal(
            np.concatenate([got[0][k][0], got[1][k][0]]), r_rgb)
        np.testing.assert_array_equal(
            np.concatenate([got[0][k][1], got[1][k][1]]), r_dep)


def test_batchloader_shard_validation():
    from fastdepth_tpu.data.loader import BatchLoader

    class DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return np.zeros((2, 2, 3)), np.zeros((2, 2, 1))

    with pytest.raises(ValueError, match="divide by num_shards"):
        BatchLoader(DS(), batch_size=3, num_shards=2)
    with pytest.raises(ValueError, match="out of range"):
        BatchLoader(DS(), batch_size=4, num_shards=2, shard_id=2)
    with pytest.raises(ValueError, match="pad_last"):
        BatchLoader(DS(), batch_size=4, num_shards=2, shard_id=0,
                    pad_last=False, drop_last=False)


def test_distributed_flag_validation():
    """Bad rank configs die up-front with SystemExit, not minutes later
    inside a Gloo collective."""
    import argparse

    from fastdepth_tpu.parallel.distributed import (
        add_distributed_args,
        init_distributed,
    )

    def parse(argv):
        p = argparse.ArgumentParser()
        add_distributed_args(p)
        return p.parse_args(argv)

    # no flags -> single-process no-op
    assert init_distributed(parse([])) is False
    with pytest.raises(SystemExit, match="--coord"):
        init_distributed(parse(["--num-processes", "2", "--process-id", "0"]))
    with pytest.raises(SystemExit, match="pair"):
        init_distributed(parse(["--coord", "h:1", "--num-processes", "2"]))
    with pytest.raises(SystemExit, match="out of range"):
        init_distributed(parse(
            ["--coord", "h:1", "--num-processes", "2", "--process-id", "2"]))
    with pytest.raises(SystemExit, match=">= 2"):
        init_distributed(parse(
            ["--coord", "h:1", "--num-processes", "1", "--process-id", "0"]))
