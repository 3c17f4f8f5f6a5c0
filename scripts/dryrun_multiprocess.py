"""Two-process CPU dryrun of the multi-host SPMD path (VERDICT r3 item 3).

Validates that the framework's multi-process runtime shape — per-process
shards assembled into global arrays (``parallel.mesh.put_sharded`` via
``jax.make_array_from_process_local_data``), replicated state
(``put_replicated``), cross-host fetches (``fetch_global``) — executes a
REAL eval step and train steps over ``jax.distributed`` and produces
results identical to the same mesh run in one process.

Modes:
  (parent)   python scripts/dryrun_multiprocess.py
      runs the single-process reference (one 8-device CPU mesh), spawns
      two children (4 local devices each, Gloo collectives), compares,
      prints PASS/FAIL and exits nonzero on mismatch.
  (child)    ... --child PID --coord HOST:PORT --out OUT.json

The reference has nothing distributed (SURVEY.md §2); this is the
TPU-native pod story's single-program convention: every process runs
this same file, feeds its own batch shard, and holds identical
replicated state.

Needs PYTHONPATH=/root/repo:/root/.axon_site (CLAUDE.md).
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

BATCH_GLOBAL = 16
HW = 64
STEPS = 2
TINY_ENC = (4, 6, 8, 10, 12, 14, 16, 16, 16, 16, 16, 16, 20, 24)
TINY_DEC = (18, 14, 10, 6, 4)


def _setup_jax(local_devices: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def _global_batch():
    import numpy as np

    rng = np.random.RandomState(0)
    rgb = rng.rand(BATCH_GLOBAL, HW, HW, 3).astype(np.float32)
    depth = (rng.rand(BATCH_GLOBAL, HW, HW, 1) * 9 + 0.5).astype(np.float32)
    return rgb, depth


def compute(jax, local_slice):
    """Eval metric stack + STEPS train steps + post-train param checksum
    over the current (possibly multi-process) device set.  ``local_slice``
    selects THIS process's rows of the global batch (the whole batch in
    single-process mode)."""
    import numpy as np

    from fastdepth_tpu.config import ModelConfig, TrainConfig
    from fastdepth_tpu.engine.evaluator import Evaluator
    from fastdepth_tpu.models import build
    from fastdepth_tpu.parallel import mesh as mesh_lib
    from fastdepth_tpu.train import Trainer

    cfg = ModelConfig(encoder_channels=TINY_ENC, decoder_channels=TINY_DEC)
    model = build(cfg)
    params = model.init(jax.random.PRNGKey(0))  # identical on every host
    mesh = mesh_lib.make_mesh(8)  # global devices, both modes

    rgb, depth = _global_batch()
    rgb_l, depth_l = rgb[local_slice], depth[local_slice]

    ev = Evaluator(model, params, batch_size=BATCH_GLOBAL, mesh=mesh)
    _, metric_stack = ev(ev.put(rgb_l), ev.put(depth_l))
    metrics = mesh_lib.fetch_global(metric_stack)

    trainer = Trainer(model, params, TrainConfig(lr=0.01), mesh=mesh)
    lr = 0.01
    import jax.numpy as jnp

    losses = []
    for _ in range(STEPS):
        rgb_d = mesh_lib.put_sharded(rgb_l, mesh)
        depth_d = mesh_lib.put_sharded(depth_l, mesh)
        trainer.state, loss = trainer._step(
            trainer.state, rgb_d, depth_d, jnp.float32(lr))
        losses.append(float(mesh_lib.fetch_global(loss)))
    checksum = float(sum(
        np.float64(np.abs(mesh_lib.fetch_global(leaf)).sum())
        for leaf in jax.tree.leaves(trainer.state.params)))
    return {
        "metrics": np.asarray(metrics).tolist(),
        "losses": losses,
        "param_checksum": checksum,
        "n_devices": len(jax.devices()),
        "n_processes": jax.process_count(),
    }


def child(args):
    jax = _setup_jax(local_devices=4)
    jax.distributed.initialize(args.coord, num_processes=2,
                               process_id=args.child)
    half = BATCH_GLOBAL // 2
    out = compute(jax, slice(args.child * half, (args.child + 1) * half))
    if args.child == 0:
        with open(args.out, "w") as f:
            json.dump(out, f)
            f.write("\n")
    print(f"child {args.child} done", flush=True)


def parent():
    import numpy as np

    # single-process reference: same 8-device mesh, whole batch
    jax = _setup_jax(local_devices=8)
    ref = compute(jax, slice(None))
    assert ref["n_processes"] == 1 and ref["n_devices"] == 8

    port = 29876
    out = os.path.join(tempfile.mkdtemp(prefix="fd_mp_"), "p0.json")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children set their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child", str(pid),
             "--coord", f"localhost:{port}", "--out", out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    logs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for pid, p in enumerate(procs):
        if p.returncode != 0:
            print(logs[pid])
            print(f"FAIL: child {pid} exited {p.returncode}")
            return 1
    with open(out) as f:
        got = json.load(f)

    ok = got["n_processes"] == 2 and got["n_devices"] == 8
    # eval math is identical per shard -> metric stack matches tightly
    # (equal_nan: a random-init model predicts negatives, so lg10/iMAE
    # fields are NaN in BOTH runs at the same positions); train grads
    # cross Gloo all-reduce (association may differ from the single-
    # process reduction) -> small float tolerance
    m_ref = np.asarray(ref["metrics"])
    m_got = np.asarray(got["metrics"])
    ok &= m_ref.shape == m_got.shape and bool(
        np.allclose(m_ref, m_got, rtol=1e-5, atol=1e-6, equal_nan=True))
    ok &= bool(np.array_equal(np.isnan(m_ref), np.isnan(m_got)))
    # step-2 loss compounds the reduction-association diff through the
    # step-1 param update (measured 1.5e-5 relative on this config)
    ok &= bool(np.allclose(ref["losses"], got["losses"], rtol=1e-4))
    ok &= abs(ref["param_checksum"] - got["param_checksum"]) <= (
        1e-4 * max(1.0, abs(ref["param_checksum"])))
    finite = np.isfinite(m_ref) & np.isfinite(m_got)
    report = {
        "ok": bool(ok),
        "ref": {k: ref[k] for k in ("losses", "param_checksum", "n_devices",
                                    "n_processes")},
        "multiprocess": {k: got[k] for k in ("losses", "param_checksum",
                                             "n_devices", "n_processes")},
        "metric_stack_max_abs_diff": float(
            np.abs(m_ref[finite] - m_got[finite]).max()),
        "metric_nan_positions_equal": bool(
            np.array_equal(np.isnan(m_ref), np.isnan(m_got))),
    }
    print(json.dumps(report, indent=1))
    return 0 if ok else 1


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--child", type=int, default=None)
    p.add_argument("--coord", default="localhost:29876")
    p.add_argument("--out", default="/tmp/fd_mp_p0.json")
    a = p.parse_args()
    sys.exit(child(a) or 0 if a.child is not None else parent())
