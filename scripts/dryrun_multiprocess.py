"""Two-process CPU dryrun of the PUBLIC multi-process CLI surface
(VERDICT r4 item 2; supersedes the r4 private-plumbing dryrun that drove
``trainer._step`` directly).

Every process runs the SAME shipped commands a pod launcher would run:

    python -m fastdepth_tpu.cli.train    --coord HOST:PORT \
        --num-processes 2 --process-id K --mesh-devices 8 ...
    python -m fastdepth_tpu.cli.evaluate --coord ... -e model_best.npz ...

exercising the full public path end-to-end: sharded BatchLoader (each
rank loads its contiguous rows of every global batch) -> epochs ->
checkpoint save (primary rank) -> validate (collective metric fetch) ->
CSV artifacts — then compares every artifact against the identical
single-process run on the same 8-device CPU mesh:

* train.csv epoch losses,
* test.csv per-epoch val metrics (8 reference CSV fields),
* model_best.npz / checkpoint.npz param checksums + config,
* a separate ``cli.evaluate`` pass over the trained model_best.npz.

Tolerances are float-association only (Gloo all-reduce may associate
differently than the single-process XLA reduction; measured ~1e-5
relative on this config, same as the r4 dryrun).

Run:  PYTHONPATH=/root/repo python scripts/dryrun_multiprocess.py
Writes docs/multiprocess_dryrun_r5.json when invoked with --report.
"""

import argparse
import csv
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # the parent imports checkpoint.io for checks
    sys.path.insert(0, REPO)
PORT = 29877
EPOCHS = 2
BATCH = 8
N_TRAIN, N_VAL = 8, 4
# tiny widths that satisfy the skip-add tap constraint
# (dec[1:4] == enc[5], enc[3], enc[1]; config.py:134-147)
TINY_CFG = {
    "encoder_channels": [4, 6, 8, 10, 12, 14, 16, 16, 16, 16, 16, 16, 20, 24],
    "decoder_channels": [18, 14, 10, 6, 4],
}

METRIC_FIELDS = ["rmse", "mae", "delta1", "absrel", "lg10", "mse",
                 "delta2", "delta3"]  # test.csv minus the timing columns


def _cpu_env(local_devices: int) -> dict:
    """Child env: native CPU backend with N virtual devices (the test
    conftest's config, but via env — these are real subprocesses)."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # skip the axon PJRT register
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_devices}"
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p])
    return env


def _make_dataset(root: str) -> None:
    import h5py

    rng = np.random.RandomState(42)
    for split, n in (("train", N_TRAIN), ("val", N_VAL)):
        d = os.path.join(root, "nyudepthv2", split, "scene_a")
        os.makedirs(d)
        for i in range(n):
            # raw NYU frame dims (the pipelines are built for 480x640)
            with h5py.File(os.path.join(d, f"{i:05d}.h5"), "w") as f:
                f["rgb"] = (rng.rand(3, 480, 640) * 255).astype(np.uint8)
                f["depth"] = (rng.rand(480, 640) * 9 + 0.5).astype(np.float32)


def _train_cmd(data_root, out_dir, cfg_json):
    return [
        sys.executable, "-m", "fastdepth_tpu.cli.train",
        "--data-root", data_root, "--arch-json", cfg_json,
        "--epochs", str(EPOCHS), "--batch-size", str(BATCH),
        "--eval-batch-size", str(BATCH), "--workers", "2",
        "--mesh-devices", "8", "--print-freq", "0", "--seed", "3",
        "--output-dir", out_dir,
    ]


def _eval_cmd(data_root, ckpt, csv_path):
    return [
        sys.executable, "-m", "fastdepth_tpu.cli.evaluate",
        "--evaluate", ckpt, "--data-root", data_root,
        "--batch-size", str(BATCH), "--mesh-devices", "8",
        "--print-freq", "0", "--no-images", "--csv", csv_path,
    ]


def _dist_flags(pid: int, port: int = PORT):
    # train and eval pairs take distinct ports: the coordinator socket
    # of the first pair can linger in TIME_WAIT
    return ["--coord", f"localhost:{port}",
            "--num-processes", "2", "--process-id", str(pid)]


def _run_single(cmd, env, timeout=1200):
    p = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=timeout)
    if p.returncode != 0:
        raise RuntimeError(
            f"single-process command failed ({p.returncode}):\n"
            f"{' '.join(cmd)}\n{p.stdout}\n{p.stderr}")


def _run_pair(cmd_of_pid, env, timeout=1200):
    procs = [subprocess.Popen(cmd_of_pid(pid), env=env,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for pid in (0, 1)]
    logs = [p.communicate(timeout=timeout)[0].decode() for p in procs]
    for pid, p in enumerate(procs):
        if p.returncode != 0:
            raise RuntimeError(
                f"rank {pid} failed ({p.returncode}):\n{logs[pid]}")
    return logs


def _read_csv(path):
    with open(path) as f:
        return list(csv.DictReader(f))


def _param_checksum(npz_path: str) -> float:
    with np.load(npz_path) as d:
        return float(sum(
            np.float64(np.abs(np.asarray(d[k], np.float64)).sum())
            for k in d.files if k != "__meta__"))


def _rel_close(a, b, tol):
    return abs(a - b) <= tol * max(1.0, abs(a), abs(b))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--report", default=None,
                    help="write the JSON report here (e.g. "
                         "docs/multiprocess_dryrun_r5.json)")
    args = ap.parse_args(argv)

    work = tempfile.mkdtemp(prefix="fd_mp_cli_")
    data_root = os.path.join(work, "data")
    _make_dataset(data_root)
    cfg_json = os.path.join(work, "tiny.json")
    with open(cfg_json, "w") as f:
        json.dump(TINY_CFG, f)

    sp, mp = os.path.join(work, "sp"), os.path.join(work, "mp")

    print("== single-process reference (8-device CPU mesh) ==", flush=True)
    env8 = _cpu_env(8)
    _run_single(_train_cmd(data_root, sp, cfg_json), env8)
    _run_single(_eval_cmd(data_root, os.path.join(sp, "model_best.npz"),
                          os.path.join(sp, "eval.csv")), env8)

    print("== 2-process run (4 local CPU devices each, Gloo) ==", flush=True)
    env4 = _cpu_env(4)
    _run_pair(lambda pid: _train_cmd(data_root, mp, cfg_json)
              + _dist_flags(pid), env4)
    _run_pair(lambda pid: _eval_cmd(data_root,
                                    os.path.join(mp, "model_best.npz"),
                                    os.path.join(mp, "eval.csv"))
              + _dist_flags(pid, PORT + 2), env4)

    checks = {}

    # 1) train.csv: per-epoch mean loss
    sp_tr, mp_tr = _read_csv(os.path.join(sp, "train.csv")), _read_csv(
        os.path.join(mp, "train.csv"))
    checks["train_csv_rows"] = len(sp_tr) == len(mp_tr) == EPOCHS
    loss_diff = max(abs(float(a["loss"]) - float(b["loss"]))
                    / max(1e-9, abs(float(a["loss"])))
                    for a, b in zip(sp_tr, mp_tr))
    checks["train_loss_max_rel_diff"] = loss_diff
    checks["train_loss_ok"] = loss_diff < 1e-4

    # 2) test.csv: per-epoch val metrics (8 reference fields)
    sp_te, mp_te = _read_csv(os.path.join(sp, "test.csv")), _read_csv(
        os.path.join(mp, "test.csv"))
    checks["test_csv_rows"] = len(sp_te) == len(mp_te) == EPOCHS
    m_diff = max(
        abs(float(a[f]) - float(b[f])) / max(1e-9, abs(float(a[f])))
        for a, b in zip(sp_te, mp_te) for f in METRIC_FIELDS)
    checks["val_metrics_max_rel_diff"] = m_diff
    checks["val_metrics_ok"] = m_diff < 1e-4

    # 3) checkpoints: params + config
    for name in ("model_best.npz", "checkpoint.npz"):
        cs_sp = _param_checksum(os.path.join(sp, name))
        cs_mp = _param_checksum(os.path.join(mp, name))
        checks[f"{name}_checksum_rel_diff"] = abs(cs_sp - cs_mp) / max(
            1.0, abs(cs_sp))
        checks[f"{name}_ok"] = _rel_close(cs_sp, cs_mp, 1e-4)
    from fastdepth_tpu.checkpoint.io import load_checkpoint

    _, cfg_sp, meta_sp = load_checkpoint(os.path.join(sp, "model_best.npz"))
    _, cfg_mp, meta_mp = load_checkpoint(os.path.join(mp, "model_best.npz"))
    checks["best_config_equal"] = cfg_sp == cfg_mp
    checks["best_epoch_equal"] = meta_sp["epoch"] == meta_mp["epoch"]

    # 4) cli.evaluate over the trained best checkpoint
    ev_sp = _read_csv(os.path.join(sp, "eval.csv"))[-1]
    ev_mp = _read_csv(os.path.join(mp, "eval.csv"))[-1]
    e_diff = max(abs(float(ev_sp[f]) - float(ev_mp[f]))
                 / max(1e-9, abs(float(ev_sp[f]))) for f in METRIC_FIELDS)
    checks["eval_cli_max_rel_diff"] = e_diff
    checks["eval_cli_ok"] = e_diff < 1e-4

    ok = all(v for k, v in checks.items() if k.endswith("_ok")
             or k.endswith("_rows") or k.endswith("_equal"))
    report = {
        "ok": bool(ok),
        "surface": "public CLI (cli.train + cli.evaluate, --coord/"
                   "--num-processes/--process-id)",
        "topology": {"single": "1 process x 8 CPU devices",
                     "multi": "2 processes x 4 CPU devices, Gloo"},
        "protocol": f"{EPOCHS} epochs, global batch {BATCH}, "
                    f"{N_TRAIN} train / {N_VAL} val images, "
                    "sharded BatchLoader -> checkpoint -> validate -> "
                    "separate cli.evaluate pass",
        "checks": checks,
    }
    print(json.dumps(report, indent=1))
    if args.report:
        with open(args.report, "w") as f:
            json.dump(report, f, indent=1)
            f.write("\n")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
