"""Deploy runner, visualizer, and training CLI tests (reference
deploy/tx2_run_tvm.py + deploy/data/visualize.py + the training harness).

The deploy test runs a golden-file round trip against the REFERENCE's own
deploy/data/rgb.npy input (reference deploy/data/)."""

import os

import h5py
import numpy as np
import pytest
import torch

import jax

from torch_oracle import TorchFastDepth, randomize_bn_stats

TINY_ENC = (4, 6, 8, 10, 12, 14, 16, 16, 16, 16, 16, 16, 20, 24)
TINY_DEC = (18, 14, 10, 6, 4)
REF_RGB = "/root/reference/deploy/data/rgb.npy"


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    gen = torch.Generator().manual_seed(0)
    tm = TorchFastDepth(TINY_ENC, TINY_DEC, skip="add").eval()
    randomize_bn_stats(tm, gen)
    path = tmp_path_factory.mktemp("ck") / "m.pth.tar"
    torch.save({"epoch": 1, "best_result": None, "model": tm}, path)
    return str(path)


@pytest.mark.skipif(not os.path.exists(REF_RGB), reason="reference golden data absent")
def test_deploy_runner_golden_roundtrip(tiny_ckpt, tmp_path, capsys):
    from fastdepth_tpu.cli import deploy

    out_fp = str(tmp_path / "pred.npy")
    deploy.main([
        "--model", tiny_ckpt,
        "--input-fp", REF_RGB,
        "--output-fp", out_fp,
        "--warmup", "1", "--run", "3",
        "--randomized-input-timing",
    ])
    pred = np.load(out_fp)
    assert pred.shape == (1, 1, 224, 224)  # NCHW like the reference's pred.npy
    assert np.all(np.isfinite(pred)) and pred.min() >= 0
    out = capsys.readouterr().out
    assert "[timed]" in out and "[randomized]" in out


def test_deploy_runner_bundle_roundtrip(tiny_ckpt, tmp_path, capsys):
    """--save-bundle then --load-bundle: the prebuilt-artifact flow the
    reference runner uses (tx2_run_tvm.py:13-26), prediction-identical
    to the compile-from-checkpoint run."""
    from fastdepth_tpu.cli import deploy

    rgb = np.random.RandomState(0).rand(224, 224, 3).astype(np.float32)
    in_fp = str(tmp_path / "rgb.npy")
    np.save(in_fp, rgb)
    pred_a = str(tmp_path / "pred_a.npy")
    prefix = str(tmp_path / "bundle")
    deploy.main([
        "--model", tiny_ckpt, "--input-fp", in_fp, "--output-fp", pred_a,
        "--warmup", "1", "--run", "2", "--save-bundle", prefix,
    ])
    pred_b = str(tmp_path / "pred_b.npy")
    deploy.main([
        "--load-bundle", prefix, "--input-fp", in_fp, "--output-fp", pred_b,
        "--warmup", "1", "--run", "2",
    ])
    np.testing.assert_array_equal(np.load(pred_a), np.load(pred_b))
    assert "loading bundle" in capsys.readouterr().out

    with pytest.raises(SystemExit):  # precision is baked into the bundle
        deploy.main(["--load-bundle", prefix, "--input-fp", in_fp, "--bf16"])

    # shape mismatch fails with the friendly up-front message, not a
    # jax.export trace
    small = str(tmp_path / "small.npy")
    np.save(small, np.zeros((64, 64, 3), np.float32))
    with pytest.raises(SystemExit, match="bundle expects input"):
        deploy.main(["--load-bundle", prefix, "--input-fp", small])


def test_deploy_input_layouts(tmp_path):
    from fastdepth_tpu.cli.deploy import load_input

    hwc = np.random.rand(16, 16, 3).astype(np.float32)
    chw = np.transpose(hwc, (2, 0, 1))
    p1, p2 = str(tmp_path / "a.npy"), str(tmp_path / "b.npy")
    np.save(p1, hwc)
    np.save(p2, chw[None])
    np.testing.assert_array_equal(load_input(p1), load_input(p2))


def test_visualizer_writes_pngs(tmp_path):
    from fastdepth_tpu.cli import visualize

    rgb = np.random.rand(20, 20, 3).astype(np.float32)
    depth = np.random.rand(20, 20).astype(np.float32) + 0.5
    np.save(tmp_path / "rgb.npy", rgb)
    np.save(tmp_path / "depth.npy", depth)
    visualize.main([
        "--rgb", str(tmp_path / "rgb.npy"),
        "--depth", str(tmp_path / "depth.npy"),
        "--out-dir", str(tmp_path / "out"),
    ])
    assert (tmp_path / "out" / "rgb.png").exists()
    assert (tmp_path / "out" / "depth.png").exists()


def _make_nyu_tree(root, rng, n=4):
    d = os.path.join(root, "scene_x")
    os.makedirs(d, exist_ok=True)
    for i in range(2, 2 + n):
        with h5py.File(os.path.join(d, f"{i:05d}.h5"), "w") as f:
            f["rgb"] = (rng.rand(3, 480, 640) * 255).astype(np.uint8)
            f["depth"] = (rng.rand(480, 640) * 9 + 0.5).astype(np.float32)


def test_train_cli_one_epoch(tmp_path, monkeypatch, rng, capsys):
    """One full epoch of the training CLI on a synthetic dataset with a
    tiny model: loss logged, checkpoints written, best tracked.  Runs
    with --bf16 AND --accum-steps 2 so the mixed-precision and
    gradient-accumulation wiring are proven at the CLI level
    (the fp32 CLI path is covered by the resume test below)."""
    from fastdepth_tpu.cli import train as train_cli
    from fastdepth_tpu.config import ModelConfig
    from fastdepth_tpu.models import build

    root = tmp_path / "nyudepthv2"
    _make_nyu_tree(str(root / "train"), rng, n=4)
    _make_nyu_tree(str(root / "val"), rng, n=2)

    tiny_cfg = ModelConfig(encoder_channels=TINY_ENC, decoder_channels=TINY_DEC)
    monkeypatch.setattr(train_cli, "parse_args",
                        lambda argv=None: _args(tmp_path, bf16=True,
                                                accum_steps=2))
    import fastdepth_tpu.models as models_pkg

    monkeypatch.setattr(models_pkg, "from_name", lambda name: build(tiny_cfg))

    best = train_cli.main([])
    out_dir = tmp_path / "out"
    assert (out_dir / "model_best.npz").exists()
    assert (out_dir / "checkpoint.npz").exists()
    assert (out_dir / "train.csv").exists()
    assert (out_dir / "test.csv").exists()
    assert best.rmse < float("inf")
    assert "train loss" in capsys.readouterr().out


def _args(tmp_path, **over):
    import argparse

    ns = argparse.Namespace(
        data="nyudepthv2", data_root=str(tmp_path),
        arch="mobilenet-nnconv5dw-skipadd", pretrained_encoder=None,
        epochs=1, batch_size=2, lr=0.01, momentum=0.9, weight_decay=1e-4,
        lr_decay_step=5, lr_decay_gamma=0.2, workers=2, print_freq=1,
        seed=0, mesh_devices=None, remat=False, bf16=False, accum_steps=1,
        output_dir=str(tmp_path / "out"),
        eval_batch_size=2, resume=None, arch_json=None, device_augment=False,
        coord=None, num_processes=None, process_id=None,
    )
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


def test_train_cli_resume(tmp_path, monkeypatch, rng, capsys):
    """--resume continues from checkpoint.npz: starts at the saved
    epoch + 1, restores best tracking, and the arch comes from the
    checkpoint config (no from_name needed on the resume path)."""
    from fastdepth_tpu.cli import train as train_cli
    from fastdepth_tpu.config import ModelConfig
    from fastdepth_tpu.models import build

    root = tmp_path / "nyudepthv2"
    _make_nyu_tree(str(root / "train"), rng, n=4)
    _make_nyu_tree(str(root / "val"), rng, n=2)

    tiny_cfg = ModelConfig(encoder_channels=TINY_ENC, decoder_channels=TINY_DEC)
    monkeypatch.setattr(train_cli, "parse_args", lambda argv=None: _args(tmp_path))
    import fastdepth_tpu.models as models_pkg

    monkeypatch.setattr(models_pkg, "from_name", lambda name: build(tiny_cfg))
    train_cli.main([])  # epoch 0
    capsys.readouterr()

    ckpt = str(tmp_path / "out" / "checkpoint.npz")
    monkeypatch.setattr(
        train_cli, "parse_args",
        lambda argv=None: _args(tmp_path, epochs=2, resume=ckpt),
    )
    best = train_cli.main([])
    out = capsys.readouterr().out
    assert "resumed at epoch 1" in out
    assert "epoch 1: train loss" in out
    assert "epoch 0: train loss" not in out  # did NOT redo epoch 0
    assert best.rmse < float("inf")


def test_pretrained_encoder_loading(tmp_path):
    """ImageNet torch checkpoint -> encoder weights injected into a depth
    model (reference models.py:659-670)."""
    from torch_oracle import TorchMobileNetClassifier

    gen = torch.Generator().manual_seed(5)
    tm = TorchMobileNetClassifier(TINY_ENC, classes=10, pool=2).eval()
    randomize_bn_stats(tm, gen)
    # DataParallel-style prefix, like the real ImageNet ckpt
    # (imagenet/mobilenet.py:72-75)
    sd = {"module." + k: v for k, v in tm.state_dict().items()}
    path = str(tmp_path / "imagenet.pth.tar")
    torch.save({"epoch": 9, "best_prec1": 70.0, "state_dict": sd}, path)

    from fastdepth_tpu.cli.train import load_pretrained_encoder

    enc = load_pretrained_encoder(path)
    assert enc["conv0"]["w"].shape == (3, 3, 3, TINY_ENC[0])
    assert enc["conv13"]["pw"]["w"].shape == (1, 1, TINY_ENC[12], TINY_ENC[13])


def test_streaming_benchmark_cli(tmp_path, rng, capsys):
    """End-to-end streaming benchmark over a synthetic tree (tiny model
    monkeypatched in via the checkpoint path)."""
    import json as _json

    import torch

    from fastdepth_tpu.cli import benchmark as bench_cli

    gen = torch.Generator().manual_seed(2)
    tm = TorchFastDepth(TINY_ENC, TINY_DEC, skip="add").eval()
    randomize_bn_stats(tm, gen)
    ckpt = str(tmp_path / "m.pth.tar")
    torch.save({"epoch": 0, "best_result": None, "model": tm}, ckpt)

    root = tmp_path / "nyudepthv2" / "val"
    _make_nyu_tree(str(root), rng, n=6)

    result = bench_cli.main([
        "--evaluate", ckpt,
        "--data-root", str(tmp_path),
        "--batch-size", "3",
        "--json",
    ])
    assert result["frames"] == 6
    assert result["fps"] > 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert _json.loads(out)["frames"] == 6


def test_streaming_benchmark_cli_train_mode(tmp_path, rng, capsys):
    """--train drives loader -> augmentations -> Trainer step end to end
    and reports train-fps (tiny model via the checkpoint path)."""
    import json as _json

    import torch

    from fastdepth_tpu.cli import benchmark as bench_cli

    gen = torch.Generator().manual_seed(3)
    tm = TorchFastDepth(TINY_ENC, TINY_DEC, skip="add").eval()
    randomize_bn_stats(tm, gen)
    ckpt = str(tmp_path / "m.pth.tar")
    torch.save({"epoch": 0, "best_result": None, "model": tm}, ckpt)

    root = tmp_path / "nyudepthv2" / "train"
    _make_nyu_tree(str(root), rng, n=5)

    result = bench_cli.main([
        "--evaluate", ckpt,
        "--data-root", str(tmp_path),
        "--batch-size", "2",
        "--train",
        "--json",
    ])
    assert result["frames"] == 4  # drop_last: 5 items -> 2 full batches
    assert result["fps"] > 0
    assert np.isfinite(result["final_loss"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert _json.loads(out)["metric"].startswith("end-to-end streaming TRAIN")


def test_streaming_benchmark_cli_train_device_augment(tmp_path, rng, capsys):
    """--train --device-augment drives the public surface end to end:
    loader ships raw frames + gather maps + jitter grids, the Trainer
    runs the gather-free LUT augment inside the jitted step (the
    lut_impl='dot' default), and the CLI reports finite loss/fps."""
    import json as _json

    import torch

    from fastdepth_tpu.cli import benchmark as bench_cli

    gen = torch.Generator().manual_seed(3)
    tm = TorchFastDepth(TINY_ENC, TINY_DEC, skip="add").eval()
    randomize_bn_stats(tm, gen)
    ckpt = str(tmp_path / "m.pth.tar")
    torch.save({"epoch": 0, "best_result": None, "model": tm}, ckpt)

    root = tmp_path / "nyudepthv2" / "train"
    _make_nyu_tree(str(root), rng, n=5)

    result = bench_cli.main([
        "--evaluate", ckpt,
        "--data-root", str(tmp_path),
        "--batch-size", "2",
        "--train",
        "--device-augment",
        "--json",
    ])
    assert result["device_augment"] is True
    assert result["frames"] == 4  # drop_last: 5 items -> 2 full batches
    assert result["fps"] > 0
    assert np.isfinite(result["final_loss"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert _json.loads(out)["metric"].startswith("end-to-end streaming TRAIN")


def test_benchmark_synthetic_train_tree_skips_holdout_stems(tmp_path):
    """make_synthetic_tree('train') must yield exactly n TRAIN-split
    items (stems 00001/00201 are holdout-filtered by the dataset)."""
    from fastdepth_tpu.cli.benchmark import make_synthetic_tree
    from fastdepth_tpu.data import NYUDataset

    root = make_synthetic_tree(4, "train")
    ds = NYUDataset(os.path.join(root, "nyudepthv2", "train"), split="train")
    assert len(ds) == 4


def test_convert_cli_roundtrip(tmp_path, rng, capsys):
    """convert CLI: torch pickle -> .npz usable by the eval engine."""
    from fastdepth_tpu.cli import convert as convert_cli
    from fastdepth_tpu.cli.evaluate import load_params_and_model

    gen = torch.Generator().manual_seed(3)
    tm = TorchFastDepth(TINY_ENC, TINY_DEC, skip="add").eval()
    randomize_bn_stats(tm, gen)
    src = str(tmp_path / "m.pth.tar")
    torch.save({"epoch": 5, "best_result": None, "model": tm}, src)
    dst = str(tmp_path / "m.npz")

    cfg = convert_cli.main([src, dst])
    assert cfg.encoder_channels == TINY_ENC
    assert "config" in capsys.readouterr().out

    params, model, meta = load_params_and_model(dst)
    assert meta["epoch"] == 5
    import jax.numpy as jnp

    out = model.apply(params, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64, 1)


def test_profile_marginal_fn_exact_at_eps0():
    """cli.profile's marginal-mode graphs equal the plain forward at
    eps=0 for every attribution point (the duplicate blends to zero), so
    the timing diff attributes only the duplicated layer."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fastdepth_tpu.cli.profile import make_marginal_fn, prefix_points
    from fastdepth_tpu.config import ModelConfig
    from fastdepth_tpu.models import build

    enc = (4, 6, 8, 10, 12, 14, 16, 16, 16, 16, 16, 16, 20, 24)
    dec = (18, 14, 10, 6, 4)
    cfg = ModelConfig(encoder_channels=enc, decoder_channels=dec).validate()
    model = build(cfg)
    params = model.fold(model.init(jax.random.PRNGKey(0)))
    x = jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3), jnp.float32)
    eps0 = jnp.float32(0.0)
    base = np.asarray(jax.jit(make_marginal_fn(model, cfg, None))(params, x, eps0))
    for k in (1, 2, 15, 20, len(prefix_points(cfg))):
        got = np.asarray(jax.jit(make_marginal_fn(model, cfg, k))(params, x, eps0))
        assert np.array_equal(base, got), k


def test_roofline_module_matches_committed_doc():
    """engine/roofline.py is the single source behind docs/roofline.md —
    regenerating the bound columns must reproduce the committed table's
    per-layer bounds (guards formula drift between the doc and the
    profile CLI, which both import it)."""
    import re

    from fastdepth_tpu.config import FASTDEPTH_PRUNED
    from fastdepth_tpu.engine.roofline import bound_components_us, layer_bounds

    doc = open(os.path.join(os.path.dirname(__file__), "..", "docs",
                            "roofline.md")).read()
    doc_bounds = [float(m) for m in re.findall(
        r"^\|[^|]+\|[^|]+\|[^|]+\|[^|]+\| ([0-9.]+) \|", doc, re.M)]
    rows = layer_bounds(FASTDEPTH_PRUNED, 224)
    assert len(doc_bounds) == len(rows) == 20
    for want, (_key, _macs, hbm_e, mxu, vpu) in zip(doc_bounds, rows):
        h, m, v = bound_components_us(hbm_e, mxu, vpu, dtype_bytes=2)
        assert abs(max(h, m, v) - want) < 5e-3, (_key, want, max(h, m, v))


def test_measured_roofline_matches_committed_doc():
    """The round-3 'measured-ceiling bound' table in docs/roofline.md is
    regenerated from engine/roofline.measured_stage_bounds over the
    committed probe payload (docs/probe_r3_hbm.json) — doc numbers can't
    drift from the recorded measurements."""
    import json
    import re

    from fastdepth_tpu.config import FASTDEPTH_PRUNED
    from fastdepth_tpu.engine.roofline import measured_stage_bounds

    root = os.path.join(os.path.dirname(__file__), "..", "docs")
    probe = json.load(open(os.path.join(root, "probe_r3_hbm.json")))
    doc = open(os.path.join(root, "roofline.md")).read()
    got = measured_stage_bounds(FASTDEPTH_PRUNED, probe)
    assert set(got) == {3, 4, 5}
    # rows: | decN | spec | total (dw D + pw P + ups/add U) | marginal | Xx |
    pat = (r"^\| dec(\d) \| [0-9.]+ \| ([0-9.]+) +\(dw ([0-9.]+) \+ pw "
           r"([0-9.]+) \+ ups\S* ([0-9.]+)\) \| ([0-9.]+) \| ([0-9.]+)x \|")
    found = {int(m[0]): tuple(float(v) for v in m[1:])
             for m in re.findall(pat, doc, re.M)}
    assert set(found) == {3, 4, 5}, found
    for i, (total, dw, pw, ups, marginal, x) in found.items():
        g_total, g_dw, g_pw, g_ups = got[i]
        assert abs(g_total - total) < 0.06, (i, total, g_total)
        assert abs(g_dw - dw) < 0.06 and abs(g_pw - pw) < 0.06
        assert abs(g_ups - ups) < 0.06, (i, ups, g_ups)
        assert abs(marginal / g_total - x) < 0.01, (i, x, marginal / g_total)

    # the doc's aggregate composite is the same single-sourced function
    # bench.py uses for x_roofline_measured
    from fastdepth_tpu.engine.roofline import measured_composite_us

    m = re.search(r"\*\*([0-9.]+) us/frame\nachievable-composite bound\*\*",
                  doc)
    assert m, "aggregate composite line missing from roofline.md"
    assert abs(measured_composite_us(FASTDEPTH_PRUNED, probe)
               - float(m.group(1))) < 0.05


def test_roofline_concat_widens_downstream_bounds():
    """layer_bounds under skip='concat' must account for the tap read at
    its own width and the widened cin of every post-skip stage — the old
    formula modeled concat as add (2x cout), undercounting both bytes and
    MACs for concat models."""
    import dataclasses

    from fastdepth_tpu.config import FASTDEPTH_UNPRUNED
    from fastdepth_tpu.engine.roofline import layer_bounds

    cfg_add = FASTDEPTH_UNPRUNED
    cfg_cat = dataclasses.replace(cfg_add, skip="concat")
    rows_add = {r[0]: r for r in layer_bounds(cfg_add)}
    rows_cat = {r[0]: r for r in layer_bounds(cfg_cat)}

    # For the unpruned net tap == cout at every skip stage, so the skip
    # stages' own byte counts agree between add and concat ...
    for name in ("dec.stage2",):
        assert rows_add[name][2] == rows_cat[name][2], name
    # ... but every stage AFTER a concat reads a widened input: strictly
    # more MACs and bytes than the add model at the same stage.  (dec.head
    # follows stage 5, which has no skip — it stays identical.)
    for name in ("dec.stage3", "dec.stage4", "dec.stage5"):
        assert rows_cat[name][1] > rows_add[name][1], name  # MACs
        assert rows_cat[name][2] > rows_add[name][2], name  # bytes
    assert rows_cat["dec.head"][1] == rows_add["dec.head"][1]


def test_deploy_runner_mixed_impl(tiny_ckpt, tmp_path, capsys):
    """--impl mixed --tuning <committed record>: the tuned per-stage
    winner map drives the deploy executable e2e (VERDICT r3 item 4) —
    the reference's deploy story is exactly 'run the tuned artifact'
    (tx2_run_tvm.py:13-26).  Prediction must match the default path."""
    from fastdepth_tpu.cli import deploy

    rgb = np.random.RandomState(1).rand(64, 64, 3).astype(np.float32)
    in_fp = str(tmp_path / "rgb.npy")
    np.save(in_fp, rgb)

    out_ref = str(tmp_path / "pred_ref.npy")
    deploy.main(["--model", tiny_ckpt, "--input-fp", in_fp,
                 "--output-fp", out_ref, "--warmup", "0", "--run", "1"])
    out_mixed = str(tmp_path / "pred_mixed.npy")
    deploy.main(["--model", tiny_ckpt, "--input-fp", in_fp,
                 "--output-fp", out_mixed, "--warmup", "0", "--run", "1",
                 "--impl", "mixed",
                 "--tuning",
                 "tuning/tpuv5lite.mobilenet-nnconv5dw-skipadd-pruned.json"])
    np.testing.assert_allclose(
        np.load(out_mixed), np.load(out_ref), atol=1e-4)
