"""fp32 vs bf16 fidelity CLI test."""

import os

import h5py
import numpy as np
import pytest
import torch

from torch_oracle import TorchFastDepth, randomize_bn_stats

TINY_ENC = (4, 6, 8, 10, 12, 14, 16, 16, 16, 16, 16, 16, 20, 24)
TINY_DEC = (18, 14, 10, 6, 4)


def test_fidelity_cli(tmp_path, rng, capsys):
    root = tmp_path / "nyudepthv2" / "val" / "scene"
    root.mkdir(parents=True)
    for i in range(3):
        with h5py.File(root / f"{i:05d}.h5", "w") as f:
            f["rgb"] = (rng.rand(3, 480, 640) * 255).astype(np.uint8)
            f["depth"] = (rng.rand(480, 640) * 9 + 0.5).astype(np.float32)
    gen = torch.Generator().manual_seed(0)
    tm = TorchFastDepth(TINY_ENC, TINY_DEC, skip="add").eval()
    randomize_bn_stats(tm, gen)
    ckpt = str(tmp_path / "m.pth.tar")
    torch.save({"epoch": 1, "best_result": None, "model": tm}, ckpt)

    from fastdepth_tpu.cli import fidelity

    json_path = str(tmp_path / "fidelity.json")
    results = fidelity.main([
        "--evaluate", ckpt,
        "--data-root", str(tmp_path),
        "--batch-size", "2",
        "--limit", "2",
        "--json", json_path,
    ])
    out = capsys.readouterr().out
    assert "[fp32]" in out and "[bf16]" in out and "rmse" in out
    # bf16 shouldn't be catastrophically different on this tiny model
    rel = abs(results["bf16"].rmse - results["fp32"].rmse) / results["fp32"].rmse
    assert rel < 0.05
    import json

    with open(json_path) as f:
        payload = json.load(f)
    assert payload["images"] == 2  # --limit honored
    assert set(payload["metrics"]) >= {"rmse", "delta1", "absrel"}
    assert payload["metrics"]["rmse"]["fp32"] == results["fp32"].rmse
