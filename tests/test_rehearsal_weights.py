"""The committed rehearsal weights keep reproducing their committed row.

docs/rehearsal_model_r5.npz is REAL trained weights (pruned flagship,
24 epochs through the public cli.train on the structured synthetic
tree; PARITY OK on the real chip — docs/parity_rehearsal_r5.json).
Pinning the full load -> build -> Evaluator -> metrics stack to the row
those weights produce guards against converter/evaluator/metric drift
that random-weight tests cannot see (random weights give garbage
metrics, which stay garbage under many classes of bug).

The val tree regenerates deterministically from the generator in
scripts/train_rehearsal.py (seed=1007: each item draws its rng values
sequentially, so the first 16 of the 64-item val split are identical
when generated with n=16)."""

import importlib.util
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WEIGHTS = os.path.join(REPO, "docs", "rehearsal_model_r5.npz")


def _load_rehearsal_module():
    spec = importlib.util.spec_from_file_location(
        "train_rehearsal", os.path.join(REPO, "scripts",
                                        "train_rehearsal.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def val16_tree(tmp_path_factory):
    tr = _load_rehearsal_module()
    root = str(tmp_path_factory.mktemp("rehearsal_val16"))
    tr.make_structured_tree(root, "val", 16, seed=1007)
    return root


def test_committed_weights_reproduce_committed_row(val16_tree):
    import json

    from fastdepth_tpu.checkpoint.io import load_checkpoint, numpy_to_jax
    from fastdepth_tpu.data import BatchLoader, NYUDataset
    from fastdepth_tpu.engine import Evaluator, validate
    from fastdepth_tpu.models import build

    with open(os.path.join(REPO, "docs", "parity_rehearsal_r5.json")) as f:
        pin = json.load(f)["val16_cpu_row"]

    params, config, _ = load_checkpoint(WEIGHTS)
    model = build(config)
    dataset = NYUDataset(os.path.join(val16_tree, "nyudepthv2", "val"),
                         split="val")
    assert len(dataset) == 16
    loader = BatchLoader(dataset, batch_size=8, num_workers=2,
                         pad_last=True)
    ev = Evaluator(model, numpy_to_jax(params), batch_size=8)
    avg = validate(loader, ev, print_freq=0, make_images=False,
                   log=lambda *a: None)
    # same backend (CPU) as the pin; 5e-4 rel headroom for XLA version
    # drift — a converter/eval/metric bug moves these by percents
    np.testing.assert_allclose(avg.rmse, pin["rmse_mm"], rtol=5e-4)
    np.testing.assert_allclose(avg.mae, pin["mae_mm"], rtol=5e-4)
    np.testing.assert_allclose(avg.delta1, pin["delta1"], rtol=5e-4)
    np.testing.assert_allclose(avg.absrel, pin["absrel"], rtol=5e-4)


def test_weights_metadata_matches_report():
    """The npz metadata row (bf16 training-time best) is the one the
    rehearsal report committed."""
    import json

    from fastdepth_tpu.checkpoint.io import load_checkpoint

    with open(os.path.join(REPO, "docs", "parity_rehearsal_r5.json")) as f:
        rep = json.load(f)["train_time_best_row_bf16"]
    _, config, meta = load_checkpoint(WEIGHTS)
    best = meta["best_result"]
    assert config.encoder == "mobilenet"
    for k in ("rmse", "delta1", "mae", "absrel"):
        np.testing.assert_allclose(best[k], rep[k], rtol=1e-9)
