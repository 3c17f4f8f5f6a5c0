"""Full-width end-to-end oracle parity (round-3 item: VERDICT r2 'What's
weak' #1).  The tiny-width e2e suite (tests/test_eval_e2e.py) runs 10-50x
below the real channel counts; layout/stride/grouping bugs that only
manifest at real widths (lane-boundary effects, channel-list off-by-ones
in the pruned config) would slip through it.  Here the REAL NetAdapt-
pruned FastDepth (SURVEY.md §2 reconstruction) and the REAL unpruned
MobileNetSkipAdd (reference models.py:654-732) are built as torch oracles
at 224x224, saved as reference-format pickles (main.py:49-57), and run
through the complete converter -> Evaluator -> metrics path; every metric
must agree with the torch forward + reference metric formulas
(metrics.py:31-55) run directly.
"""

import h5py
import numpy as np
import pytest
import torch

from fastdepth_tpu.config import (
    FASTDEPTH_PRUNED,
    FASTDEPTH_UNPRUNED,
)
from fastdepth_tpu.data import BatchLoader, NYUDataset
from fastdepth_tpu.engine import Evaluator, validate
from fastdepth_tpu.metrics import AverageMeter, Result
from fastdepth_tpu.models import build

from test_metrics import torch_reference_metrics
from torch_oracle import TorchFastDepth, randomize_bn_stats

CASES = {
    "pruned": FASTDEPTH_PRUNED,    # tuning-log widths, the flagship
    "unpruned": FASTDEPTH_UNPRUNED,  # models.py:654-732 widths
}


@pytest.fixture(scope="module")
def nyu_val_root(tmp_path_factory):
    """3 real-shaped val frames (480x640) — one padded batch of 2 plus a
    remainder exercises pad_last at full width."""
    rng = np.random.RandomState(7)
    root = tmp_path_factory.mktemp("nyud_full") / "val"
    d = root / "scene_a"
    d.mkdir(parents=True)
    for fname in ("00001.h5", "00002.h5", "00003.h5"):
        with h5py.File(d / fname, "w") as f:
            f["rgb"] = (rng.rand(3, 480, 640) * 255).astype(np.uint8)
            f["depth"] = (rng.rand(480, 640) * 9 + 0.5).astype(np.float32)
    return str(root)


def _torch_validate(tm, dataset):
    meter = AverageMeter()
    for i in range(len(dataset)):
        rgb, depth = dataset[i]
        x = torch.from_numpy(rgb.transpose(2, 0, 1)[None])
        with torch.no_grad():
            pred = tm(x).numpy()[0, 0]
        meter.update(Result(**torch_reference_metrics(pred, depth[..., 0])))
    return meter.average()


@pytest.mark.slow
def test_fullwidth_opt_path_bit_exact():
    """The serving default (head-commute, models/fused.apply_fastdepth_opt)
    is bit-exact against the straight graph AT THE REAL PRUNED WIDTHS and
    224x224 — the tiny-width exactness test can't see lane-boundary
    effects at 56/120/256 channels."""
    import jax
    import jax.numpy as jnp

    from fastdepth_tpu.models import build
    from fastdepth_tpu.models.fused import apply_fastdepth_opt

    cfg = FASTDEPTH_PRUNED
    model = build(cfg)
    params = model.fold(model.init(jax.random.PRNGKey(5)))
    x = jnp.asarray(np.random.RandomState(6).rand(2, 224, 224, 3), jnp.float32)
    ref = np.asarray(jax.jit(model.apply)(params, x))
    got = np.asarray(jax.jit(
        lambda p, a: apply_fastdepth_opt(p, a, cfg))(params, x))
    assert np.array_equal(ref, got)


@pytest.mark.slow
@pytest.mark.parametrize("case", list(CASES))
def test_fullwidth_e2e_matches_torch_oracle(case, nyu_val_root, tmp_path):
    from fastdepth_tpu.checkpoint.convert import convert_checkpoint
    from fastdepth_tpu.checkpoint.io import numpy_to_jax

    cfg_want = CASES[case]
    gen = torch.Generator().manual_seed(3)
    tm = TorchFastDepth(
        cfg_want.encoder_channels, cfg_want.decoder_channels, skip="add"
    ).eval()
    randomize_bn_stats(tm, gen)
    ckpt = tmp_path / "model_best.pth.tar"
    torch.save({"epoch": 11, "best_result": None, "model": tm}, ckpt)

    params, cfg, meta = convert_checkpoint(str(ckpt))
    # the converter must recover the exact full-width channel lists
    assert cfg.encoder_channels == cfg_want.encoder_channels
    assert cfg.decoder_channels == cfg_want.decoder_channels
    assert meta["epoch"] == 11

    dataset = NYUDataset(nyu_val_root, split="val")
    loader = BatchLoader(dataset, batch_size=2, num_workers=2, pad_last=True)
    ref = _torch_validate(tm, dataset)

    # unfolded BN: tightest numerics (same op sequence as torch)
    ev = Evaluator(build(cfg), numpy_to_jax(params), batch_size=2,
                   fold_bn=False)
    avg = validate(loader, ev, print_freq=0, make_images=False,
                   log=lambda *a: None)
    for f in ("rmse", "mae", "delta1", "delta2", "delta3", "absrel",
              "lg10", "mse"):
        np.testing.assert_allclose(
            getattr(avg, f), getattr(ref, f), rtol=1e-4, err_msg=f"{case}.{f}")

    # folded BN (the production inference path): reassociates the BN
    # affine into the conv weights — small extra fp32 error is expected
    evf = Evaluator(build(cfg), numpy_to_jax(params), batch_size=2)
    avgf = validate(loader, evf, print_freq=0, make_images=False,
                    log=lambda *a: None)
    for f in ("rmse", "delta1", "absrel"):
        np.testing.assert_allclose(
            getattr(avgf, f), getattr(ref, f), rtol=1e-3,
            err_msg=f"{case}.folded.{f}")
