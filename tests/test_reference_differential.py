"""Differential parity against the reference's OWN source code.

Every other parity test in this suite validates against re-implemented
torch oracles (tests/torch_oracle.py, test_metrics.torch_reference_metrics)
— a transcription error shared between the oracle and the converter would
be invisible to them.  Here the ground truth is the reference codebase
itself, imported at test time:

* ``/root/reference/models.py`` — ``MobileNetSkipAdd`` (reference
  models.py:654-732) built verbatim with ``pretrained=False``,
* ``/root/reference/metrics.py`` — ``Result.evaluate`` /
  ``AverageMeter`` (reference metrics.py:31-95),
* ``/root/reference/dataloaders/transforms.py`` — the train-augmentation
  classes ``Rotate``, ``CenterCrop``, ``HorizontalFlip``, ``ColorJitter``
  and the ``adjust_*`` enhance functions (transforms.py:34-170,288-308,
  344-405,485-578), which import and execute under current scipy/PIL.

``torchvision`` (absent from this image) is stubbed: models.py imports it
at module level but ``MobileNetSkipAdd`` never touches it.  Of the
reference transform library only ``Resize`` (transforms.py:311-341) is
genuinely dead — it calls ``scipy.misc.imresize``, removed from scipy —
so the resize chain stays on the Pillow sweep (tests/test_transforms.py,
which drives Pillow itself as the oracle); every OTHER geometric and
photometric train op is differentially tested here against the
reference's own classes, bit-for-bit, including the jitter's
random-factor/random-order protocol driven from the same RNG state.
"""

import importlib.util
import os
import sys
import types

import h5py
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from fastdepth_tpu import metrics as our_metrics
from fastdepth_tpu.config import FASTDEPTH_UNPRUNED
from fastdepth_tpu.models import build

from torch_oracle import randomize_bn_stats

REF = os.environ.get("FASTDEPTH_REFERENCE", "/root/reference")

# sys.modules names the reference import graph needs while loading.  The
# fixture swaps real modules in (converter tests may have left stubs under
# 'imagenet'/'imagenet.mobilenet') and restores whatever was there after.
_SWAPPED = ("torchvision", "torchvision.models", "imagenet", "imagenet.mobilenet")


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_modules():
    if not os.path.isfile(os.path.join(REF, "models.py")):
        pytest.skip(f"reference tree not available at {REF}")
    saved = {k: sys.modules.get(k) for k in _SWAPPED}
    try:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
        pkg = types.ModuleType("imagenet")
        pkg.__path__ = [os.path.join(REF, "imagenet")]
        sys.modules["imagenet"] = pkg
        pkg.mobilenet = _load(
            "imagenet.mobilenet", os.path.join(REF, "imagenet", "mobilenet.py"))
        ref_models = _load("ref_models", os.path.join(REF, "models.py"))
        ref_metrics = _load("ref_metrics", os.path.join(REF, "metrics.py"))
        yield ref_models, ref_metrics
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.fixture(scope="module")
def ref_transforms():
    """The reference's own transform library (dataloaders/transforms.py).
    Imports cleanly under current scipy/PIL; only its ``Resize.__call__``
    is dead (scipy.misc.imresize) and is never invoked here."""
    path = os.path.join(REF, "dataloaders", "transforms.py")
    if not os.path.isfile(path):
        pytest.skip(f"reference tree not available at {REF}")
    return _load("ref_transforms", path)


@pytest.fixture(scope="module")
def ref_fastdepth(ref_modules, tmp_path_factory):
    """The reference's own MobileNetSkipAdd (full width), saved in the
    reference checkpoint envelope (main.py:49-57) and converted."""
    from fastdepth_tpu.checkpoint.convert import convert_checkpoint
    from fastdepth_tpu.checkpoint.io import numpy_to_jax

    ref_models, _ = ref_modules
    torch.manual_seed(0)
    tm = ref_models.MobileNetSkipAdd(output_size=(224, 224), pretrained=False)
    tm.eval()
    # nontrivial BN running stats so eval-mode normalization is exercised
    randomize_bn_stats(tm, torch.Generator().manual_seed(1))
    ckpt = tmp_path_factory.mktemp("refckpt") / "model_best.pth.tar"
    torch.save({"epoch": 7, "best_result": None, "model": tm}, str(ckpt))
    params, cfg, meta = convert_checkpoint(str(ckpt))
    assert meta["epoch"] == 7
    return tm, numpy_to_jax(params), cfg


def test_converter_recovers_reference_architecture(ref_fastdepth):
    """The channel lists inferred from the reference's own pickle must be
    the unpruned widths (reference models.py:654-698)."""
    _, _, cfg = ref_fastdepth
    assert cfg.encoder_channels == FASTDEPTH_UNPRUNED.encoder_channels
    assert cfg.decoder_channels == FASTDEPTH_UNPRUNED.decoder_channels
    assert cfg.skip == "add"


@pytest.mark.slow
def test_forward_matches_reference_model(ref_fastdepth):
    """Converted params + our forward vs the reference's own forward
    (models.py:706-732), per pixel at full width / 224x224."""
    tm, params, cfg = ref_fastdepth
    x = np.random.RandomState(2).rand(2, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        ref_pred = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref_pred = ref_pred.numpy().transpose(0, 2, 3, 1)
    ours = np.asarray(jax.jit(build(cfg).apply)(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref_pred, rtol=1e-3, atol=1e-4)


def _cases():
    r = np.random.RandomState(3)
    shape = (48, 64)
    base_out = (r.rand(*shape) * 9 + 0.5).astype(np.float32)
    base_tgt = (r.rand(*shape) * 9 + 0.5).astype(np.float32)
    # (a) all-valid; (b) ReLU-realistic zeros in the prediction;
    # (c) zero-holes in the target — the union mask (metrics.py:32) keeps
    # those pixels because output>0, driving absrel/lg10/irmse to inf in
    # the reference; ours must produce the same infinities.
    out_b = base_out.copy()
    out_b[r.rand(*shape) < 0.1] = 0.0
    tgt_c = base_tgt.copy()
    tgt_c[r.rand(*shape) < 0.1] = 0.0
    return {
        "all_valid": (base_out, base_tgt),
        "zero_predictions": (out_b, base_tgt),
        "zero_target_holes": (base_out, tgt_c),
    }


@pytest.mark.parametrize("case", list(_cases()))
def test_metrics_match_reference_result(ref_modules, case):
    """Our metrics vs the reference's own Result.evaluate
    (metrics.py:31-55) on identical arrays — all 10 metrics."""
    _, ref_metrics = ref_modules
    out, tgt = _cases()[case]
    res = ref_metrics.Result()
    res.evaluate(torch.from_numpy(out), torch.from_numpy(tgt))
    ours = our_metrics.evaluate(out, tgt)
    for f in our_metrics.METRIC_FIELDS:
        np.testing.assert_allclose(
            getattr(ours, f), getattr(res, f), rtol=1e-5,
            err_msg=f"{case}.{f}")


def test_average_meter_matches_reference(ref_modules):
    """Count-weighted averaging differential (metrics.py:58-95)."""
    _, ref_metrics = ref_modules
    ref_meter = ref_metrics.AverageMeter()
    our_meter = our_metrics.AverageMeter()
    for i, (out, tgt) in enumerate(_cases().values()):
        if not np.isfinite(
                torch.from_numpy(out).sum().item()):  # pragma: no cover
            continue
        res = ref_metrics.Result()
        res.evaluate(torch.from_numpy(out), torch.from_numpy(tgt))
        ref_meter.update(res, gpu_time=0.0, data_time=0.0, n=i + 1)
        our_meter.update(our_metrics.evaluate(out, tgt), n=i + 1)
    ref_avg = ref_meter.average()
    our_avg = our_meter.average()
    for f in our_metrics.METRIC_FIELDS:
        np.testing.assert_allclose(
            getattr(our_avg, f), getattr(ref_avg, f), rtol=1e-5, err_msg=f)


@pytest.mark.slow
def test_e2e_validate_matches_reference_pipeline(ref_modules, ref_fastdepth, tmp_path):
    """converter -> Evaluator -> our validate() vs the reference's own
    model forward + Result.evaluate + AverageMeter, at full width: the
    complete differential (only the h5 val items are shared machinery)."""
    from fastdepth_tpu.data import BatchLoader, NYUDataset
    from fastdepth_tpu.engine import Evaluator, validate

    _, ref_metrics = ref_modules
    tm, params, cfg = ref_fastdepth
    tm.eval()

    rng = np.random.RandomState(7)
    root = tmp_path / "val" / "scene_a"
    root.mkdir(parents=True)
    for fname in ("00001.h5", "00002.h5", "00003.h5"):
        with h5py.File(root / fname, "w") as f:
            f["rgb"] = (rng.rand(3, 480, 640) * 255).astype(np.uint8)
            f["depth"] = (rng.rand(480, 640) * 9 + 0.5).astype(np.float32)

    dataset = NYUDataset(str(tmp_path / "val"), split="val")
    meter = ref_metrics.AverageMeter()
    with torch.no_grad():
        for i in range(len(dataset)):
            rgb, depth = dataset[i]
            pred = tm(torch.from_numpy(rgb.transpose(2, 0, 1)[None]))
            res = ref_metrics.Result()
            res.evaluate(pred[0, 0], torch.from_numpy(depth[..., 0]))
            meter.update(res, gpu_time=0.0, data_time=0.0)
    ref_avg = meter.average()

    loader = BatchLoader(dataset, batch_size=2, num_workers=2, pad_last=True)
    # unfolded BN: same op sequence as the reference's eval-mode forward
    ev = Evaluator(build(cfg), params, batch_size=2, fold_bn=False)
    avg = validate(loader, ev, print_freq=0, make_images=False,
                   log=lambda *a: None)
    for f in ("rmse", "mae", "mse", "absrel", "lg10", "delta1", "delta2",
              "delta3", "irmse", "imae"):
        np.testing.assert_allclose(
            getattr(avg, f), getattr(ref_avg, f), rtol=1e-4, err_msg=f)


# ---------------------------------------------------------------------------
# Transform differentials against the reference's OWN classes
# (dataloaders/transforms.py:288-308,344-405,485-578).  These are the
# train-augmentation ops (nyu.py:26-46); the val/train resize steps are
# excluded only because the reference's Resize is the one op that cannot
# execute (scipy.misc.imresize) — those stay on the direct-Pillow sweep.


def _rgb_depth(seed=11, shape=(48, 64)):
    r = np.random.RandomState(seed)
    rgb = (r.rand(*shape, 3) * 255).astype(np.uint8)
    depth = (r.rand(*shape) * 9 + 0.1).astype(np.float32)
    return rgb, depth


@pytest.mark.parametrize("angle", [-5.0, -2.5, -0.7, 0.0, 1.3, 3.75, 5.0])
def test_rotate_matches_reference(ref_transforms, angle):
    """Our rotate + the pipeline's gather-map form vs the reference's own
    ``Rotate`` (scipy order-0, reshape=False; transforms.py:288-308), on
    uint8 RGB and float depth.  The gather form is what TrainPipeline
    actually executes (data/pipeline.py::composed_indices)."""
    from fastdepth_tpu.data import transforms as T

    rgb, depth = _rgb_depth()
    for img in (rgb, depth):
        ref = ref_transforms.Rotate(angle)(img)
        np.testing.assert_array_equal(T.rotate(img, angle), ref)
        # gather-map replay: -1 == scipy's constant pad (cval=0)
        flat = T.rotate_nearest_indices(*img.shape[:2], angle)
        out = img.reshape(-1, *img.shape[2:])[np.where(flat < 0, 0, flat)]
        out[flat < 0] = 0
        np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize(
    "in_shape,out_size",
    [((48, 64), (30, 40)), ((47, 63), (30, 41)), ((250, 333), (228, 304)),
     ((48, 64), (47, 64)), ((48, 64), 30)])
def test_center_crop_matches_reference(ref_transforms, in_shape, out_size):
    """Banker's-rounded offsets vs the reference's own ``CenterCrop``
    (transforms.py:344-405), odd/even extents and the int-size square
    form, on RGB and depth."""
    from fastdepth_tpu.data import transforms as T

    r = np.random.RandomState(4)
    rgb = (r.rand(*in_shape, 3) * 255).astype(np.uint8)
    depth = r.rand(*in_shape).astype(np.float32)
    size = (out_size, out_size) if isinstance(out_size, int) else out_size
    for img in (rgb, depth):
        np.testing.assert_array_equal(
            T.center_crop(img, size), ref_transforms.CenterCrop(out_size)(img))


@pytest.mark.parametrize("do_flip", [False, True])
def test_horizontal_flip_matches_reference(ref_transforms, do_flip):
    from fastdepth_tpu.data import transforms as T

    rgb, depth = _rgb_depth()
    for img in (rgb, depth):
        np.testing.assert_array_equal(
            T.horizontal_flip(img, do_flip),
            ref_transforms.HorizontalFlip(do_flip)(img))


def test_composed_geometry_matches_reference(ref_transforms):
    """Rotate -> CenterCrop -> HFlip chained through the reference's own
    Compose vs our transforms, at the train pipeline's 250x333
    intermediate (nyu.py:33-39 minus the dead Resize steps)."""
    from fastdepth_tpu.data import transforms as T

    r = np.random.RandomState(9)
    rgb = (r.rand(250, 333, 3) * 255).astype(np.uint8)
    depth = (r.rand(250, 333) * 9).astype(np.float32)
    for angle, flip in [(-4.2, True), (1.9, False), (5.0, True)]:
        ref_chain = ref_transforms.Compose([
            ref_transforms.Rotate(angle),
            ref_transforms.CenterCrop((228, 304)),
            ref_transforms.HorizontalFlip(flip),
        ])
        for img in (rgb, depth):
            ours = T.horizontal_flip(
                T.center_crop(T.rotate(img, angle), (228, 304)), flip)
            np.testing.assert_array_equal(ours, ref_chain(img))


@pytest.mark.parametrize("seed", list(range(20)))
def test_color_jitter_protocol_matches_reference(ref_transforms, seed):
    """The full jitter protocol — random factors drawn b/c/s in order,
    random op-order shuffle, PIL enhance arithmetic — vs the reference's
    own ``ColorJitter(0.4, 0.4, 0.4)`` (transforms.py:513-578, the exact
    NYU configuration, dataloader.py:46).  Both sides draw from the same
    MT19937 state: the reference from the freshly-seeded global
    ``np.random``, ours from ``RandomState(seed)`` — identical legacy
    streams — so factor values AND shuffle order coincide and the uint8
    outputs must be bit-equal."""
    from fastdepth_tpu.data import transforms as T

    rgb, _ = _rgb_depth(seed=seed + 100)
    np.random.seed(seed)
    ref = ref_transforms.ColorJitter(0.4, 0.4, 0.4)(rgb)
    ours = T.ColorJitter(0.4, 0.4, 0.4)(rgb, np.random.RandomState(seed))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("factor", [0.6, 0.63, 1.0, 1.37, 1.4])
def test_adjust_enhance_matches_reference(ref_transforms, factor):
    """Our LUT/native fast forms vs the reference's own PIL-backed
    ``adjust_brightness/contrast/saturation`` (transforms.py:34-94)."""
    from PIL import Image

    from fastdepth_tpu.data import transforms as T

    rgb, _ = _rgb_depth(seed=21)
    pil = Image.fromarray(rgb)
    np.testing.assert_array_equal(
        T.adjust_brightness_fast(rgb, factor),
        np.array(ref_transforms.adjust_brightness(pil, factor)))
    np.testing.assert_array_equal(
        T.adjust_contrast_fast(rgb, factor),
        np.array(ref_transforms.adjust_contrast(pil, factor)))
    np.testing.assert_array_equal(
        T.adjust_saturation_fast(rgb, factor),
        np.array(ref_transforms.adjust_saturation(pil, factor)))


def test_adjust_hue_matches_reference(ref_transforms):
    """Positive hue factors vs the reference's own ``adjust_hue``
    (transforms.py:95-137).  Negative factors are asserted to raise in
    the REFERENCE under NumPy 2 (``np.uint8(negative)`` overflow) — our
    ``% 256`` wrap reproduces the pre-NumPy-2 behavior the reference was
    written against, so only the positive half is differentially
    checkable."""
    from PIL import Image

    from fastdepth_tpu.data import transforms as T

    rgb, _ = _rgb_depth(seed=22)
    pil = Image.fromarray(rgb)
    for factor in (0.02, 0.2, 0.5):
        np.testing.assert_array_equal(
            T.adjust_hue(rgb, factor),
            np.array(ref_transforms.adjust_hue(pil, factor)))
    with pytest.raises(OverflowError):
        ref_transforms.adjust_hue(pil, -0.2)


def test_reference_resize_is_dead(ref_transforms):
    """Pin the scope claim: the reference's ``Resize.__call__``
    (transforms.py:311-341) raises because scipy.misc.imresize is gone.
    If a future scipy resurrects it, this fails and the resize chain
    should be promoted into the differentials above."""
    rgb, _ = _rgb_depth()
    with pytest.raises(AttributeError):
        ref_transforms.Resize(250.0 / 480.0)(rgb)
