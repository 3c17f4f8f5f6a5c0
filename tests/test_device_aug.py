"""Device-side train augmentation == host pipeline, bit-for-bit.

The host train item (data/pipeline.py + ColorJitter, itself
differentially tested against the reference's own transform classes in
test_reference_differential.py) is the ground truth; the jitted device
path (data/device_aug.py) must reproduce every f32 bit through the
gather, rotation pad, depth /= s, the PIL-exact enhance chain, and the
/255 — so a trainer fed raw frames + parameters computes exactly what
the host-preprocessed trainer computes (reference dataloaders/nyu.py:26-46
semantics, relocated into the train jit).
"""

import os

import h5py
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdepth_tpu.data import transforms as T
from fastdepth_tpu.data.device_aug import (
    KIND_BRIGHTNESS,
    KIND_CONTRAST,
    KIND_NONE,
    KIND_SATURATION,
    _jitter_slot,
    apply_train_augment,
)
from fastdepth_tpu.data.nyu import NYUDataset


@pytest.fixture(scope="module")
def train_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("devaug") / "train" / "scene_a"
    root.mkdir(parents=True)
    rng = np.random.RandomState(5)
    # 00001.h5 would fall into the NetAdapt holdout filter — skip it
    for i in (2, 3, 4):
        with h5py.File(root / f"{i:05d}.h5", "w") as f:
            f["rgb"] = (rng.rand(3, 480, 640) * 255).astype(np.uint8)
            f["depth"] = (rng.rand(480, 640) * 9 + 0.3).astype(np.float32)
    return str(root.parent)


def _stack_items(ds, idxs):
    items = [ds[i] for i in idxs]
    return [np.stack([it[j] for it in items]) for j in range(len(items[0]))]


@pytest.mark.parametrize("lut_impl", ["dot", "gather"])
def test_device_augment_items_match_host_pipeline(train_root, lut_impl):
    """Full-item equality over every (epoch, index): the jitted device
    pipeline reproduces the host train item to the bit (f32 rgb in
    [0,1] AND f32 depth), including the jitter's per-item random order
    and factors — under BOTH lookup strategies (the gather-free one-hot
    'dot' default and the plain 'gather' forms)."""
    import functools

    host = NYUDataset(train_root, split="train", seed=11)
    dev = NYUDataset(train_root, split="train", seed=11, device_augment=True)
    fn = jax.jit(functools.partial(apply_train_augment, lut_impl=lut_impl))
    for epoch in (0, 1, 5):
        host.set_epoch(epoch)
        dev.set_epoch(epoch)
        idxs = list(range(len(host)))
        batch = _stack_items(dev, idxs)
        rgb_d, depth_d = fn(*[jnp.asarray(a) for a in batch])
        for k, i in enumerate(idxs):
            rgb_h, depth_h = host[i]
            np.testing.assert_array_equal(
                np.asarray(rgb_d[k]), rgb_h,
                err_msg=f"rgb epoch={epoch} idx={i}")
            np.testing.assert_array_equal(
                np.asarray(depth_d[k]), depth_h,
                err_msg=f"depth epoch={epoch} idx={i}")


@pytest.mark.parametrize("lut_impl", ["dot", "gather"])
def test_device_jitter_slots_match_host_enhance(rng, lut_impl):
    """The LUT slot (host-baked blend grid + device integer row select)
    vs the host's PIL-exact enhance kernels on random uint8 images, per
    op kind across factor ranges (incl. the degenerate-gray contrast
    path whose scalar is computed on device in exact integer
    arithmetic) — under both lookup strategies."""
    import functools

    img = (rng.rand(1, 224 * 224, 3) * 255).astype(np.uint8)
    flatimg = img[0].reshape(224, 224, 3)
    cases = [
        (KIND_BRIGHTNESS, T.adjust_brightness_fast),
        (KIND_CONTRAST, T.adjust_contrast_fast),
        (KIND_SATURATION, T.adjust_saturation_fast),
    ]
    fn = jax.jit(functools.partial(_jitter_slot, lut_impl=lut_impl))
    for kind, host_fn in cases:
        for f in (0.6, 0.73, 1.0, 1.21, 1.4):
            got = np.asarray(fn(jnp.asarray(img),
                                jnp.asarray(T.blend_grid(f)[None]),
                                jnp.full((1,), kind, jnp.int32)))
            want = host_fn(flatimg, f).reshape(1, -1, 3)
            np.testing.assert_array_equal(got, want, err_msg=f"{kind}@{f}")
    # identity slot passes through
    got = np.asarray(fn(jnp.asarray(img),
                        jnp.asarray(T.identity_grid()[None]),
                        jnp.full((1,), KIND_NONE, jnp.int32)))
    np.testing.assert_array_equal(got, img)


def test_blend_grid_rows_match_pil_itself():
    """transforms.blend_grid vs Pillow's own Image.blend on a full
    256x256 (degenerate, value) plane, across the NYU factor range —
    the grid must be PIL's arithmetic bit-for-bit, not merely close."""
    from PIL import Image

    v = np.broadcast_to(np.arange(256, dtype=np.uint8)[None, :, None],
                        (256, 256, 3))
    for f in (0.6, 0.77, 1.0, 1.18, 1.4):
        grid = T.blend_grid(f)
        for d in (0, 1, 77, 128, 254, 255):
            deg = Image.new("RGB", (256, 1), (d, d, d))
            strip = Image.fromarray(v[d:d + 1].copy())
            want = np.array(Image.blend(deg, strip, f))[0, :, 0]
            np.testing.assert_array_equal(grid[d], want,
                                          err_msg=f"f={f} d={d}")


def test_native_blend_grid_matches_numpy_bake():
    """The C grid bake (csrc fd_blend_grid) == the numpy reference form,
    every entry, across the NYU factor range — same stepwise f32
    arithmetic (-ffp-contract=off), so equality is exact or the build is
    wrong."""
    from fastdepth_tpu.data import native

    if not native.available():
        pytest.skip("native lib not built")
    lib = native._LIB
    for f in (0.6, 0.73, 0.999, 1.0, 1.18, 1.4):
        got = T.blend_grid(f)  # native path
        native._LIB = None
        try:
            want = T.blend_grid(f)  # numpy reference
        finally:
            native._LIB = lib
        np.testing.assert_array_equal(got, want, err_msg=f"factor={f}")


@pytest.mark.parametrize("lut_impl", ["dot", "gather"])
def test_device_unit_lut_matches_host(lut_impl):
    """The device /255 == the host LUT for all 256 values, under both
    the select-sum and gather forms (XLA division-by-constant is a
    reciprocal multiply — measured 1-ulp off on 126/256 values — hence
    the lookup semantics)."""
    import functools

    from fastdepth_tpu.data import native
    from fastdepth_tpu.data.device_aug import _u8_to_unit

    v = np.arange(256, dtype=np.uint8)
    dev = np.asarray(jax.jit(
        functools.partial(_u8_to_unit, lut_impl=lut_impl))(jnp.asarray(v)))
    np.testing.assert_array_equal(dev, native.u8_to_unit_f32(v))


def test_device_aug_lut_impl_guard():
    """Unknown lut_impl values must refuse loudly at trace time."""
    from fastdepth_tpu.data.device_aug import _u8_to_unit

    with pytest.raises(ValueError, match="lut_impl"):
        _u8_to_unit(jnp.zeros((4,), jnp.uint8), lut_impl="mxu")
    with pytest.raises(ValueError, match="lut_impl"):
        _jitter_slot(jnp.zeros((1, 8, 3), jnp.uint8),
                     jnp.zeros((1, 256, 256), jnp.uint8),
                     jnp.zeros((1,), jnp.int32), lut_impl="take")


def test_contrast_gray_integer_formula_matches_f64():
    """(2s + n) // (2n) == int(s/n + 0.5) under f64 (the PIL
    ImageEnhance.Contrast mean) for every boundary-adjacent sum — the
    device computes the gray without f64 (TPU jit has no x64)."""
    n = 224 * 224
    sums = []
    for k in range(0, 256, 7):
        center = n * (2 * k - 1) // 2  # near the k-0.5 boundary
        sums.extend([center - 1, center, center + 1, n * k])
    sums = [s for s in sums if 0 <= s <= 255 * n]
    for s in sums:
        assert (2 * s + n) // (2 * n) == int(np.float64(s) / n + 0.5), s


def test_trainer_device_augment_step_equals_host_step(train_root):
    """One full jitted train step from raw frames + parameters == the
    step from host-preprocessed items: identical loss and identical
    updated parameters (the augmented tensors are bit-equal, so the
    whole grad/update pipeline must be too)."""
    from fastdepth_tpu.config import ModelConfig, TrainConfig
    from fastdepth_tpu.models import build
    from fastdepth_tpu.train import Trainer

    cfg = ModelConfig(
        encoder_channels=(4, 6, 8, 10, 12, 14, 16, 16, 16, 16, 16, 16, 20, 24),
        decoder_channels=(18, 14, 10, 6, 4))
    model = build(cfg)
    # independent param copies: the step donates its state buffers, so
    # two trainers must not share leaves
    params_np = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(0)))
    tc = TrainConfig(lr=0.05, momentum=0.9, weight_decay=1e-4)

    host = NYUDataset(train_root, split="train", seed=4)
    dev = NYUDataset(train_root, split="train", seed=4, device_augment=True)
    idxs = [0, 1, 2]
    rgb_h = np.stack([host[i][0] for i in idxs])
    depth_h = np.stack([host[i][1] for i in idxs])
    raw = _stack_items(dev, idxs)

    t_host = Trainer(model, jax.tree.map(jnp.asarray, params_np), tc)
    t_dev = Trainer(model, jax.tree.map(jnp.asarray, params_np), tc,
                    device_augment=True)
    s_h, loss_h = t_host._step(
        t_host.state, jnp.asarray(rgb_h), jnp.asarray(depth_h),
        jnp.float32(tc.lr))
    s_d, loss_d = t_dev._step(
        t_dev.state, *[jnp.asarray(a) for a in raw], jnp.float32(tc.lr))
    assert float(loss_h) == float(loss_d)
    for (ph, pd) in zip(jax.tree.leaves(s_h.params),
                        jax.tree.leaves(s_d.params)):
        np.testing.assert_array_equal(np.asarray(ph), np.asarray(pd))


def test_dataset_device_augment_guards(train_root):
    with pytest.raises(ValueError, match="targets train"):
        NYUDataset(train_root, split="val", device_augment=True)
    # no hue kernel on device: a hue-jitter dataset must refuse loudly
    ds = NYUDataset(train_root, split="train", device_augment=True)
    ds.color_jitter = T.ColorJitter(0.4, 0.4, 0.4, hue=0.2)
    with pytest.raises(ValueError, match="hue"):
        ds[0]
