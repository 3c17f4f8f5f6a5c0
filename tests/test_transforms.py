"""Transform parity: fused gather pipelines vs a faithful PIL/scipy
emulation of the reference's scipy.misc.imresize chain (reference
dataloaders/transforms.py:311-341 + nyu.py:26-59).  scipy.misc.imresize
is gone from modern scipy; PIL is the oracle (imresize wrapped PIL)."""

import numpy as np
import pytest
from PIL import Image

from fastdepth_tpu.data import transforms as T
from fastdepth_tpu.data.pipeline import TrainPipeline, TrainSample, ValPipeline


def pil_imresize(arr: np.ndarray, size) -> np.ndarray:
    """Oracle: scipy.misc.imresize(arr, size, 'nearest'[, mode='F']) —
    exactly what the reference Resize does (transforms.py:337-339)."""
    if arr.ndim == 2:
        im = Image.fromarray(arr.astype(np.float32), mode="F")
    else:
        im = Image.fromarray(arr)
    h, w = arr.shape[:2]
    if isinstance(size, (tuple, list)):
        target = (int(size[1]), int(size[0]))  # PIL (w, h)
    else:
        f = size / 100.0 if isinstance(size, (int, np.integer)) else float(size)
        target = (int(w * f), int(h * f))
    return np.array(im.resize(target, resample=Image.NEAREST))


@pytest.mark.parametrize("in_size,out_size", [(480, 250), (640, 333), (228, 224), (304, 224), (10, 7), (7, 10)])
def test_nearest_indices_match_pil(in_size, out_size, rng):
    img = (rng.rand(in_size, 8) * 255).astype(np.uint8)
    ref = np.array(Image.fromarray(img).resize((8, out_size), Image.NEAREST))
    rows = T.nearest_resize_indices(in_size, out_size)
    np.testing.assert_array_equal(ref, img[rows])


def test_resize_nearest_fraction_matches_oracle(rng):
    rgb = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    f = 250.0 / 480.0
    np.testing.assert_array_equal(pil_imresize(rgb, f), T.resize_nearest(rgb, f))


def test_resize_nearest_float_depth_matches_oracle(rng):
    depth = (rng.rand(480, 640) * 10).astype(np.float32)
    f = 250.0 / 480.0
    np.testing.assert_array_equal(pil_imresize(depth, f), T.resize_nearest(depth, f))


def test_val_pipeline_matches_stepwise_reference(rng):
    """Fused single-gather val geometry == Resize -> CenterCrop -> Resize
    done step by step through the PIL oracle (nyu.py:48-59)."""
    rgb = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    depth = (rng.rand(480, 640) * 10).astype(np.float32)

    def stepwise(img):
        img = pil_imresize(img, 250.0 / 480.0)
        img = T.center_crop(img, (228, 304))
        return pil_imresize(img, (224, 224))

    pipe = ValPipeline.create()
    np.testing.assert_array_equal(stepwise(rgb), pipe(rgb))
    np.testing.assert_array_equal(stepwise(depth), pipe(depth))


def test_val_pipeline_batch_equals_per_image(rng):
    imgs = (rng.rand(3, 480, 640, 3) * 255).astype(np.uint8)
    pipe = ValPipeline.create()
    batch = pipe.apply_batch(imgs)
    for i in range(3):
        np.testing.assert_array_equal(batch[i], pipe(imgs[i]))


@pytest.mark.parametrize("do_flip", [False, True])
def test_train_pipeline_matches_stepwise_reference(rng, do_flip):
    """Fused train geometry == the reference chain Resize(250/480) ->
    Rotate -> Resize(s) -> CenterCrop -> HFlip -> Resize(224)
    (nyu.py:33-41), rotation included."""
    rgb = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    depth = (rng.rand(480, 640) * 10).astype(np.float32)
    s = TrainSample(scale=1.23, angle=-3.7, do_flip=do_flip)

    def stepwise(img):
        img = pil_imresize(img, 250.0 / 480.0)
        img = T.rotate(img, s.angle)
        img = pil_imresize(img, s.scale)
        img = T.center_crop(img, (228, 304))
        img = T.horizontal_flip(img, s.do_flip)
        return pil_imresize(img, (224, 224))

    pipe = TrainPipeline()
    rgb_out, depth_out = pipe(rgb, depth / s.scale * s.scale, s)  # no jitter
    np.testing.assert_allclose(
        np.asarray(stepwise(rgb), np.float32) / 255.0, rgb_out, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(stepwise(depth / s.scale), np.float32), depth_out, atol=1e-6
    )


def pil_imresize_interp(arr: np.ndarray, size, interp: str) -> np.ndarray:
    """Oracle: scipy.misc.imresize(arr, size, interp[, 'F']) for the
    convolution modes (reference transforms.py:311-341 accepts
    bilinear/bicubic/lanczos; imresize mapped them to PIL resample)."""
    RESAMPLE = {"bilinear": Image.BILINEAR, "bicubic": Image.BICUBIC,
                "cubic": Image.BICUBIC, "lanczos": Image.LANCZOS}
    if arr.ndim == 2:
        im = Image.fromarray(arr.astype(np.float32), mode="F")
    else:
        im = Image.fromarray(arr)
    h, w = arr.shape[:2]
    if isinstance(size, (tuple, list)):
        target = (int(size[1]), int(size[0]))
    else:
        f = size / 100.0 if isinstance(size, (int, np.integer)) else float(size)
        target = (int(w * f), int(h * f))
    return np.array(im.resize(target, resample=RESAMPLE[interp]))


INTERPS = ["bilinear", "bicubic", "lanczos"]


@pytest.mark.parametrize("interp", INTERPS)
@pytest.mark.parametrize("size", [250.0 / 480.0, (224, 224), (228, 304),
                                  1.5, 50, (480, 640), (3, 5)])
def test_resize_interp_uint8_rgb_matches_pil(interp, size, rng):
    rgb = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    ref = pil_imresize_interp(rgb, size, interp)
    got = T.resize(rgb, size, interp)
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(ref, got, err_msg=f"{interp} {size}")


@pytest.mark.parametrize("interp", INTERPS)
@pytest.mark.parametrize("size", [250.0 / 480.0, (224, 224), 1.3, (7, 300)])
def test_resize_interp_float_depth_matches_pil(interp, size, rng):
    depth = (rng.rand(480, 640) * 10).astype(np.float32)
    ref = pil_imresize_interp(depth, size, interp)
    got = T.resize(depth, size, interp, mode="F")
    assert got.dtype == np.float32
    np.testing.assert_array_equal(ref, got, err_msg=f"{interp} {size}")


@pytest.mark.parametrize("interp", INTERPS + ["nearest"])
def test_resize_interp_size_sweep_matches_pil(interp):
    """Sweep random (in, out) size pairs x dtypes against Pillow — the
    nearest-mode 22k-pair harness generalized to every interp mode."""
    # fixed per-interp seed: hash() is per-process-randomized and made
    # this sweep explore different pairs per run (caught one real 1-ulp
    # bug — pairwise vs sequential coefficient normalization — in review)
    rng = np.random.RandomState(
        {"nearest": 11, "bilinear": 22, "bicubic": 33, "lanczos": 44}[interp])
    for trial in range(120):
        ih, iw = rng.randint(1, 120, 2)
        oh, ow = rng.randint(1, 120, 2)
        rgb = (rng.rand(ih, iw, 3) * 255).astype(np.uint8)
        dep = (rng.rand(ih, iw) * 8 - 2).astype(np.float32)
        if interp == "nearest":
            np.testing.assert_array_equal(
                pil_imresize(rgb, (oh, ow)), T.resize(rgb, (oh, ow), interp),
                err_msg=f"rgb {ih}x{iw}->{oh}x{ow}")
            np.testing.assert_array_equal(
                pil_imresize(dep, (oh, ow)),
                T.resize(dep, (oh, ow), interp, mode="F"),
                err_msg=f"F {ih}x{iw}->{oh}x{ow}")
        else:
            np.testing.assert_array_equal(
                pil_imresize_interp(rgb, (oh, ow), interp),
                T.resize(rgb, (oh, ow), interp),
                err_msg=f"rgb {interp} {ih}x{iw}->{oh}x{ow}")
            np.testing.assert_array_equal(
                pil_imresize_interp(dep, (oh, ow), interp),
                T.resize(dep, (oh, ow), interp, mode="F"),
                err_msg=f"F {interp} {ih}x{iw}->{oh}x{ow}")


def test_resize_class_mirrors_reference_surface(rng):
    """Reference transforms.py:311-341: Resize class dispatches 3-D vs 2-D
    (mode 'F'), accepts float/int/tuple sizes, rejects other ranks."""
    rgb = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    dep = (rng.rand(48, 64) * 10).astype(np.float32)
    r = T.Resize(0.5, "bilinear")
    np.testing.assert_array_equal(r(rgb), pil_imresize_interp(rgb, 0.5, "bilinear"))
    np.testing.assert_array_equal(r(dep), pil_imresize_interp(dep, 0.5, "bilinear"))
    rn = T.Resize((24, 24))
    np.testing.assert_array_equal(rn(rgb), pil_imresize(rgb, (24, 24)))
    with pytest.raises(RuntimeError, match="2 or 3 dimensions"):
        T.Resize(0.5)(rng.rand(2, 2, 2, 2))
    with pytest.raises(ValueError, match="unknown interpolation"):
        T.resize(rgb, 0.5, "area")


def test_resize_interp_identity_and_bytescale(rng):
    """Same-size convolution resize is a copy (PIL skips both passes)
    that must NOT alias the input; non-uint8 3-D input rides scipy
    toimage's bytescale normalization."""
    rgb = (rng.rand(20, 30, 3) * 255).astype(np.uint8)
    out = T.resize(rgb, (20, 30), "lanczos")
    np.testing.assert_array_equal(out, rgb)
    out[0, 0, 0] ^= 1  # in-place edit must not corrupt the source
    assert rgb[0, 0, 0] != out[0, 0, 0]
    dep = rng.rand(20, 30).astype(np.float32)
    out_f = T.resize(dep, (20, 30), "bilinear", mode="F")
    np.testing.assert_array_equal(out_f, dep)
    assert out_f is not dep and out_f.base is not dep
    f3 = rng.rand(20, 30, 3).astype(np.float32) * 4 - 1
    scaled = T._bytescale(f3)
    np.testing.assert_array_equal(
        T.resize(f3, (10, 15), "bilinear"),
        pil_imresize_interp(scaled, (10, 15), "bilinear"))


def test_resize_interp_2d_uint8_takes_pil_L_path(rng):
    """scipy toimage routed 2-D uint8 through PIL mode 'L' — the
    quantized fixed-point path returning uint8 (mode='F' only when the
    caller asks, as the reference Resize does for depth)."""
    g = (rng.rand(48, 64) * 255).astype(np.uint8)
    for interp in INTERPS:
        ref = np.array(Image.fromarray(g, mode="L").resize(
            (24, 20), {"bilinear": Image.BILINEAR, "bicubic": Image.BICUBIC,
                       "lanczos": Image.LANCZOS}[interp]))
        got = T.resize(g, (20, 24), interp)
        assert got.dtype == np.uint8
        np.testing.assert_array_equal(ref, got, err_msg=interp)
    # explicit mode='F' still forces the float path
    assert T.resize(g, (20, 24), "bilinear", mode="F").dtype == np.float32


def test_rotate_nearest_indices_match_scipy(rng):
    """rotate_nearest_indices == scipy.ndimage.rotate of an index plane
    (the exact-replication contract: degree-exact trig, scipy's
    accumulation order, order-0 rounding, [0, len-1] constant-mode
    bounds).  Sweep includes the NYU range, exact .5-tie angles (45/135
    multiples flip under any other float association), axis swaps, and
    degenerate 1-pixel rows/cols."""
    from scipy import ndimage

    angles = (list(np.linspace(-10, 10, 21))
              + [0.0, 45.0, -45.0, 90.0, -90.0, 135.0, -135.0, 180.0,
                 4.999999, -5.000001, 179.9999, 0.0001]
              + list(rng.uniform(-180, 180, 20)))
    shapes = [(25, 33), (10, 10), (7, 13), (1, 5), (5, 1), (2, 2)]
    for h, w in shapes:
        plane = np.arange(h * w, dtype=np.int64).reshape(h, w)
        for a in angles:
            want = ndimage.rotate(plane, a, reshape=False, prefilter=False,
                                  order=0, cval=-1)
            np.testing.assert_array_equal(
                want, T.rotate_nearest_indices(h, w, a), err_msg=f"{h}x{w} @ {a}")
    # one full-size NYU-intermediate case
    plane = np.arange(250 * 333, dtype=np.int64).reshape(250, 333)
    for a in (-5.0, -2.3, 0.0, 1.7, 5.0):
        want = ndimage.rotate(plane, a, reshape=False, prefilter=False,
                              order=0, cval=-1)
        np.testing.assert_array_equal(
            want, T.rotate_nearest_indices(250, 333, a))


def test_host_pipeline_artifact_consistent():
    """docs/host_pipeline_r3.json (scripts/bench_host_pipeline.py): the
    committed numbers must carry the exactness gate and a real speedup —
    a regressed composed path should fail here, not silently ship."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                        "host_pipeline_r3.json")
    with open(path) as f:
        data = json.load(f)
    assert "bit-equal" in data["exactness"]
    assert data["speedup_geometry"] >= 2.0
    assert data["speedup_full"] >= 1.5
    assert data["composed_geometry_ms"] < data["stepwise_geometry_ms"]
    assert data["rotate_index_map_ms"] < data["scipy_rotate_4ch_ms"]


def test_enhance_lut_forms_match_pil_direct(rng):
    """adjust_{brightness,contrast}_fast (the LUT forms ColorJitter
    applies) == the PIL-direct functions, exactly, across factors
    spanning the NYU jitter range and beyond (incl. extrapolating >1
    and degenerate 0)."""
    img = (rng.rand(96, 96, 3) * 255).astype(np.uint8)
    edge = np.zeros((4, 4, 3), np.uint8)
    edge[..., 0] = 255  # saturated channel corners
    for f in (0.0, 0.6, 0.83, 1.0, 1.17, 1.4, 2.0):
        for im in (img, edge):
            np.testing.assert_array_equal(
                T.adjust_brightness(im, f), T.adjust_brightness_fast(im, f))
            np.testing.assert_array_equal(
                T.adjust_contrast(im, f), T.adjust_contrast_fast(im, f))


def test_color_jitter_deterministic_and_valid(rng):
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    cj = T.ColorJitter(0.4, 0.4, 0.4)
    out1 = cj(img, np.random.RandomState(7))
    out2 = cj(img, np.random.RandomState(7))
    np.testing.assert_array_equal(out1, out2)
    assert out1.dtype == np.uint8 and out1.shape == img.shape
    # different seed -> (almost surely) different output
    out3 = cj(img, np.random.RandomState(8))
    assert not np.array_equal(out1, out3)


def test_color_jitter_order_shuffle_uses_reference_rng_protocol():
    """The reference draws factors then shuffles the op list with the same
    RNG (transforms.py:552-573); replicating the draw sequence matters for
    seeded reproducibility."""
    img = np.full((8, 8, 3), 128, np.uint8)
    cj = T.ColorJitter(0.4, 0.4, 0.4, 0.1)
    out = cj(img, np.random.RandomState(0))
    assert out.shape == img.shape


def test_center_crop_bankers_rounding():
    # (333 - 304) / 2 = 14.5 -> round() gives 14 (banker's), not 15
    i, j = T.center_crop_offsets(250, 333, 228, 304)
    assert (i, j) == (11, 14)


def test_gamma_matches_pil(rng):
    from PIL import Image

    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    for gamma in (0.5, 1.0, 2.2):
        # PIL-free reference formula (reference transforms.py:139-170)
        ref = np.clip(255.0 * ((img / 255.0) ** gamma), 0, 255).astype(np.uint8)
        got = T.adjust_gamma(img, gamma)
        assert np.abs(ref.astype(int) - got.astype(int)).max() <= 1


def test_bottom_crop_and_crop(rng):
    img = rng.rand(10, 12, 3)
    bc = T.bottom_crop(img, (4, 6))
    np.testing.assert_array_equal(bc, img[6:10, 3:9])
    c = T.crop(img, 1, 2, 3, 4)
    np.testing.assert_array_equal(c, img[1:4, 2:6])


def test_class_surfaces_mirror_reference(rng):
    """Every reference transform object exists as a class with the same
    __init__ signature and composes through Compose (reference
    transforms.py:173-622); each must equal its functional form."""
    img = (rng.rand(40, 50, 3) * 255).astype(np.uint8)
    dep = (rng.rand(40, 50) * 10).astype(np.float32)

    np.testing.assert_array_equal(T.ToTensor()(img),
                                  np.asarray(img, np.float32))
    np.testing.assert_array_equal(T.Rotate(-4.5)(dep), T.rotate(dep, -4.5))
    np.testing.assert_array_equal(T.CenterCrop((20, 30))(img),
                                  T.center_crop(img, (20, 30)))
    np.testing.assert_array_equal(T.BottomCrop((20, 30))(img),
                                  T.bottom_crop(img, (20, 30)))
    np.testing.assert_array_equal(T.HorizontalFlip(True)(img),
                                  T.horizontal_flip(img, True))
    np.testing.assert_array_equal(T.Crop(2, 3, 10, 20)(img),
                                  T.crop(img, 2, 3, 10, 20))
    f = img.astype(np.float32)
    np.testing.assert_allclose(
        T.NormalizeNumpyArray([1, 2, 3], [4, 5, 6])(f),
        T.normalize(f, [1, 2, 3], [4, 5, 6]))
    np.testing.assert_allclose(
        T.NormalizeTensor([1, 2, 3], [4, 5, 6])(f),
        T.normalize(f, [1, 2, 3], [4, 5, 6]))

    # the reference val chain, spelled with the class API, end to end
    chain = T.Compose([
        T.Resize(250.0 / 480.0),
        T.CenterCrop((228, 304)),
        T.Resize((224, 224)),
        T.ToTensor(),
    ])
    big = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    np.testing.assert_array_equal(
        chain(big), np.asarray(ValPipeline.create()(big), np.float32))

    with pytest.raises(ValueError, match="outside"):
        T.Crop(35, 0, 10, 10)(img)
    with pytest.raises(RuntimeError, match="2 or 3"):
        T.ToTensor()(rng.rand(2, 2, 2, 2))
    with pytest.raises(TypeError, match="should be ndarray"):
        T.ToTensor()([1, 2, 3])  # reference transforms.py:210-211
    # int size = square crop (reference transforms.py:353-357, :416-420)
    assert T.CenterCrop(8).size == (8, 8)
    assert T.BottomCrop(8).size == (8, 8)
    np.testing.assert_array_equal(
        T.CenterCrop(8)(img), T.CenterCrop((8, 8))(img))


def test_compose_lambda_normalize(rng):
    img = rng.rand(4, 4, 3).astype(np.float32)
    pipe = T.Compose([T.Lambda(lambda x: x * 2.0)])
    np.testing.assert_allclose(pipe(img), img * 2.0)
    out = T.normalize(img, [0.5, 0.5, 0.5], [0.25, 0.25, 0.25])
    np.testing.assert_allclose(out, (img - 0.5) / 0.25, rtol=1e-6)


def test_to_nhwc_tensor(rng):
    d = rng.rand(4, 4)
    out = T.to_nhwc_tensor(d)
    assert out.shape == (4, 4, 1) and out.dtype == np.float32


def test_adjust_hue_negative_factor():
    """Negative hue factors must wrap on the uint8 H channel (NumPy 2
    made np.uint8(negative) an OverflowError — caught in review): a
    -1/3 shift moves red to blue, +1/3 moves red to green."""
    img = np.zeros((4, 4, 3), np.uint8)
    img[..., 0] = 200  # saturated red
    g = T.adjust_hue(img, 1.0 / 3.0)
    b = T.adjust_hue(img, -1.0 / 3.0)
    assert g[0, 0].argmax() == 1, g[0, 0]
    assert b[0, 0].argmax() == 2, b[0, 0]
    # identity at factor 0
    np.testing.assert_array_equal(T.adjust_hue(img, 0.0), img)


def test_train_pipeline_rejects_float_jitter(rng):
    """ColorJitter is defined on uint8 frames only (PIL-exact enhance
    LUTs; the reference jitters uint8 PIL images) — a float frame with
    jitter must fail loudly up front, not crash with an opaque dtype
    error from inside PIL or the native lib (review finding r4)."""
    import pytest

    pipe = TrainPipeline()
    s = TrainSample(scale=1.2, angle=2.0, do_flip=False)
    rgb_f32 = rng.rand(480, 640, 3).astype(np.float32) * 255.0
    depth = rng.rand(480, 640).astype(np.float32) * 5.0
    jitter = T.ColorJitter(0.4, 0.4, 0.4)
    with pytest.raises(ValueError, match="uint8"):
        pipe(rgb_f32, depth, s, color_jitter=jitter,
             rng=np.random.RandomState(0))
    # the float path WITHOUT jitter stays first-class (value-preserving)
    out_rgb, out_depth = pipe(rgb_f32, depth, s)
    assert out_rgb.shape == (224, 224, 3) and out_depth.shape == (224, 224)
