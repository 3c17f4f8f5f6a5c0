"""Native (C++) preprocessing kernels vs numpy reference — bit identical."""

import numpy as np
import pytest

from fastdepth_tpu.data import native
from fastdepth_tpu.data.pipeline import ValPipeline


requires_native = pytest.mark.skipif(
    not native.available(), reason="libfdpreproc.so not built (make -C csrc)"
)


@requires_native
def test_gather_rgb_matches_numpy(rng):
    rgb = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    pipe = ValPipeline.create()
    ref = rgb[pipe.rows][:, pipe.cols].astype(np.float32) / 255.0
    got = native.gather_rgb_f32(rgb, pipe.rows, pipe.cols)
    np.testing.assert_array_equal(ref, got)


@requires_native
def test_gather_depth_matches_numpy(rng):
    depth = (rng.rand(480, 640) * 10).astype(np.float32)
    pipe = ValPipeline.create()
    ref = depth[pipe.rows][:, pipe.cols]
    got = native.gather_depth_f32(depth, pipe.rows, pipe.cols)
    np.testing.assert_array_equal(ref, got)


@requires_native
def test_chw_to_hwc_matches_numpy(rng):
    chw = (rng.rand(3, 48, 64) * 255).astype(np.uint8)
    np.testing.assert_array_equal(
        np.transpose(chw, (1, 2, 0)), native.chw_to_hwc_u8(chw)
    )


def test_numpy_fallback_used_when_lib_missing(monkeypatch, rng):
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    rgb = (rng.rand(10, 12, 3) * 255).astype(np.uint8)
    rows = np.arange(5, dtype=np.int64)
    cols = np.arange(6, dtype=np.int64)
    out = native.gather_rgb_f32(rgb, rows, cols)
    np.testing.assert_array_equal(out, rgb[:5, :6].astype(np.float32) / 255.0)
