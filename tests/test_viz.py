"""Visualization tests (reference utils.py:37-83 semantics)."""

import numpy as np

from fastdepth_tpu import viz


def test_colored_depthmap_range(rng):
    d = rng.rand(8, 8).astype(np.float32)
    out = viz.colored_depthmap(d)
    assert out.shape == (8, 8, 3)
    assert out.min() >= 0 and out.max() <= 255


def test_merge_into_row_layout(rng):
    rgb = rng.rand(8, 8, 3).astype(np.float32)
    tgt = rng.rand(8, 8, 1).astype(np.float32) + 0.5
    pred = rng.rand(8, 8, 1).astype(np.float32) + 0.5
    row = viz.merge_into_row(rgb, tgt, pred)
    assert row.shape == (8, 24, 3)  # rgb | gt | pred


def test_merge_into_row_with_gt_layout(rng):
    rgb = rng.rand(8, 8, 3).astype(np.float32)
    d = rng.rand(8, 8).astype(np.float32) + 0.5
    row = viz.merge_into_row_with_gt(rgb, d, d, d)
    assert row.shape == (8, 32, 3)


def test_add_row_and_save(tmp_path, rng):
    a = (rng.rand(4, 12, 3) * 255).astype(np.float32)
    stacked = viz.add_row(a, a)
    assert stacked.shape == (8, 12, 3)
    path = str(tmp_path / "x.png")
    viz.save_image(stacked, path)
    from PIL import Image

    assert Image.open(path).size == (12, 8)


def test_constant_depth_map_renders_without_nan():
    """d_min == d_max (untrained/constant prediction) must not divide by
    zero — the strip renders as a flat color, not NaNs."""
    import numpy as np

    from fastdepth_tpu.viz import colored_depthmap, merge_into_row

    flat = np.full((8, 8), 3.0, np.float32)
    out = colored_depthmap(flat)
    assert np.all(np.isfinite(out))
    row = merge_into_row(np.zeros((8, 8, 3), np.uint8), flat, flat)
    assert np.all(np.isfinite(row))
