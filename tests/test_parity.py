"""Published-numbers parity — gated on real artifacts.

Asserts the README table row (RMSE 0.604 m / delta1 0.771, reference
README.md:136) and the deploy/data/pred.npy golden regression via
cli/parity.py when a released checkpoint + NYU val set are present
(env FASTDEPTH_CKPT / FASTDEPTH_DATA); skips loudly otherwise — this
sandbox has neither (docs/parity_runbook.md has the one command to run
on a real host)."""

import os

import pytest

CKPT = os.environ.get("FASTDEPTH_CKPT", "../results/mobilenet-nnconv5dw-skipadd-pruned.pth.tar")
DATA = os.environ.get("FASTDEPTH_DATA", "../data")
GOLDEN = os.environ.get(
    "FASTDEPTH_GOLDEN", os.path.join("/root", "reference", "deploy", "data"))

_have_artifacts = (
    os.path.isfile(CKPT) and os.path.isdir(os.path.join(DATA, "nyudepthv2", "val"))
)


@pytest.mark.skipif(
    not _have_artifacts,
    reason=(
        "PARITY ARTIFACTS MISSING: needs a released .pth.tar (FASTDEPTH_CKPT) "
        "and the NYU val set (FASTDEPTH_DATA/nyudepthv2/val). "
        "See docs/parity_runbook.md for download commands; run "
        "`python -m fastdepth_tpu.cli.parity` on a host that has them."
    ),
)
def test_published_table_parity():
    from fastdepth_tpu.cli.parity import main

    argv = ["--evaluate", CKPT, "--data-root", DATA]
    if os.path.isfile(os.path.join(GOLDEN, "pred.npy")):
        argv += ["--golden-dir", GOLDEN]
    assert main(argv) == 0


def test_parity_cli_skips_loudly(tmp_path, capsys):
    """Without artifacts the harness exits 2 with download pointers — it
    must never silently pass."""
    from fastdepth_tpu.cli.parity import main

    rc = main(["--evaluate", str(tmp_path / "nope.pth.tar"),
               "--data-root", str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 2
    assert "PARITY SKIPPED" in out and "parity_runbook" in out


def test_parity_expected_row_inference():
    from fastdepth_tpu.cli.parity import PUBLISHED, _expected_for, parse_args

    args = parse_args(["--evaluate", "x.npz"])
    row = _expected_for("results/mobilenet-nnconv5dw-skipadd-pruned.pth.tar", args)
    assert row == PUBLISHED["mobilenet-nnconv5dw-skipadd-pruned"]
    assert _expected_for("some-unknown-model.pth.tar", args) is None
    args = parse_args(["--evaluate", "x.npz", "--expected-rmse", "0.5",
                       "--expected-delta1", "0.8"])
    assert _expected_for("anything", args) == {"rmse_m": 0.5, "delta1": 0.8}


def test_normalize_golden_rgb_no_double_division():
    """The reference's golden rgb.npy is already float [0,1]
    (deploy/tx2_run_tvm.py:28-33 feeds it with no /255) — it must NOT be
    divided again; raw uint8-range inputs must be."""
    import numpy as np

    from fastdepth_tpu.cli.parity import normalize_golden_rgb

    pre = np.random.RandomState(0).rand(8, 8, 3)  # float64 [0,1]
    np.testing.assert_allclose(normalize_golden_rgb(pre), pre.astype(np.float32))
    raw = (pre * 255).astype(np.uint8)
    np.testing.assert_allclose(normalize_golden_rgb(raw), raw / 255.0)
    rawf = (pre * 255).astype(np.float32)  # uint8-range float
    np.testing.assert_allclose(normalize_golden_rgb(rawf), rawf / 255.0)


def test_normalize_golden_rgb_explicit_modes():
    """--golden-prenormalized yes/no overrides the auto heuristic (the
    ambiguous case: a raw [0,255] float frame of a dark scene)."""
    import numpy as np

    from fastdepth_tpu.cli.parity import normalize_golden_rgb

    dark_raw = np.full((4, 4, 3), 1.5, np.float32)  # raw [0,255], max<=2
    np.testing.assert_allclose(
        normalize_golden_rgb(dark_raw, mode="no"), dark_raw / 255.0)
    np.testing.assert_allclose(
        normalize_golden_rgb(dark_raw, mode="yes"), dark_raw)
    msgs = []
    normalize_golden_rgb(dark_raw, mode="auto", log=msgs.append)
    assert "pre-normalized" in msgs[0]  # auto decides (and says so)
