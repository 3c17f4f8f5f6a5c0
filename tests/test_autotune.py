"""Autotune record production/consumption (CPU; pallas timed in
interpret-incompatible compiled mode is skipped gracefully on CPU —
the record schema and winner logic are what's under test)."""

import json

from fastdepth_tpu.config import ModelConfig
from fastdepth_tpu.engine.autotune import _stage_shapes, load_tuning

TINY_ENC = (4, 6, 8, 10, 12, 14, 16, 16, 16, 16, 16, 16, 20, 24)
TINY_DEC = (18, 14, 10, 6, 4)


def test_stage_shapes_follow_decoder_topology():
    cfg = ModelConfig(encoder_channels=TINY_ENC, decoder_channels=TINY_DEC)
    shapes = _stage_shapes(cfg)
    assert [s["cin"] for s in shapes] == [24, 18, 14, 10, 6]
    assert [s["cout"] for s in shapes] == [18, 14, 10, 6, 4]
    assert [s["h"] for s in shapes] == [7, 14, 28, 56, 112]
    assert [s["skip"] for s in shapes] == [False, True, True, True, False]


def test_load_tuning_prefers_bf16(tmp_path):
    rec = {
        "config": {}, "device": "x",
        "records": [
            {"stage": 1, "dtype": "float32", "winner": "xla"},
            {"stage": 1, "dtype": "bfloat16", "winner": "pallas"},
            {"stage": 2, "dtype": "float32", "winner": "xla"},
        ],
    }
    p = tmp_path / "t.json"
    p.write_text(json.dumps(rec))
    winners = load_tuning(str(p))
    assert winners == {1: "pallas", 2: "xla"}


def test_load_tuning_selects_by_dtype(tmp_path):
    """Winners are measured per dtype (the committed pruned record flips
    stages 2/5 between fp32 and bf16): dtype= must return that dtype's
    winners, falling back to whatever was measured for uncovered
    stages."""
    import numpy as np

    rec = {
        "config": {}, "device": "x",
        "records": [
            {"stage": 1, "dtype": "float32", "winner": "xla"},
            {"stage": 1, "dtype": "bfloat16", "winner": "pallas"},
            {"stage": 2, "dtype": "bfloat16", "winner": "pallas"},
        ],
    }
    p = tmp_path / "t.json"
    p.write_text(json.dumps(rec))
    assert load_tuning(str(p), dtype="float32") == {1: "xla", 2: "pallas"}
    assert load_tuning(str(p), dtype="bfloat16") == {1: "pallas", 2: "pallas"}
    # dtype objects normalize through np.dtype (ml_dtypes bfloat16 too)
    assert load_tuning(str(p), dtype=np.float32) == {1: "xla", 2: "pallas"}


def test_pick_apply_mixed_dispatches_winner_map_by_dtype(tmp_path):
    """_pick_apply('mixed', tuning=<path>) must run each compute dtype on
    ITS OWN tuned winner map — the fp32 row of a sweep must not silently
    run the bf16 winners (review finding r4)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fastdepth_tpu.engine.aot import _pick_apply
    from fastdepth_tpu.models import build

    rec = {
        "config": {}, "device": "x",
        "records": [
            {"stage": s, "dtype": d, "winner": w}
            for s in (1, 2, 3, 4, 5)
            for d, w in (("float32", "xla"), ("bfloat16", "xla"))
        ],
    }
    # make one bf16-only stage 'pallas': in interpret mode both impls are
    # value-identical, so assert dispatch via the traced jaxpr instead
    rec["records"][3]["winner"] = "pallas"  # stage 2, bfloat16
    p = tmp_path / "t.json"
    p.write_text(json.dumps(rec))

    cfg = ModelConfig(encoder_channels=TINY_ENC, decoder_channels=TINY_DEC)
    model = build(cfg)
    params = model.fold(model.init(jax.random.PRNGKey(0)))
    fwd = _pick_apply(model, params, "mixed", tuning=str(p))
    x32 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    jaxpr32 = str(jax.make_jaxpr(fwd)(params, x32))
    params16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x16 = x32.astype(jnp.bfloat16)
    jaxpr16 = str(jax.make_jaxpr(fwd)(params16, x16))
    # pallas stages trace to pallas_call / custom kernel primitives
    assert "pallas" not in jaxpr32
    assert "pallas" in jaxpr16


def test_pick_apply_mixed_rejects_unsupported_family():
    """'mixed' runs the fused-stage kernels (nnconv5dw skip-add only):
    an unsupported family must be refused up front with a clear error,
    not crash mid-sweep (frontier emitted guaranteed-FAILED rows)."""
    import pytest

    from fastdepth_tpu.engine.aot import _pick_apply
    from fastdepth_tpu.models import build

    cfg = ModelConfig(encoder_channels=TINY_ENC, decoder_channels=TINY_DEC,
                      skip=None)
    model = build(cfg)
    params = model.fold(model.init(__import__("jax").random.PRNGKey(0)))
    with pytest.raises(ValueError, match="skip-add"):
        _pick_apply(model, params, "mixed", tuning={1: "xla"})


def test_frontier_cli_smoke(tmp_path):
    """cli.frontier end-to-end on CPU: one model, tiny batches, both
    impls; writes the JSON + markdown artifact pair."""
    import json as _json

    from fastdepth_tpu.cli.frontier import main

    out = str(tmp_path / "frontier")
    rows = main([
        "--models", "mobilenet-nnconv5dw-skipadd-pruned",
        "--batches", "2", "--dtypes", "float32", "--calls", "2",
        "--out", out,
    ])
    assert {r["impl"] for r in rows} == {"xla", "opt"}
    data = _json.loads((tmp_path / "frontier.json").read_text())
    assert data["rows"] and data["rows"][0]["macs_g"] > 0.3
    md = (tmp_path / "frontier.md").read_text()
    assert "| model | dtype | batch | impl |" in md


def test_autotune_cli_model_configs():
    """The 4 released model names resolve to valid configs with the
    right decoder families (reference tuning-log names)."""
    from fastdepth_tpu.cli.autotune import MODEL_CONFIGS, config_for

    assert len(MODEL_CONFIGS) == 4
    pruned = config_for("mobilenet-nnconv5dw-skipadd-pruned")
    assert pruned.decoder_channels == (200, 256, 120, 56, 16)
    plain = config_for("mobilenet-nnconv5")
    assert not plain.decoder_depthwise and plain.skip is None


def test_committed_records_load_and_cover_every_stage():
    """The committed v5e tuning records (all 4 released model configs)
    parse through load_tuning with a winner for every decoder stage, and
    carry encoder records for every conv op — the breadth of the
    reference's AutoTVM DB (reference tvm_compile/tuning/, 8 logs)."""
    import glob
    import os

    files = sorted(glob.glob(os.path.join("tuning", "tpuv5lite.*.json")))
    assert len(files) == 4, files
    for f in files:
        winners = load_tuning(f)
        assert set(winners) == {1, 2, 3, 4, 5}, (f, winners)
        assert set(winners.values()) <= {"xla", "pallas"}
        rec = json.load(open(f))
        enc = rec["encoder_records"]
        # stem + 13 x (dw, pw) ops x 2 dtypes
        assert len(enc) == 27 * 2, f
        assert all(r["xla_ms"] is not None for r in enc), f
        # the encoder half is data-only: the record must SAY so, since
        # nothing at runtime consumes it (XLA is the only encoder impl)
        assert rec["encoder_records_note"].startswith("informational"), f


def test_cli_unknown_model_fails_fast(tmp_path):
    """Typos in --models must fail BEFORE any minutes-long tuning/sweep
    work, naming the valid choices."""
    import pytest

    from fastdepth_tpu.cli.autotune import main as autotune_main
    from fastdepth_tpu.cli.frontier import main as frontier_main

    with pytest.raises(SystemExit) as e:
        autotune_main(["--models", "nope", "--out", str(tmp_path)])
    assert "unknown model" in str(e.value)
    with pytest.raises(SystemExit) as e:
        frontier_main(["--models", "nope", "--out", str(tmp_path / "f")])
    assert "unknown model" in str(e.value)


def test_stage_shapes_concat_widens_downstream_cin():
    """skip='concat' widens the NEXT stage's input by the tap width
    (models/fused.py:185-186) — timing the un-widened conv would measure
    a layer the model never runs; skip='add' keeps the old channel flow."""
    import dataclasses

    cfg_cat = dataclasses.replace(
        ModelConfig(encoder_channels=TINY_ENC, decoder_channels=TINY_DEC),
        skip="concat")
    shapes = _stage_shapes(cfg_cat)
    taps = {2: TINY_ENC[5], 3: TINY_ENC[3], 4: TINY_ENC[1]}  # 14, 10, 6
    # stage i+1 cin = stage i cout + tap_i for the skip stages
    assert [s["cin"] for s in shapes] == [
        24, 18, 14 + taps[2], 10 + taps[3], 6 + taps[4]]
    assert [s.get("tap") for s in shapes] == [None, 14, 10, 6, None]
    assert all(s.get("skip_mode") == "concat" for s in shapes if s["skip"])

    cfg_none = dataclasses.replace(cfg_cat, skip=None)
    assert all(not s["skip"] for s in _stage_shapes(cfg_none))
