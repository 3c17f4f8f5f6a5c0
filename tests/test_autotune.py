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
