"""Per-stage kernel selection — the XLA-world analogue of the reference's
AutoTVM tuning database (reference tvm_compile/tuning/*.log: best
per-layer kernel configs and times, SURVEY.md C12).

Instead of schedule search, the TPU framework has exactly two
implementations per decoder level — the XLA HLO path and the fused Pallas
kernel — plus dtype choices.  :func:`tune_decoder` times each
(stage, impl, dtype) on the attached chip and emits a JSON tuning record;
:func:`load_tuning` replays a record to pick the winning impl per stage.
Records are committed under ``tuning/`` like the reference's logs.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

import numpy as np


def _stage_shapes(cfg) -> List[Dict]:
    """Decoder stage IO shapes for a FastDepth config at 224x224."""
    enc = cfg.encoder_channels
    dec = cfg.decoder_channels
    h = 224 // 32
    shapes = []
    cin = enc[-1]
    for i, cout in enumerate(dec, start=1):
        shapes.append({"stage": i, "h": h, "w": h, "cin": cin, "cout": cout,
                       "skip": i in (2, 3, 4)})
        h *= 2
        cin = cout
    return shapes


def tune_decoder(
    cfg,
    *,
    batch: int = 4,
    dtypes=("bfloat16", "float32"),
    warmup: int = 2,
    calls: int = 20,
    out_path: Optional[str] = None,
) -> Dict:
    """Times XLA vs Pallas per decoder stage; returns (and optionally
    writes) the tuning record."""
    import jax
    import jax.numpy as jnp

    from fastdepth_tpu.engine.benchmark import time_pipelined
    from fastdepth_tpu.models import layers as L
    from fastdepth_tpu.ops import blocks as B
    from fastdepth_tpu.ops.pallas.fused_decoder import fused_decoder_stage

    rng = np.random.RandomState(0)
    records = []
    for spec in _stage_shapes(cfg):
        h, w, cin, cout = spec["h"], spec["w"], spec["cin"], spec["cout"]
        for dtype_name in dtypes:
            dtype = getattr(jnp, dtype_name)
            x = jnp.asarray(rng.rand(batch, h, w, cin), dtype)
            dw_w = jnp.asarray(rng.rand(5, 5, 1, cin) * 0.1, dtype)
            dw_b = jnp.asarray(rng.rand(cin) * 0.1, dtype)
            pw_w = jnp.asarray(rng.rand(1, 1, cin, cout) * 0.1, dtype)
            pw_b = jnp.asarray(rng.rand(cout) * 0.1, dtype)
            skip = (jnp.asarray(rng.rand(batch, 2 * h, 2 * w, cout), dtype)
                    if spec["skip"] else None)

            def xla_path(x, skip=skip):
                y = B.relu(B.depthwise_conv2d(x, dw_w, bias=dw_b))
                y = B.relu(B.conv2d(y, pw_w, bias=pw_b))
                y = B.upsample_nearest2x(y)
                return y + skip if skip is not None else y

            def pallas_path(x, skip=skip):
                return fused_decoder_stage(x, dw_w, dw_b, pw_w, pw_b, skip)

            rec = dict(spec, dtype=dtype_name, batch=batch)
            for name, fn in (("xla", xla_path), ("pallas", pallas_path)):
                try:
                    jfn = jax.jit(fn)
                    stats = time_pipelined(jfn, (x,), warmup=warmup, calls=calls)
                    rec[f"{name}_ms"] = round(stats["mean_s"] * 1e3, 4)
                except Exception as e:
                    rec[f"{name}_ms"] = None
                    rec[f"{name}_error"] = f"{type(e).__name__}"
            times = {k: rec[f"{k}_ms"] for k in ("xla", "pallas")
                     if rec.get(f"{k}_ms") is not None}
            rec["winner"] = min(times, key=times.get) if times else None
            records.append(rec)

    result = {
        "config": {"encoder_channels": list(cfg.encoder_channels),
                   "decoder_channels": list(cfg.decoder_channels)},
        "device": str(_device_kind()),
        "records": records,
    }
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
    return result


def _device_kind() -> str:
    import jax

    try:
        return jax.devices()[0].device_kind
    except Exception:
        return "unknown"


def load_tuning(path: str) -> Dict[int, str]:
    """Tuning record -> {stage: 'xla' | 'pallas'} winner map."""
    with open(path) as f:
        data = json.load(f)
    winners: Dict[int, str] = {}
    for rec in data["records"]:
        if rec.get("winner"):
            # prefer bf16 records when both dtypes present
            if rec["stage"] not in winners or rec["dtype"] == "bfloat16":
                winners[rec["stage"]] = rec["winner"]
    return winners
