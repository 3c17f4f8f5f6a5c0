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
    """Decoder stage IO shapes for a FastDepth config at 224x224.

    Skip semantics follow the real forward (models/fused.py:35,185-186):
    stages 2/3/4 combine encoder taps x3/x2/x1 (= enc[5]/enc[3]/enc[1]
    channels) after their upsample.  For skip='add' the tap width equals
    the stage's cout (the add constraint) and channel flow is unchanged;
    for skip='concat' the NEXT stage's cin widens to cout + tap — timing
    the un-widened conv would measure a layer the model never runs."""
    enc = cfg.encoder_channels
    dec = cfg.decoder_channels
    taps = {2: enc[5], 3: enc[3], 4: enc[1]}  # x3/x2/x1 tap widths
    h = 224 // 32
    shapes = []
    cin = enc[-1]
    for i, cout in enumerate(dec, start=1):
        has_skip = cfg.skip is not None and i in (2, 3, 4)
        spec = {"stage": i, "h": h, "w": h, "cin": cin, "cout": cout,
                "skip": has_skip}
        if has_skip:
            spec["skip_mode"] = cfg.skip
            spec["tap"] = taps[i]
        shapes.append(spec)
        h *= 2
        cin = cout + (taps[i] if has_skip and cfg.skip == "concat" else 0)
    return shapes


def _encoder_op_shapes(cfg) -> List[Dict]:
    """Per-op encoder shapes at 224x224 — every conv the reference's
    AutoTVM logs cover (stem + dw/pw per block, reference
    tvm_compile/tuning/*.log tasks; strides from MOBILENET_STRIDES)."""
    from fastdepth_tpu.config import MOBILENET_STRIDES

    enc = cfg.encoder_channels
    shapes = [{"op": "stem", "h": 224, "w": 224, "cin": cfg.in_channels,
               "cout": enc[0], "k": 3, "stride": 2}]
    h = 112
    cin = enc[0]
    for i in range(1, 14):
        s = MOBILENET_STRIDES[i - 1]
        shapes.append({"op": f"conv{i}.dw", "h": h, "w": h, "cin": cin,
                       "cout": cin, "k": 3, "stride": s})
        h //= s
        shapes.append({"op": f"conv{i}.pw", "h": h, "w": h, "cin": cin,
                       "cout": enc[i], "k": 1, "stride": 1})
        cin = enc[i]
    return shapes


def tune_encoder(
    cfg,
    *,
    batch: int = 32,
    dtypes=("bfloat16", "float32"),
    warmup: int = 2,
    calls: int = 20,
) -> List[Dict]:
    """Per-op XLA timings for every encoder conv (the reference tunes
    every conv task per model; there is no Pallas encoder kernel — XLA's
    fused NHWC conv stack is the measured production path)."""
    import jax
    import jax.numpy as jnp

    from fastdepth_tpu.engine.benchmark import time_pipelined
    from fastdepth_tpu.ops import blocks as B

    rng = np.random.RandomState(0)
    records = []
    for spec in _encoder_op_shapes(cfg):
        h, w, cin, cout, k, s = (spec[x] for x in ("h", "w", "cin", "cout", "k", "stride"))
        depthwise = spec["op"].endswith(".dw")
        for dtype_name in dtypes:
            dtype = getattr(jnp, dtype_name)
            x = jnp.asarray(rng.rand(batch, h, w, cin), dtype)
            wshape = (k, k, 1, cin) if depthwise else (k, k, cin, cout)
            wgt = jnp.asarray(rng.rand(*wshape) * 0.1, dtype)
            b = jnp.asarray(rng.rand(cout) * 0.1, dtype)

            if depthwise:
                fn = lambda x, wgt=wgt, b=b, s=s: B.relu6(
                    B.depthwise_conv2d(x, wgt, stride=s, bias=b))
            else:
                fn = lambda x, wgt=wgt, b=b, s=s: B.relu6(
                    B.conv2d(x, wgt, stride=s, bias=b))
            rec = dict(spec, dtype=dtype_name, batch=batch)
            try:
                stats = time_pipelined(jax.jit(fn), (x,), warmup=warmup, calls=calls)
                rec["xla_ms"] = round(stats["mean_s"] * 1e3, 4)
            except Exception as e:
                rec["xla_ms"] = None
                rec["xla_error"] = f"{type(e).__name__}"
            rec["winner"] = "xla" if rec["xla_ms"] is not None else None
            records.append(rec)
    return records


def tune_decoder(
    cfg,
    *,
    batch: int = 4,
    dtypes=("bfloat16", "float32"),
    warmup: int = 2,
    calls: int = 20,
    out_path: Optional[str] = None,
    with_pallas: bool = True,
) -> Dict:
    """Times XLA vs Pallas per decoder stage; returns (and optionally
    writes) the tuning record.  Dense (non-depthwise) decoders have no
    Pallas kernel — XLA-only records, like the reference's dense logs."""
    import jax
    import jax.numpy as jnp

    from fastdepth_tpu.engine.benchmark import time_pipelined
    from fastdepth_tpu.ops import blocks as B
    from fastdepth_tpu.ops.pallas.fused_decoder import fused_decoder_stage

    k = cfg.decoder_kernel
    depthwise = cfg.decoder_depthwise
    rng = np.random.RandomState(0)
    records = []
    for spec in _stage_shapes(cfg):
        h, w, cin, cout = spec["h"], spec["w"], spec["cin"], spec["cout"]
        concat = spec.get("skip_mode") == "concat"
        for dtype_name in dtypes:
            dtype = getattr(jnp, dtype_name)
            x = jnp.asarray(rng.rand(batch, h, w, cin), dtype)
            # the combined tensor is an add of a cout-wide tap, or a
            # concat of a tap-wide one (fused.py:185-186 semantics)
            skip = (jnp.asarray(
                rng.rand(batch, 2 * h, 2 * w, spec["tap"]), dtype)
                if spec["skip"] else None)

            def combine(y, skip=skip, concat=concat):
                if skip is None:
                    return y
                return jnp.concatenate([y, skip], axis=-1) if concat else y + skip

            if depthwise:
                dw_w = jnp.asarray(rng.rand(k, k, 1, cin) * 0.1, dtype)
                dw_b = jnp.asarray(rng.rand(cin) * 0.1, dtype)
                pw_w = jnp.asarray(rng.rand(1, 1, cin, cout) * 0.1, dtype)
                pw_b = jnp.asarray(rng.rand(cout) * 0.1, dtype)

                def xla_path(x, combine=combine):
                    y = B.relu(B.depthwise_conv2d(x, dw_w, bias=dw_b))
                    y = B.relu(B.conv2d(y, pw_w, bias=pw_b))
                    y = B.upsample_nearest2x(y)
                    return combine(y)

                def pallas_path(x, skip=skip):
                    return fused_decoder_stage(x, dw_w, dw_b, pw_w, pw_b, skip)

                impls = [("xla", xla_path)]
                # the fused kernel implements the add combine only
                if with_pallas and k == 5 and not concat:
                    impls.append(("pallas", pallas_path))
            else:
                c_w = jnp.asarray(rng.rand(k, k, cin, cout) * 0.1, dtype)
                c_b = jnp.asarray(rng.rand(cout) * 0.1, dtype)

                def xla_path(x, combine=combine):
                    y = B.relu(B.conv2d(x, c_w, bias=c_b))
                    y = B.upsample_nearest2x(y)
                    return combine(y)

                impls = [("xla", xla_path)]

            rec = dict(spec, dtype=dtype_name, batch=batch)
            for name, fn in impls:
                try:
                    jfn = jax.jit(fn)
                    stats = time_pipelined(jfn, (x,), warmup=warmup, calls=calls)
                    rec[f"{name}_ms"] = round(stats["mean_s"] * 1e3, 4)
                except Exception as e:
                    rec[f"{name}_ms"] = None
                    rec[f"{name}_error"] = f"{type(e).__name__}"
            times = {k2: rec[f"{k2}_ms"] for k2 in ("xla", "pallas")
                     if rec.get(f"{k2}_ms") is not None}
            rec["winner"] = min(times, key=times.get) if times else None
            records.append(rec)

    result = {
        "config": {"encoder_channels": list(cfg.encoder_channels),
                   "decoder_channels": list(cfg.decoder_channels),
                   "decoder": cfg.decoder, "skip": cfg.skip},
        "device": str(_device_kind()),
        "records": records,
    }
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
    return result


def tune_model(
    cfg,
    *,
    batch_enc: int = 32,
    batch_dec: int = 4,
    dtypes=("bfloat16", "float32"),
    warmup: int = 2,
    calls: int = 20,
    out_path: Optional[str] = None,
    with_pallas: bool = True,
) -> Dict:
    """Full tuning record: every encoder conv op + every decoder stage —
    the breadth of one reference AutoTVM log (all conv tasks of one
    model, tvm_compile/tuning/*.log)."""
    dec = tune_decoder(cfg, batch=batch_dec, dtypes=dtypes, warmup=warmup,
                       calls=calls, with_pallas=with_pallas)
    enc = tune_encoder(cfg, batch=batch_enc, dtypes=dtypes, warmup=warmup,
                       calls=calls)
    result = {
        "config": dec["config"],
        "device": dec["device"],
        # encoder half is INFORMATIONAL: XLA is the only encoder
        # implementation (no Pallas encoder kernel), so nothing at
        # runtime selects among encoder impls — the records exist to
        # document measured per-op costs with the breadth of the
        # reference's AutoTVM logs.  load_tuning / --impl mixed consume
        # 'records' (the decoder half) only.
        "encoder_records_note": (
            "informational: XLA is the only encoder implementation "
            "(there is no Pallas encoder kernel), so no runtime "
            "selection reads these; they document measured per-op "
            "encoder costs for breadth parity with the reference's "
            "AutoTVM logs. Runtime consumers (load_tuning -> --impl "
            "mixed) read 'records' only."),
        "encoder_records": enc,
        "records": dec["records"],
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


def load_tuning(path: str, dtype: Optional[str] = None) -> Dict[int, str]:
    """Tuning record -> {stage: 'xla' | 'pallas'} winner map.

    ``dtype`` ('bfloat16' / 'float32' / a dtype object) selects the
    winners measured at that compute dtype — the records differ per
    dtype (e.g. the committed pruned-flagship record flips stages 2 and
    5 between fp32 and bf16).  Stages with no record at the requested
    dtype fall back to whatever dtype was measured.  ``None`` keeps the
    historical bf16 preference."""
    if dtype is not None and not isinstance(dtype, str):
        dtype = np.dtype(dtype).name  # ml_dtypes registers bfloat16
    pref = dtype or "bfloat16"
    with open(path) as f:
        data = json.load(f)
    winners: Dict[int, str] = {}
    for rec in data["records"]:
        if rec.get("winner"):
            # matching-dtype records override; others only fill gaps
            if rec["stage"] not in winners or rec["dtype"] == pref:
                winners[rec["stage"]] = rec["winner"]
    return winners
