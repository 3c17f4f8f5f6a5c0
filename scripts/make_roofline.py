"""Emit docs/roofline.md: per-layer measured marginal cost vs honest
HBM/VPU/MXU bounds for the pruned FastDepth forward (bf16 b128).

Bounds model conv-boundary materialization (XLA fuses elementwise
bias/ReLU/upsample/add into conv outputs, but every conv reads a
materialized input and writes a materialized output):
  encoder block = dw(in r, mid w) + pw(mid r, out w)
  decoder stage = dw + pw + upsample-out write (+ skip read)
VPU work = depthwise MACs with the channel dim padded to the 128 lane
width; MXU work = pointwise/dense MACs.

Measured numbers come from scripts/profile_marginal.py's output
(docs/profile_r2_marginal_bf16_b128.json).
"""
import json
import os

from fastdepth_tpu.config import FASTDEPTH_PRUNED, MOBILENET_STRIDES  # noqa: E402
from fastdepth_tpu.engine.roofline import (  # noqa: E402  — the shared formulas
    HBM_BPS as HBM,
    MXU_MACS as MXU,
    VPU_MACS as VPU,
    layer_bounds,
)

B = 2                  # bytes/elem bf16

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
prof = json.load(open(os.path.join(
    repo, "docs", "profile_r2_marginal_bf16_b128.json")))
measured = {l["layer"]: l["marginal_us_per_frame"] for l in prof["layers"]}

cfg = FASTDEPTH_PRUNED

# descriptive labels + the profile JSON's measured keys, joined to the
# shared per-layer bound rows (engine/roofline.py)
enc = cfg.encoder_channels
dec = cfg.decoder_channels
labels = [("enc0 stem 3x3s2 3->16 @224", "enc0")]
h, cin = 112, enc[0]
for i in range(1, 14):
    s = MOBILENET_STRIDES[i - 1]
    ho = h // s
    labels.append((f"enc{i} dw{cin}s{s}+pw->{enc[i]} @{ho}", f"enc{i}"))
    h, cin = ho, enc[i]
for i, cout in enumerate(dec, start=1):
    labels.append((f"dec{i} dw5x5 {cin}->pw{cout} @{h}"
                   f"{'+skip' if i in (2, 3, 4) else ''}", f"dec{i}"))
    h, cin = 2 * h, cout
# head at 224 (ref forward; the shipped opt path runs it at 112)
labels.append(("dec6 head 1x1 16->1 @224", "dec6"))

rows = [
    (label, hbm_e * B, mxu, vpu, measured.get(key))
    for (label, key), (_, _macs, hbm_e, mxu, vpu)
    in zip(labels, layer_bounds(cfg, 224))
]

lines = [
    "# Per-layer roofline — pruned FastDepth, bf16 b128, one v5e chip",
    "",
    "Measured = marginal in-context cost (scripts/profile_marginal.py: the",
    "layer duplicated inside the production graph; noise floor ~±1.5 us).",
    "Bounds assume conv-boundary materialization and perfect elementwise",
    "fusion; VPU bound pads channels to the 128-lane width.",
    f"Peaks: HBM {HBM/1e9:.0f} GB/s, MXU {MXU/1e12:.1f} TMAC/s, "
    f"VPU {VPU/1e12:.1f} TMAC/s.",
    "",
    "| layer | HBM us | VPU us | MXU us | bound us | measured us | x bound |",
    "|---|---:|---:|---:|---:|---:|---:|",
]
tot_b, tot_m = 0.0, 0.0
for name, hbm, mxu, vpu, meas in rows:
    t_h = hbm / HBM * 1e6
    t_m = mxu / MXU * 1e6
    t_v = vpu / VPU * 1e6
    bound = max(t_h, t_m, t_v)
    tot_b += bound
    ratio = "" if meas is None else f"{meas / bound:.1f}x"
    ms = "" if meas is None else f"{meas:.1f}"
    if meas:
        tot_m += meas
    lines.append(f"| {name} | {t_h:.2f} | {t_v:.2f} | {t_m:.2f} "
                 f"| {bound:.2f} | {ms} | {ratio} |")
base = prof["base_us"] / prof["batch"]
lines += [
    "",
    f"Sum of per-layer bounds: **{tot_b:.1f} us/frame**; sum of measured "
    f"marginals: {tot_m:.1f}; whole-model measured: "
    f"{base:.1f} us/frame (marginals under-add because shared traffic "
    "amortizes).",
    "",
    f"**The full forward runs at {base / tot_b:.2f}x its aggregate "
    "conv-boundary roofline** (and at "
    f"{base / tot_b / (61.4 / 56.5):.2f}x with the shipped head-commute "
    "rewrite). Only dec4 exceeds 2x its individual bound.",
    "",
    "Reading: the encoder runs at or under ~2x its bounds throughout.",
    "Decoder stages 4-5 sit at ~2.5x their conv-boundary HBM bounds — the",
    "gap is XLA's depthwise lowering (isolated dw time scales with C",
    "beyond 64 lanes) and is unreachable from JAX on this platform: the",
    "Pallas path pays a measured 31-68 GB/s per-DMA floor (three",
    "independent measurements, docs/kernel_notes.md), 12-26x below HBM",
    "peak, so no custom kernel can undercut XLA here.  The shipped",
    "head-commute rewrite removes the dec6@224^2 row entirely",
    "(runs at 112^2: 4x less traffic) — 61.4 -> 56.5 us/frame.",
]
out = os.path.join(repo, "docs", "roofline.md")
with open(out, "w") as f:
    f.write("\n".join(lines) + "\n")
print("\n".join(lines))
