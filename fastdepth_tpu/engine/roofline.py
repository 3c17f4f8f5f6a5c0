"""Conv-boundary roofline bounds for the FastDepth forward — the ONE
source of formulas behind docs/roofline.md (scripts/make_roofline.py)
and the profile CLI's bound column (cli/profile.py), so the two can't
drift apart.

Convention (docs/roofline.md header): XLA fuses elementwise
bias/ReLU/upsample/add into conv outputs, but every conv reads a
materialized input and writes a materialized output:

* encoder block = dw(in r, mid w) + pw(mid r, out w)
* decoder stage = dw(in r, mid w) + pw(mid r, out w) + upsample-out
  write (+ skip-tap read)

VPU work = depthwise MACs with the channel dim padded to the 128-lane
width; MXU work = pointwise/dense MACs.  MAC peaks are the bf16 numbers
(fp32 MXU peak is ~half; HBM bound usually binds long before that
matters for this model).
"""

from __future__ import annotations

from typing import List, Tuple

HBM_BPS = 819e9          # bytes/s, v5e
MXU_MACS = 197e12 / 2    # MAC/s bf16 (197 TFLOP/s, FMA = 2 FLOPs)
VPU_MACS = 12e12 / 2     # MAC/s (VPU FLOP peak ~12 TFLOP/s)
LANES = 128


def _pad(c: int) -> int:
    return -(-c // LANES) * LANES


def layer_bounds(cfg, image_size: int = 224) -> List[Tuple[str, int, int, int, int]]:
    """Per-frame ``(key, macs, hbm_elems, mxu_macs, vpu_macs_padded)``
    per attribution point (stem, 13 encoder blocks, decoder stages,
    head).  ``macs`` is the true MAC count (display); ``hbm_elems`` is
    in elements — multiply by the dtype byte width."""
    from fastdepth_tpu.config import MOBILENET_STRIDES

    enc = cfg.encoder_channels
    dec = cfg.decoder_channels
    rows: List[Tuple[str, int, int, int, int]] = []

    hw = image_size
    h = hw // 2  # after the stride-2 stem
    stem_macs = h * h * enc[0] * 9 * 3
    rows.append(("enc.conv0", stem_macs, hw * hw * 3 + h * h * enc[0],
                 stem_macs, 0))
    cin = enc[0]
    for i in range(1, 14):
        s = MOBILENET_STRIDES[i - 1]
        ho = h // s
        cout = enc[i]
        dw_macs = ho * ho * cin * 9
        pw_macs = ho * ho * cin * cout
        rows.append((
            f"enc.conv{i}",
            dw_macs + pw_macs,
            h * h * cin + ho * ho * cin * 2 + ho * ho * cout,
            pw_macs,
            9 * ho * ho * _pad(cin),
        ))
        h, cin = ho, cout

    skips = {2, 3, 4} if cfg.skip else set()
    # encoder tap widths combined after stages 2/3/4 (models/fused.py:35);
    # for skip='add' tap == cout (the add constraint) so the byte count
    # reduces to the old 2x factor; for 'concat' the tap is read at its
    # own width and the NEXT stage's cin widens to cout + tap
    taps = {2: enc[5], 3: enc[3], 4: enc[1]}
    concat = cfg.skip == "concat"
    k2 = cfg.decoder_kernel * cfg.decoder_kernel
    for i, cout in enumerate(dec, start=1):
        dw_macs = h * h * cin * k2
        pw_macs = h * h * cin * cout
        tap = taps[i] if i in skips else 0
        rows.append((
            f"dec.stage{i}",
            dw_macs + pw_macs,
            h * h * cin * 3 + h * h * cout
            + (2 * h) ** 2 * (cout + tap),
            pw_macs,
            k2 * h * h * _pad(cin),
        ))
        h, cin = 2 * h, cout + (tap if concat else 0)

    head_macs = h * h * cin
    rows.append(("dec.head", head_macs, h * h * cin + h * h, head_macs, 0))
    return rows


def measured_stage_bounds(cfg, probe: dict, image_size: int = 224):
    """Round-3 measured-ceiling bounds for the dw decoder stages 3-5
    (docs/roofline.md 'the denominator, measured') from a
    docs/probe_r3_hbm.json payload:

    * dw term = the measured barrier-chained dw5x5 time at that exact
      geometry (per frame, b128) — the lowering's intrinsic rate,
    * pw term = conv-boundary bytes at the measured pw-conv rate,
    * upsample(+skip-add) term = bytes at the measured add-pattern rate
      (skip stages) or the measured large-tensor elementwise rate.

    Returns {stage_index: (total_us, dw_us, pw_us, ups_us)} per frame.
    Single source for the doc table + its consistency test.
    """
    rows = {r["name"]: r for r in probe["rows"]}
    batch = 128  # the probes ran b128
    dw_us = {
        3: rows["dec3 dw5x5 256ch@28^2"]["per_pass_us"] / batch,
        4: rows["dec4 dw5x5 120ch@56^2"]["per_pass_us"] / batch,
        5: rows["dec5 dw5x5 56ch@112^2"]["per_pass_us"] / batch,
    }
    pw_bps = rows["pw 56->56 @112^2"]["GBs"] * 1e9
    add_bps = rows["add+mul dec4_out (5 moves)"]["GBs"] * 1e9
    mul_bps = rows["mul dec5_out (128,224,224,16)"]["GBs"] * 1e9

    enc, dec = cfg.encoder_channels, cfg.decoder_channels
    skips = {2, 3, 4} if cfg.skip else set()
    taps = {2: enc[5], 3: enc[3], 4: enc[1]}  # == cout for skip='add'
    concat = cfg.skip == "concat"
    # spatial size entering each decoder stage (stride pattern fixes /32)
    h = image_size // 32
    cin = enc[13]
    out = {}
    for i, cout in enumerate(dec, start=1):
        tap = taps[i] if i in skips else 0
        if i in dw_us:
            pw_b = (h * h * cin + h * h * cout) * 2
            ups_b = (h * h * cout + (2 * h) ** 2 * (cout + tap)) * 2
            pw_t = pw_b / pw_bps * 1e6
            ups_t = ups_b / (add_bps if i in skips else mul_bps) * 1e6
            out[i] = (dw_us[i] + pw_t + ups_t, dw_us[i], pw_t, ups_t)
        h, cin = 2 * h, cout + (tap if concat else 0)
    return out


def measured_composite_us(cfg, probe: dict, image_size: int = 224) -> float:
    """Aggregate per-frame achievable-composite bound for the
    head-commuted forward (docs/roofline.md round-3 section): decoder
    stages with a measured dw chain use :func:`measured_stage_bounds`;
    every other row's conv-boundary HBM bytes are priced at the measured
    mid-size elementwise rate (the 64 MB flat-mul probe — encoder
    activations at b128 span 24-180 MB); the head row runs at 112^2
    under the commute (1/4 of its 224^2 bytes).  Single source for the
    doc's aggregate AND bench.py's x_roofline_measured."""
    rows = layer_bounds(cfg, image_size)
    meas = measured_stage_bounds(cfg, probe, image_size)
    by_name = {r["name"]: r for r in probe["rows"]}
    elt_bps = by_name["flat mul bf16 64MB"]["GBs"] * 1e9
    total = 0.0
    for key, _macs, hbm_e, _mxu, _vpu in rows:
        if key.startswith("dec.stage") and int(key[-1]) in meas:
            total += meas[int(key[-1])][0]
        elif key == "dec.head":
            total += hbm_e / 4 * 2 / elt_bps * 1e6
        else:
            total += hbm_e * 2 / elt_bps * 1e6
    return total


def bound_components_us(hbm_elems: int, mxu_macs: int, vpu_macs: int,
                        dtype_bytes: int, batch: int = 1):
    """(hbm_us, mxu_us, vpu_us) for a batch."""
    return (
        batch * hbm_elems * dtype_bytes / HBM_BPS * 1e6,
        batch * mxu_macs / MXU_MACS * 1e6,
        batch * vpu_macs / VPU_MACS * 1e6,
    )


def bound_seconds(hbm_elems: int, mxu_macs: int, vpu_macs: int,
                  dtype_bytes: int, batch: int = 1) -> float:
    h, m, v = bound_components_us(hbm_elems, mxu_macs, vpu_macs,
                                  dtype_bytes, batch)
    return max(h, m, v) / 1e6
