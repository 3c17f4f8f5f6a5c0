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
    k2 = cfg.decoder_kernel * cfg.decoder_kernel
    for i, cout in enumerate(dec, start=1):
        dw_macs = h * h * cin * k2
        pw_macs = h * h * cin * cout
        rows.append((
            f"dec.stage{i}",
            dw_macs + pw_macs,
            h * h * cin * 3 + h * h * cout
            + (2 * h) ** 2 * cout * (2 if i in skips else 1),
            pw_macs,
            k2 * h * h * _pad(cin),
        ))
        h, cin = 2 * h, cout

    head_macs = h * h * cin
    rows.append(("dec.head", head_macs, h * h * cin + h * h, head_macs, 0))
    return rows


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
