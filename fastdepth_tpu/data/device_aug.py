"""Device-side train augmentation — the jitted half of the train-item
pipeline (reference dataloaders/nyu.py:26-46).

The host half of a train item (data/pipeline.py::TrainPipeline) is two
very different kinds of work:

* PARAMETER math — drawing (scale, angle, flip, jitter factors/order)
  and composing the whole geometry into one flat raw->224x224 gather
  map (microseconds per item: three broadcast FMAs over a 250x333
  index plane),
* PIXEL math — the ~1M-element gather, the PIL-exact enhance chain and
  the /255 (milliseconds per item per core; the measured host feeding
  bound, docs/bench_host_train_r4.json).

This module moves ALL the pixel math into the jitted train step: the
host ships raw frames + per-item index vectors/factors
(``NYUDataset(device_augment=True)``), and :func:`apply_train_augment`
executes the gather, rotation pad mask, depth /= s, the ImageEnhance
chain and the /255 on device, bit-identically to the host pipeline
(tests/test_device_aug.py proves equality through the full jitted step).

Bit-exactness notes (each mirrors csrc/preprocess.cpp, itself
sweep-verified against Pillow):

* gather: value-independent index selection; the rotation pad is folded
  into the flat map as -1 (same convention as composed_indices),
* depth: a true f32 DIVISION by s (fd_train_gather divides too);
  the divisor is per-item DATA, so XLA cannot constant-fold it into a
  reciprocal multiply,
* enhance: NO float arithmetic on device at all.  An XLA float chain
  for PIL's blend ``in1 + alpha * (in2 - in1)`` gets FMA-contracted
  (measured: the un-rounded multiply flips the C-cast truncation on
  ~0.3% of pixels, immune to optimization_barrier/bitcast fences and
  --xla_cpu_enable_fast_math=false).  Instead the HOST bakes each
  enhance op into a (256, 256) uint8 value grid with numpy's
  correctly-rounded stepwise f32 (transforms.blend_grid, proven
  bit-equal to PIL itself), and the device only computes integer ROW
  indices: the pixel's own fixed-point 'L' gray for saturation
  (``(R*19595 + G*38470 + B*7471 + 0x8000) >> 16``, csrc pil_l), the
  image's mean-L gray for contrast — ``int(mean(L) + 0.5)`` in EXACT
  integer arithmetic ``(2*sum + n) // (2*n)``, equal to PIL's f64 form
  for every reachable sum because the nearest half-integer boundary is
  >= 1/(2n) away while f64 error is ~1e-15 — and row 0 for brightness
  (degenerate black).  Integer gathers are bit-exact on any backend by
  construction,
* /255: a 256-entry f32 table gather (the host LUT ``float(i)/255.0f``
  shipped as a constant) — XLA rewrites division-by-constant into a
  reciprocal multiply (measured: 126/256 values off by 1 ulp), so the
  quotients are looked up, not recomputed.

The op order is data-dependent per item (ColorJitter shuffles), which
cannot branch under jit — instead each item carries three uniform LUT
slots (grid + row-kind) and unused slots hold the identity grid.

Platform verdict (measured, round 5): XLA per-element gathers floor at
~12 ns/index regardless of table size on this TPU
(docs/probe_r5_device_gathers.json), and the first-cut all-gather
augment paid ~1.0 s per 128-batch (126 vs 4,264 train fps).  The LUT
CLASS of that cost (~86%: three jitter slots + the /255) does not need
the gather unit at all — ``lut_impl="dot"`` (the default) reformulates
every value lookup as arithmetic the MXU/VPU execute:

* jitter slot: two chained one-hot contractions
  (``onehot(row) @ grid`` row-select, then ``rows · onehot(value)``
  value-select).  Exact by construction: u8 grid values (<= 255) are
  exactly representable in bf16, one-hot factors are 0/1, and each
  reduction has exactly ONE nonzero term — the result is the looked-up
  integer, bit-for-bit, in any accumulation order,
* /255: an unrolled 256-way select-sum ``sum_k lut[k] * (v == k)``
  over f32 scalar constants — again one nonzero term, and ``x + 0.0``
  is exact for the non-negative table,

measured 7-12x faster than their gather forms
(docs/probe_r5_lut_alternatives.json).  The composed SPATIAL gather
(rotation breaks row separability, so it stays per-pixel) remains on
the gather floor — a 16-px slice-packed reformulation measured 2x
WORSE (same probe).  ``lut_impl="gather"`` keeps the plain-gather
forms for A/B measurement; both are bit-identical to the host
(tests/test_device_aug.py runs the full equality suite on each).
Net on-chip verdict lives in docs/bench_train_device_aug_r5.json and
kernel_notes "r5: the XLA gather floor".
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# slot kinds (NYUDataset.device-augment items; 0 pads unused slots)
KIND_NONE = 0
KIND_BRIGHTNESS = 1   # degenerate: black        (ImageEnhance.Brightness)
KIND_CONTRAST = 2     # degenerate: mean-L gray  (ImageEnhance.Contrast)
KIND_SATURATION = 3   # degenerate: per-pixel L  (ImageEnhance.Color)


def _pil_l(img_u8: Array) -> Array:
    """Pillow convert('L') fixed point over (..., 3) uint8 -> (...) i32
    (csrc/preprocess.cpp::pil_l)."""
    px = img_u8.astype(jnp.int32)
    return (px[..., 0] * 19595 + px[..., 1] * 38470 + px[..., 2] * 7471
            + 0x8000) >> 16


def _jitter_slot(img_u8: Array, table: Array, kind: Array,
                 lut_impl: str = "dot") -> Array:
    """One enhance slot over a (B, N, 3) uint8 batch: pure integer
    row-select + value lookup.  ``table`` (B, 256, 256) u8 is the op's
    host-baked PIL-blend grid (transforms.blend_grid / identity_grid);
    ``kind`` (B,) i32 picks the ROW source — the op's degenerate gray:
    per-pixel L (saturation), image mean-L (contrast), or row 0
    (brightness / identity).

    ``lut_impl="dot"`` executes the 2-D lookup as two chained one-hot
    contractions on the MXU (bit-exact: module docstring); ``"gather"``
    is the plain per-element table gather, 7x slower on this platform
    (docs/probe_r5_lut_alternatives.json)."""
    l_plane = _pil_l(img_u8)                      # (B, N) i32
    n = l_plane.shape[-1]
    # ImageEnhance.Contrast: int(mean(L) + 0.5) in exact integer math
    # (sum <= 255 * N < 2^31 for any supported frame size)
    l_sum = jnp.sum(l_plane, axis=-1)             # (B,) i32
    gray = (2 * l_sum + n) // (2 * n)             # (B,) i32
    k = kind[:, None]
    row = jnp.where(
        k == KIND_SATURATION, l_plane,
        jnp.where(k == KIND_CONTRAST, gray[:, None], 0))   # (B, N)
    if lut_impl == "gather":
        idx = row[..., None] * 256 + img_u8.astype(jnp.int32)  # (B, N, 3)
        b = img_u8.shape[0]
        flat = jnp.take_along_axis(
            table.reshape(b, 256 * 256), idx.reshape(b, -1), axis=1)
        return flat.reshape(img_u8.shape)
    if lut_impl != "dot":
        raise ValueError(f"lut_impl must be 'dot' or 'gather': {lut_impl!r}")
    iota = jnp.arange(256, dtype=jnp.int32)
    # row-select: one-hot(row) @ grid — exactly one nonzero term per
    # reduction, u8 grid values exact in bf16 -> rows[b,n,v] ==
    # table[b, row[b,n], v] bit-for-bit
    ohr = (row[..., None] == iota).astype(jnp.bfloat16)        # (B, N, 256)
    rows = jnp.einsum("bnk,bkv->bnv", ohr, table.astype(jnp.bfloat16))
    # value-select: rows · one-hot(pixel value), same exactness argument
    ohv = (img_u8.astype(jnp.int32)[..., None] == iota
           ).astype(jnp.bfloat16)                              # (B, N, 3, 256)
    out = jnp.einsum("bnv,bncv->bnc", rows, ohv)               # (B, N, 3)
    return out.astype(jnp.uint8)


def _unit_lut_np():
    """The host's u8 -> [0,1] f32 table (float(i)/255.0f, every entry the
    correctly-rounded f32 quotient) as a numpy array."""
    import numpy as np

    from fastdepth_tpu.data import native

    return native.u8_to_unit_f32(np.arange(256, dtype=np.uint8))


def _unit_lut() -> Array:
    """:func:`_unit_lut_np` as a device constant."""
    return jnp.asarray(_unit_lut_np())


def _u8_to_unit(img_u8: Array, lut_impl: str = "dot") -> Array:
    """u8 -> [0,1] f32 through the host's correctly-rounded quotient
    table.  ``"dot"``: unrolled 256-way select-sum over f32 scalar
    constants (no gather unit; exactly one nonzero term per element, so
    bit-equal to the lookup); ``"gather"``: plain 256-entry table
    gather, 9x slower here (docs/probe_r5_lut_alternatives.json)."""
    if lut_impl == "gather":
        return jnp.take(_unit_lut(), img_u8.astype(jnp.int32))
    if lut_impl != "dot":
        raise ValueError(f"lut_impl must be 'dot' or 'gather': {lut_impl!r}")
    lut = _unit_lut_np()
    vi = img_u8.astype(jnp.int32)
    acc = jnp.zeros(img_u8.shape, jnp.float32)
    for k in range(1, 256):  # lut[0] == 0.0 — the init already covers it
        acc = acc + float(lut[k]) * (vi == k).astype(jnp.float32)
    return acc


def apply_train_augment(
    rgb_raw: Array,
    depth_raw: Array,
    flat: Array,
    scale: Array,
    tables: Array,
    kinds: Array,
    out_size: Tuple[int, int] = (224, 224),
    lut_impl: str = "dot",
) -> Tuple[Array, Array]:
    """The whole train-item pixel pipeline on device.

    Args (leading B = batch):
      rgb_raw   (B, Hr, Wr, 3)   uint8 raw frames,
      depth_raw (B, Hr, Wr)      f32 raw depth,
      flat      (B, oh*ow)       i32 composed raw->output gather map,
                                 -1 = rotation constant-pad (-> 0),
      scale     (B,)             f32 draw scale s (depth /= s, nyu.py:28),
      tables    (B, S, 256, 256) u8 jitter slot value grids
                                 (transforms.blend_grid / identity_grid),
      kinds     (B, S)           i32 jitter slot row kinds (KIND_*).

    ``lut_impl`` picks the value-lookup execution strategy for the
    jitter slots and the /255 — "dot" (gather-free one-hot
    contractions / select-sums, the platform default) or "gather"
    (plain table gathers); both are bit-identical (module docstring,
    tests/test_device_aug.py parametrizes every equality test over
    both).

    Returns (rgb (B, oh, ow, 3) f32 in [0,1], depth (B, oh, ow, 1) f32),
    bit-identical to TrainPipeline.__call__ + ColorJitter on the host
    (tests/test_device_aug.py).
    """
    b = rgb_raw.shape[0]
    oh, ow = out_size
    mask = flat < 0
    idx = jnp.where(mask, 0, flat)
    rgb_g = jnp.take_along_axis(
        rgb_raw.reshape(b, -1, 3), idx[..., None], axis=1)    # (B, N, 3) u8
    rgb_g = jnp.where(mask[..., None], jnp.uint8(0), rgb_g)
    depth_g = jnp.take_along_axis(depth_raw.reshape(b, -1), idx, axis=1)
    depth_g = jnp.where(mask, 0.0, depth_g / scale[:, None])
    for s in range(kinds.shape[1]):
        rgb_g = _jitter_slot(rgb_g, tables[:, s], kinds[:, s],
                             lut_impl=lut_impl)
    rgb01 = _u8_to_unit(rgb_g, lut_impl=lut_impl)
    return rgb01.reshape(b, oh, ow, 3), depth_g.reshape(b, oh, ow, 1)
