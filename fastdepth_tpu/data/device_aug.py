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

Platform verdict (measured, round 5): on this TPU the augment costs
~1.0 s per 128-batch — XLA per-element gathers floor at ~12 ns/index
regardless of table size, and this pipeline issues ~84M indices/batch
(docs/probe_r5_device_gathers.json, docs/bench_train_device_aug_r5.json,
kernel_notes "r5: the XLA gather floor").  Host augmentation (csrc
kernels, 2.65 ms/item/core) stays the default; this path is correct,
exactness-tested, and the right shape for backends whose gathers ride
DMA — it is not a win here.
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


def _jitter_slot(img_u8: Array, table: Array, kind: Array) -> Array:
    """One enhance slot over a (B, N, 3) uint8 batch: pure integer
    row-select + table gather.  ``table`` (B, 256, 256) u8 is the op's
    host-baked PIL-blend grid (transforms.blend_grid / identity_grid);
    ``kind`` (B,) i32 picks the ROW source — the op's degenerate gray:
    per-pixel L (saturation), image mean-L (contrast), or row 0
    (brightness / identity)."""
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
    idx = row[..., None] * 256 + img_u8.astype(jnp.int32)  # (B, N, 3)
    b = img_u8.shape[0]
    flat = jnp.take_along_axis(
        table.reshape(b, 256 * 256), idx.reshape(b, -1), axis=1)
    return flat.reshape(img_u8.shape)


def _unit_lut() -> Array:
    """The host's u8 -> [0,1] f32 table (float(i)/255.0f, every entry the
    correctly-rounded f32 quotient) as a device constant."""
    import numpy as np

    from fastdepth_tpu.data import native

    return jnp.asarray(native.u8_to_unit_f32(np.arange(256, dtype=np.uint8)))


def apply_train_augment(
    rgb_raw: Array,
    depth_raw: Array,
    flat: Array,
    scale: Array,
    tables: Array,
    kinds: Array,
    out_size: Tuple[int, int] = (224, 224),
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
        rgb_g = _jitter_slot(rgb_g, tables[:, s], kinds[:, s])
    rgb01 = jnp.take(_unit_lut(), rgb_g.astype(jnp.int32))
    return rgb01.reshape(b, oh, ow, 3), depth_g.reshape(b, oh, ow, 1)
