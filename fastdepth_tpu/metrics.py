"""Depth metrics, exact reference semantics (reference metrics.py:9-95).

Reproduced precisely — do not "fix" these for parity's sake:

* validity mask is the **union** ``(target > 0) | (output > 0)``
  (metrics.py:32),
* depths are scaled x1e3 into **millimeters** before every metric
  (metrics.py:34-35),
* delta_k = mean(max(out/tgt, tgt/out) < 1.25^k) (metrics.py:44-47),
* iRMSE/iMAE on inverse depth (metrics.py:51-55),
* per-image metrics, count-weight-averaged across images
  (AverageMeter, metrics.py:58-95).

TPU design: :func:`evaluate_batch` computes all 10 metrics for a whole
NHWC batch on-device in one fused pass (masked sums, no boolean
indexing / dynamic shapes), vectorized over the batch dimension;
``AverageMeter`` then aggregates host-side exactly like the reference.
Cross-chip, the same masked sums reduce with ``jax.lax.psum``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

METRIC_FIELDS = (
    "irmse", "imae", "mse", "rmse", "mae", "absrel", "lg10",
    "delta1", "delta2", "delta3",
)


@dataclasses.dataclass
class Result:
    """One evaluation record (reference metrics.py:9-29)."""

    irmse: float = 0.0
    imae: float = 0.0
    mse: float = 0.0
    rmse: float = 0.0
    mae: float = 0.0
    absrel: float = 0.0
    lg10: float = 0.0
    delta1: float = 0.0
    delta2: float = 0.0
    delta3: float = 0.0
    data_time: float = 0.0
    gpu_time: float = 0.0

    def set_to_worst(self) -> "Result":
        for f in ("irmse", "imae", "mse", "rmse", "mae", "absrel", "lg10"):
            setattr(self, f, float("inf"))
        self.delta1 = self.delta2 = self.delta3 = 0.0
        self.data_time = self.gpu_time = 0.0
        return self

    def as_dict(self) -> Dict[str, float]:
        return dataclasses.asdict(self)


def _masked_mean(x: Array, mask: Array) -> Array:
    return jnp.sum(jnp.where(mask, x, 0.0), axis=(1, 2, 3)) / jnp.sum(
        mask, axis=(1, 2, 3)
    )


def evaluate_batch(output: Array, target: Array) -> Dict[str, Array]:
    """All metrics for an NHWC (N, H, W, 1) batch, per image, on device.

    Returns a dict of (N,)-vectors in float32.  Matches
    ``Result.evaluate`` (reference metrics.py:31-55) per image: union
    mask, millimeter scaling, and each mean taken over that image's valid
    pixels only.
    """
    output = output.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mask = (target > 0) | (output > 0)
    out_mm = 1e3 * output
    tgt_mm = 1e3 * target

    abs_diff = jnp.abs(out_mm - tgt_mm)
    mse = _masked_mean(abs_diff * abs_diff, mask)
    mae = _masked_mean(abs_diff, mask)
    # log10 / ratios are only evaluated on masked pixels; `where` keeps
    # the computation NaN-free for excluded pixels (the reference's
    # boolean indexing never sees them).
    safe_out = jnp.where(mask, out_mm, 1.0)
    safe_tgt = jnp.where(mask, tgt_mm, 1.0)
    lg10 = _masked_mean(
        jnp.abs(jnp.log10(safe_out) - jnp.log10(safe_tgt)), mask
    )
    absrel = _masked_mean(abs_diff / safe_tgt, mask)

    max_ratio = jnp.maximum(safe_out / safe_tgt, safe_tgt / safe_out)
    deltas = {
        f"delta{k}": _masked_mean((max_ratio < 1.25 ** k).astype(jnp.float32), mask)
        for k in (1, 2, 3)
    }

    inv_diff = jnp.abs(1.0 / safe_out - 1.0 / safe_tgt)
    irmse = jnp.sqrt(_masked_mean(inv_diff * inv_diff, mask))
    imae = _masked_mean(inv_diff, mask)

    return {
        "irmse": irmse,
        "imae": imae,
        "mse": mse,
        "rmse": jnp.sqrt(mse),
        "mae": mae,
        "absrel": absrel,
        "lg10": lg10,
        **deltas,
    }


def evaluate(output, target) -> Result:
    """Single-pair convenience wrapper; accepts any shapes that reshape to
    one (H, W) image each.  A batch is refused (it would silently be
    treated as one tall image, skewing every mean) — use
    :func:`evaluate_batch` for batches."""
    output = jnp.asarray(output)
    target = jnp.asarray(target)
    hw = jnp.squeeze(output).shape
    if len(hw) != 2:
        raise ValueError(
            f"metrics.evaluate is a single-(H, W)-pair contract, got "
            f"output shape {tuple(output.shape)}; use evaluate_batch for "
            "batched NHWC inputs")
    output = jnp.reshape(output, (1,) + hw + (1,))
    target = jnp.reshape(target, (1,) + hw + (1,))
    vals = evaluate_batch(output, target)
    return Result(**{k: float(v[0]) for k, v in vals.items()})


class AverageMeter:
    """Count-weighted running average (reference metrics.py:58-95)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.count = 0.0
        self.sums = {f: 0.0 for f in METRIC_FIELDS}
        self.sum_data_time = 0.0
        self.sum_gpu_time = 0.0

    def update(self, result, gpu_time: float = 0.0, data_time: float = 0.0, n: int = 1):
        self.count += n
        vals = result.as_dict() if isinstance(result, Result) else result
        for f in METRIC_FIELDS:
            self.sums[f] += n * float(vals[f])
        self.sum_data_time += n * data_time
        self.sum_gpu_time += n * gpu_time

    def update_batch(self, metrics: Dict[str, Array], gpu_time: float = 0.0, data_time: float = 0.0):
        """Fold in a per-image metrics dict from :func:`evaluate_batch`."""
        vals = {k: np.asarray(v) for k, v in metrics.items()}
        n = len(next(iter(vals.values())))
        self.count += n
        for f in METRIC_FIELDS:
            self.sums[f] += float(vals[f].sum())
        self.sum_data_time += n * data_time
        self.sum_gpu_time += n * gpu_time

    def average(self) -> Result:
        c = self.count
        return Result(
            **{f: self.sums[f] / c for f in METRIC_FIELDS},
            data_time=self.sum_data_time / c,
            gpu_time=self.sum_gpu_time / c,
        )
