"""Depth losses.

The public reference release is eval-only, but FastDepth trains with an
L1 loss on valid pixels (paper recipe; the reference's training-era
vestiges — train_transform nyu.py:26-46, CSV fieldnames main.py:20-22 —
fix the data/metric semantics; BASELINE.json config #5 names the loss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def l1_loss(pred: Array, target: Array) -> Array:
    return jnp.mean(jnp.abs(pred - target))


def masked_l1_loss(pred: Array, target: Array) -> Array:
    """L1 over pixels with valid ground truth (target > 0) — rotation
    padding and Kinect holes carry depth 0 and must not train the net."""
    mask = target > 0
    diff = jnp.where(mask, jnp.abs(pred - target), 0.0)
    return jnp.sum(diff) / jnp.maximum(jnp.sum(mask), 1)
