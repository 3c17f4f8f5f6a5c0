"""Weight initialization matching the reference's ``weights_init``
(reference models.py:36-50):

* Conv2d:           N(0, sqrt(2 / (k^2 * C_out)))
* ConvTranspose2d:  N(0, sqrt(2 / (k^2 * C_in)))
* BatchNorm2d:      scale=1, bias=0  (running mean=0, var=1)
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp


def he_normal_conv(key: jax.Array, kh: int, kw: int, cin: int, cout: int, dtype=jnp.float32):
    """HWIO conv weight; n = k^2 * C_out per the reference convention."""
    std = math.sqrt(2.0 / (kh * kw * cout))
    return std * jax.random.normal(key, (kh, kw, cin, cout), dtype)


def he_normal_depthwise(key: jax.Array, kh: int, kw: int, c: int, dtype=jnp.float32):
    """Depthwise HWIO weight (kh, kw, 1, c).

    torch sees a depthwise layer as Conv2d(c, c, k, groups=c) so
    n = k^2 * c — same formula as a dense conv with cout=c."""
    std = math.sqrt(2.0 / (kh * kw * c))
    return std * jax.random.normal(key, (kh, kw, 1, c), dtype)


def he_normal_convt(key: jax.Array, kh: int, kw: int, cout: int, cin: int, dtype=jnp.float32):
    """HWOI transpose-conv weight; n = k^2 * C_in (models.py:43-47)."""
    std = math.sqrt(2.0 / (kh * kw * cin))
    return std * jax.random.normal(key, (kh, kw, cout, cin), dtype)


def bn_init(c: int, dtype=jnp.float32) -> Dict[str, jax.Array]:
    return {
        "scale": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }
