"""Functional NHWC ops — the L1 block layer of the framework.

TPU-native re-design of the reference's block builders (reference
models.py:52-107) and the MobileNet blocks (reference
imagenet/mobilenet.py:22-38):

* layouts are NHWC / HWIO (TPU-native; the reference is NCHW/OIHW),
* everything is a pure function over explicit param dicts,
* BatchNorm can be *folded* into the preceding conv for inference
  (the XLA analogue of the reference's TVM constant-folding),
* upsampling matches ``torch.nn.functional.interpolate`` semantics
  per-pixel (validated against torch in tests/test_ops.py).

Param dict conventions
----------------------
conv:        {'w': (kh, kw, cin, cout)}                     HWIO
depthwise:   {'w': (kh, kw, 1, c)}                          HWIO, groups=c
conv_trans:  {'w': (kh, kw, cout, cin)}                     HWOI (see below)
batch_norm:  {'scale','bias','mean','var'} each (c,)
folded conv: {'w': ..., 'b': (cout,)}
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array
Params = Dict[str, Array]

_NHWC = ("NHWC", "HWIO", "NHWC")
BN_EPS = 1e-5  # torch.nn.BatchNorm2d default, used throughout the reference


def conv2d(
    x: Array,
    w: Array,
    *,
    stride: int = 1,
    padding: Optional[int] = None,
    bias: Optional[Array] = None,
) -> Array:
    """2-D convolution, NHWC x HWIO -> NHWC.

    ``padding=None`` means torch-style "same for odd kernels":
    p = (k - 1) // 2 on both sides (reference models.py:52-59).
    """
    k = w.shape[0]
    if padding is None:
        padding = (k - 1) // 2
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_NHWC,
    )
    if bias is not None:
        out = out + bias
    return out


def depthwise_conv2d(
    x: Array,
    w: Array,
    *,
    stride: int = 1,
    padding: Optional[int] = None,
    bias: Optional[Array] = None,
) -> Array:
    """Depthwise conv: w has shape (kh, kw, 1, c) and groups == c.

    Reference equivalent: ``nn.Conv2d(c, c, k, groups=c)``
    (models.py:61-68, imagenet/mobilenet.py:29-31).
    """
    c = x.shape[-1]
    k = w.shape[0]
    if padding is None:
        padding = (k - 1) // 2
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_NHWC,
        feature_group_count=c,
    )
    if bias is not None:
        out = out + bias
    return out


def conv2d_transpose(
    x: Array,
    w: Array,
    *,
    stride: int = 2,
    padding: int = 0,
    output_padding: int = 0,
    groups: int = 1,
    bias: Optional[Array] = None,
) -> Array:
    """Transposed conv matching ``torch.nn.ConvTranspose2d`` semantics.

    Weight layout is HWOI: (kh, kw, cout_per_group, cin).  A transposed
    conv is the gradient of a forward conv, which equals a forward conv
    over the input dilated by ``stride`` with the spatially-flipped
    kernel and padding (k-1-p) low / (k-1-p+output_padding) high.
    Output size: (H-1)*stride - 2*padding + k + output_padding
    (reference models.py:77-99 uses this for the deconv decoder family).
    """
    k = w.shape[0]
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    w_flip = jnp.flip(w, axis=(0, 1))          # rotate 180deg
    if groups > 1:
        # grouped transpose: torch weight is (cin, cout/groups, kh, kw);
        # in HWOI that is (kh, kw, cout/groups, cin).  The equivalent
        # forward conv needs HWIO blocks of (kh, kw, cin/groups, cout).
        cin = w.shape[3]
        coutg = w.shape[2]
        # split cin into groups along I, build block-diagonal-free grouped conv
        w_fwd = jnp.reshape(
            jnp.swapaxes(w_flip, 2, 3), (k, k, groups, cin // groups, coutg)
        )
        w_fwd = jnp.reshape(
            jnp.transpose(w_fwd, (0, 1, 3, 2, 4)), (k, k, cin // groups, groups * coutg)
        )
    else:
        # dense: HWOI -> HWIO for the equivalent forward conv
        w_fwd = jnp.swapaxes(w_flip, 2, 3)
    out = lax.conv_general_dilated(
        x,
        w_fwd,
        window_strides=(1, 1),
        padding=((lo, hi), (lo, hi)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_NHWC,
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias
    return out


def batch_norm(x: Array, p: Params, *, eps: float = BN_EPS) -> Array:
    """Inference-mode BatchNorm (running statistics)."""
    inv = lax.rsqrt(p["var"] + eps) * p["scale"]
    return x * inv + (p["bias"] - p["mean"] * inv)


def batch_norm_train(
    x: Array, p: Params, *, eps: float = BN_EPS, momentum: float = 0.1
) -> Tuple[Array, Params]:
    """Training-mode BatchNorm over (N, H, W); returns output and updated
    running stats (torch convention: new = (1-m)*old + m*batch).

    Moments and normalization accumulate in AT LEAST fp32: under
    mixed-precision training (bf16 activations) a bf16 mean/var over
    N*H*W elements is far too coarse, and running stats must stay fp32
    for the inference BN / fold path.  fp32 inputs are untouched
    (bit-identical to the direct formula) and f64 inputs keep f64 (the
    x64-mode mesh-equivalence proof relies on that).
    """
    acc = jnp.promote_types(x.dtype, jnp.float32)
    x32 = x.astype(acc)
    mean = jnp.mean(x32, axis=(0, 1, 2))
    var = jnp.var(x32, axis=(0, 1, 2))
    inv = lax.rsqrt(var + eps) * p["scale"].astype(acc)
    y = (x32 * inv + (p["bias"].astype(acc) - mean * inv)).astype(x.dtype)
    n = x.shape[0] * x.shape[1] * x.shape[2]
    unbiased = var * n / max(n - 1, 1)
    # return ONLY the running-stat updates; scale/bias belong to the
    # optimizer and must not be overwritten by the stat merge
    new_stats = {
        "mean": (1 - momentum) * p["mean"] + momentum * mean,
        "var": (1 - momentum) * p["var"] + momentum * unbiased,
    }
    return y, new_stats


def fold_bn(w: Array, bn: Params, *, eps: float = BN_EPS, transpose: bool = False) -> Tuple[Array, Array]:
    """Fold an inference BatchNorm into the preceding conv.

    Returns (w', b') with  conv(x, w') + b'  ==  bn(conv(x, w)).
    ``transpose=True`` handles DENSE HWOI conv-transpose weights (scale
    on axis 2).  Depthwise HWIO weights (kh,kw,1,c) AND grouped
    transpose-dw weights (same shape) both fold with transpose=False:
    their trailing axis is the BN axis.
    """
    inv = 1.0 / jnp.sqrt(bn["var"] + eps) * bn["scale"]
    if transpose:
        if w.shape[2] != inv.shape[0]:
            # grouped HWOI transpose weights are (k, k, cout/groups, cin):
            # their BN axis is NOT axis 2 — a silent broadcast here would
            # produce a wrong-shaped weight. Grouped deconv-dw (k, k, 1, C)
            # folds correctly with transpose=False (trailing axis == C).
            raise ValueError(
                f"transpose fold expects dense HWOI weights with cout on "
                f"axis 2; got w{tuple(w.shape)} vs bn[{inv.shape[0]}]")
        w_f = w * inv[None, None, :, None]
    else:
        w_f = w * inv  # broadcasts over last (output) axis
    b_f = bn["bias"] - bn["mean"] * inv
    return w_f, b_f


def relu(x: Array) -> Array:
    return jnp.maximum(x, 0)


def relu6(x: Array) -> Array:
    return jnp.clip(x, 0, 6)


def upsample_nearest2x(x: Array) -> Array:
    """Nearest x2 upsample, exact match of
    ``F.interpolate(x, scale_factor=2, mode='nearest')``
    (reference models.py:722-723): each pixel becomes a 2x2 block.

    Implemented as broadcast+reshape (no gather) so XLA lowers it to a
    cheap layout op that fuses with neighbors.
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return jnp.reshape(x, (n, 2 * h, 2 * w, c))


def upsample_bilinear2x(x: Array) -> Array:
    """Bilinear x2, matching ``F.interpolate(mode='bilinear',
    align_corners=False)`` (reference models.py:277-293).

    jax.image.resize('linear') uses the same half-pixel convention.
    """
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="linear")


def unpool_zero(x: Array, *, stride: int = 2) -> Array:
    """Zero-insertion unpool: out[2i, 2j] = x[i, j], rest 0, size doubles.

    Exact equivalent of the reference's grouped conv_transpose trick with
    kernel [[1,0],[0,0]] (reference models.py:18-34) — but expressed as an
    interior pad, which XLA lowers without any convolution.
    """
    s = stride - 1
    cfg = [(0, 0, 0), (0, s, s), (0, s, s), (0, 0, 0)]
    return lax.pad(x, jnp.zeros((), x.dtype), cfg)


def pixel_shuffle(x: Array, r: int = 2) -> Array:
    """NHWC pixel shuffle matching ``torch.pixel_shuffle`` channel order:
    input channel index = c_out * r^2 + i * r + j
    (reference models.py:319-333 ShuffleConv decoder)."""
    n, h, w, c = x.shape
    cout = c // (r * r)
    x = jnp.reshape(x, (n, h, w, cout, r, r))
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))  # n, h, i, w, j, cout
    return jnp.reshape(x, (n, h * r, w * r, cout))


def avg_pool(x: Array, window: int, *, stride: Optional[int] = None) -> Array:
    """Mean pool (reference imagenet/mobilenet.py:55 AvgPool2d(7))."""
    stride = stride or window
    summed = lax.reduce_window(
        x,
        jnp.zeros((), x.dtype),
        lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        "VALID",
    )
    return summed / (window * window)


def max_pool_3x3_s2(x: Array) -> Array:
    """torch ``MaxPool2d(3, stride=2, padding=1)`` — the ResNet stem pool."""
    return lax.reduce_window(
        x,
        jnp.asarray(-jnp.inf, x.dtype),
        lax.max,
        (1, 3, 3, 1),
        (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
