"""MobileNetV1 backbone, channel-list parameterized.

Reference: imagenet/mobilenet.py:12-63 — stem conv_bn(3, 32, s2) followed
by 13 depthwise-separable blocks with strides (1,2,1,2,1,2,1,1,1,1,1,2,1)
and ReLU6 activations; classifier head = AvgPool2d(7) + Linear(1024,1000).

Channel lists make the NetAdapt-pruned FastDepth encoder (SURVEY.md §2)
the same code with a different config.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from fastdepth_tpu.config import MOBILENET_STRIDES, MOBILENET_V1_CHANNELS
from fastdepth_tpu.models import layers as L
from fastdepth_tpu.ops import blocks as B

Array = jax.Array


def init_encoder(
    key: jax.Array,
    channels: Sequence[int] = MOBILENET_V1_CHANNELS,
    in_channels: int = 3,
) -> Dict:
    """Params for the 14-layer encoder (stem + 13 blocks)."""
    keys = jax.random.split(key, 1 + 2 * 13)
    params: Dict = {"conv0": L.init_conv_bn(keys[0], 3, in_channels, channels[0])}
    cin = channels[0]
    for i in range(1, 14):
        cout = channels[i]
        params[f"conv{i}"] = {
            "dw": L.init_depthwise_bn(keys[2 * i - 1], 3, cin),
            "pw": L.init_pointwise_bn(keys[2 * i], cin, cout),
        }
        cin = cout
    return params


def apply_encoder(
    params: Dict,
    x: Array,
    *,
    relu6: bool = True,
    taps: Tuple[int, ...] = (),
    train: bool = False,
    stats: Optional[L.StatsDict] = None,
) -> Tuple[Array, Dict[int, Array]]:
    """Run the encoder; returns (features, {block_index: tap_activation}).

    ``taps`` are the block indices whose outputs feed skip connections
    (reference models.py:710-719 records i==1, 3, 5).
    """
    act = B.relu6 if relu6 else B.relu
    tapped: Dict[int, Array] = {}
    x = L.apply_conv_bn(
        x, params["conv0"], stride=2, act=act,
        train=train, stats=stats, path=("conv0",),
    )
    if 0 in taps:
        tapped[0] = x
    for i in range(1, 14):
        p = params[f"conv{i}"]
        stride = MOBILENET_STRIDES[i - 1]
        x = L.apply_conv_bn(
            x, p["dw"], stride=stride, act=act, depthwise=True,
            train=train, stats=stats, path=(f"conv{i}", "dw"),
        )
        x = L.apply_conv_bn(
            x, p["pw"], act=act,
            train=train, stats=stats, path=(f"conv{i}", "pw"),
        )
        if i in taps:
            tapped[i] = x
    return x, tapped


def init_classifier(key: jax.Array, features: int = 1024, classes: int = 1000) -> Dict:
    """ImageNet head (reference imagenet/mobilenet.py:55-57): AvgPool(7) + fc.

    torch Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(features)
    return {
        "fc": {
            "w": jax.random.uniform(kw, (features, classes), minval=-bound, maxval=bound),
            "b": jax.random.uniform(kb, (classes,), minval=-bound, maxval=bound),
        }
    }


def apply_classifier(params: Dict, feats: Array) -> Array:
    x = B.avg_pool(feats, feats.shape[1])  # global 7x7 pool at 224^2 input
    x = jnp.reshape(x, (x.shape[0], -1))
    return x @ params["fc"]["w"] + params["fc"]["b"]


def classifier_topk(
    logits: Array, labels: Array, ks: Tuple[int, ...] = (1, 5)
) -> Dict[int, Array]:
    """Top-k accuracies (fractions in [0, 1]) for a (N, classes) logits
    batch — the torch ImageNet harness's ``accuracy(output, target,
    topk=(1, 5))`` convention under which the reference's pretrained
    MobileNet reports its ``best_prec1`` (imagenet/mobilenet.py:65-76).

    Ties resolve like ``torch.topk``/``lax.top_k`` (first index wins);
    each accuracy is a device scalar, so batched eval stays on device."""
    kmax = max(ks)
    _, idx = jax.lax.top_k(logits, kmax)
    hits = idx == labels[:, None]
    return {k: jnp.mean(jnp.any(hits[:, :k], axis=1).astype(jnp.float32))
            for k in ks}
