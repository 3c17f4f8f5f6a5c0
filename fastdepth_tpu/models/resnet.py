"""ResNet encoder family + ResNet depth models.

Reference: models.py:363-418 (``ResNet`` + registry decoder),
models.py:462-556 (``ResNetSkipAdd``), models.py:558-652
(``ResNetSkipConcat``).  The reference borrows torchvision's resnet
implementation; here the backbone is re-implemented functionally in NHWC.

Torchvision topology reproduced exactly: conv1 7x7 s2 p3 -> BN -> ReLU ->
maxpool 3x3 s2 p1 -> layer1..4 of BasicBlock (18/34) or Bottleneck
(50/101/152); skip variants require BasicBlock widths (64/128/256/512) to
line up with the dense 5x5 decoder, matching the reference's behavior.
Beyond-reference: ``ModelConfig(bottleneck_skips=True)`` additionally
enables skips on Bottleneck depths — additive skips via linear 1x1+BN tap
projections, concat skips via decoder widths computed from the actual tap
channels (the reference's classes crash on these depths).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from fastdepth_tpu.config import ModelConfig
from fastdepth_tpu.models import decoders as D
from fastdepth_tpu.models import layers as L
from fastdepth_tpu.ops import blocks as B
from fastdepth_tpu.ops import init as I

Array = jax.Array

RESNET_LAYERS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}
BOTTLENECK = {50, 101, 152}
STAGE_WIDTHS = (64, 128, 256, 512)


def _init_basic_block(key, cin, cout, stride) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": L.init_conv_bn(k1, 3, cin, cout),
        "conv2": L.init_conv_bn(k2, 3, cout, cout),
    }
    if stride != 1 or cin != cout:
        p["downsample"] = L.init_conv_bn(k3, 1, cin, cout)
    return p


def _apply_basic_block(x, p, stride, *, train=False, stats=None, path=()):
    idn = x
    y = L.apply_conv_bn(x, p["conv1"], stride=stride, train=train, stats=stats, path=path + ("conv1",))
    y = L.apply_conv_bn(y, p["conv2"], act=None, train=train, stats=stats, path=path + ("conv2",))
    if "downsample" in p:
        idn = L.apply_conv_bn(x, p["downsample"], stride=stride, act=None,
                              train=train, stats=stats, path=path + ("downsample",))
    return B.relu(y + idn)


def _init_bottleneck(key, cin, cmid, stride) -> Dict:
    cout = cmid * 4
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "conv1": L.init_pointwise_bn(k1, cin, cmid),
        "conv2": L.init_conv_bn(k2, 3, cmid, cmid),
        "conv3": L.init_pointwise_bn(k3, cmid, cout),
    }
    if stride != 1 or cin != cout:
        p["downsample"] = L.init_conv_bn(k4, 1, cin, cout)
    return p


def _apply_bottleneck(x, p, stride, *, train=False, stats=None, path=()):
    idn = x
    y = L.apply_conv_bn(x, p["conv1"], train=train, stats=stats, path=path + ("conv1",))
    y = L.apply_conv_bn(y, p["conv2"], stride=stride, train=train, stats=stats, path=path + ("conv2",))
    y = L.apply_conv_bn(y, p["conv3"], act=None, train=train, stats=stats, path=path + ("conv3",))
    if "downsample" in p:
        idn = L.apply_conv_bn(x, p["downsample"], stride=stride, act=None,
                              train=train, stats=stats, path=path + ("downsample",))
    return B.relu(y + idn)


def init_resnet_encoder(key: jax.Array, layers: int, in_channels: int = 3) -> Dict:
    if layers not in RESNET_LAYERS:
        raise ValueError(f"resnet{layers} not defined; options {sorted(RESNET_LAYERS)}")
    blocks = RESNET_LAYERS[layers]
    bottleneck = layers in BOTTLENECK
    keys = jax.random.split(key, 5)
    params: Dict = {"conv1": L.init_conv_bn(keys[0], 7, in_channels, 64)}
    cin = 64
    for s, (width, n) in enumerate(zip(STAGE_WIDTHS, blocks), start=1):
        stage: Dict = {}
        bkeys = jax.random.split(keys[s], n)
        for b in range(n):
            stride = 2 if (b == 0 and s > 1) else 1
            if bottleneck:
                stage[f"block{b}"] = _init_bottleneck(bkeys[b], cin, width, stride)
                cin = width * 4
            else:
                stage[f"block{b}"] = _init_basic_block(bkeys[b], cin, width, stride)
                cin = width
        params[f"layer{s}"] = stage
    return params


def apply_resnet_encoder(
    params: Dict,
    x: Array,
    layers: int,
    *,
    train: bool = False,
    stats: Optional[L.StatsDict] = None,
) -> Tuple[Array, List[Array]]:
    """Returns (final features, [x1, x3, x4, x5, x6]) — the skip taps used by
    ResNetSkipAdd/Concat (reference models.py:515-531)."""
    blocks = RESNET_LAYERS[layers]
    bottleneck = layers in BOTTLENECK
    x1 = L.apply_conv_bn(x, params["conv1"], stride=2, padding=3,
                         train=train, stats=stats, path=("conv1",))
    y = B.max_pool_3x3_s2(x1)
    taps = [x1]
    for s, n in enumerate(blocks, start=1):
        stage = params[f"layer{s}"]
        for b in range(n):
            stride = 2 if (b == 0 and s > 1) else 1
            path = (f"layer{s}", f"block{b}")
            if bottleneck:
                y = _apply_bottleneck(y, stage[f"block{b}"], stride, train=train, stats=stats, path=path)
            else:
                y = _apply_basic_block(y, stage[f"block{b}"], stride, train=train, stats=stats, path=path)
        taps.append(y)
    return y, taps  # taps = [x1, x3, x4, x5, x6]


def _encoder_out_channels(layers: int) -> int:
    return 2048 if layers in BOTTLENECK else 512


def _tap_widths(layers: int) -> Tuple[int, ...]:
    """(x1, x3, x4, x5, x6) skip-tap channel widths (reference
    models.py:515-531 tap points; Bottleneck stages emit 4x)."""
    mult = 4 if layers in BOTTLENECK else 1
    return (64,) + tuple(w * mult for w in STAGE_WIDTHS)


# Additive-skip decoder stage output widths (reference models.py:502-507)
# paired with the tap each one receives, in forward order.
_ADD_TAP_PLAN = (("x6", 512), ("x5", 256), ("x4", 128), ("x3", 64), ("x1", 64))


def init_resnet_depth(key: jax.Array, cfg: ModelConfig) -> Dict:
    """ResNet / ResNetSkipAdd / ResNetSkipConcat parameter trees."""
    layers = int(cfg.encoder.replace("resnet", ""))
    k_enc, k_c2, k_dec = jax.random.split(key, 3)
    num = _encoder_out_channels(layers)
    params: Dict = {
        "encoder": init_resnet_encoder(k_enc, layers, cfg.in_channels),
        # 1x1 conv to 1024 with bias (reference models.py:399, 498:
        # nn.Conv2d(num_channels, 1024, 1) — default bias=True, zeroed
        # by weights_init)
        "conv2": {"w": I.he_normal_conv(k_c2, 1, 1, num, 1024),
                  "b": jnp.zeros((1024,))},
    }
    if cfg.skip is None:
        params["decoder"] = D.init_decoder(
            k_dec, cfg.decoder, in_channels=1024,
            channels=cfg.decoder_channels)
        return params

    # dense 5x5 decoder (models.py:502-507 / 598-603)
    x1w, x3w, x4w, x5w, x6w = _tap_widths(layers)
    if layers in BOTTLENECK and not cfg.bottleneck_skips:
        # Mechanism-level guard for direct callers that bypass
        # ModelConfig.validate(): without the opt-in flag, Bottleneck
        # skip trees must not silently grow the projected extension.
        raise ValueError(
            f"skip decoders support BasicBlock ResNets (18/34) only; "
            f"got {cfg.encoder!r} (Bottleneck tap widths don't match; "
            f"set bottleneck_skips=True for the projected extension)")
    if cfg.skip == "add":
        specs = [(1024, 512), (512, 256), (256, 128), (128, 64), (64, 32)]
        # Bottleneck extension (cfg.bottleneck_skips): 1x1+BN linear
        # projections onto the add widths for taps that don't already
        # match.  BasicBlock taps match exactly -> no projections, the
        # reference-parity tree is unchanged.
        proj_specs = {
            name: (tw, dw)
            for (name, dw), tw in zip(_ADD_TAP_PLAN, (x6w, x5w, x4w, x3w, x1w))
            if tw != dw
        }
    else:
        # concat widths from the actual tap channels; BasicBlock taps
        # reproduce the reference's 768/384/192/128 (models.py:598-602).
        specs = [(1024, 512), (512 + x5w, 256), (256 + x4w, 128),
                 (128 + x3w, 64), (64 + x1w, 32)]
        proj_specs = {}
    keys = jax.random.split(k_dec, 6 + len(proj_specs))
    decoder: Dict = {}
    for i, (cin, cout) in enumerate(specs, start=1):
        decoder[f"decode_conv{i}"] = {"conv": L.init_conv_bn(keys[i - 1], 5, cin, cout)}
    decoder["decode_conv6"] = {"pw": L.init_pointwise_bn(keys[5], 32, 1)}
    if proj_specs:
        decoder["skip_proj"] = {
            name: L.init_pointwise_bn(k, tw, dw)
            for k, (name, (tw, dw)) in zip(keys[6:], sorted(proj_specs.items()))
        }
    params["decoder"] = decoder
    return params


def apply_resnet_depth(
    params: Dict,
    x: Array,
    cfg: ModelConfig,
    *,
    train: bool = False,
    stats: Optional[L.StatsDict] = None,
) -> Array:
    layers = int(cfg.encoder.replace("resnet", ""))

    feats, taps = apply_resnet_encoder(
        params["encoder"], x, layers, train=train, stats=L.sub_stats(stats, "encoder"),
    )
    x1, x3, x4, x5, x6 = taps
    x7 = B.conv2d(feats, params["conv2"]["w"], bias=params["conv2"]["b"])

    dec = params["decoder"]
    if cfg.skip is None:
        return D.apply_decoder(dec, cfg.decoder, x7, train=train,
                               stats=L.sub_stats(stats, "decoder"))

    def dc(i, v):
        p = dec[f"decode_conv{i}"]
        key = "conv" if "conv" in p else "pw"
        return L.apply_conv_bn(v, p[key], train=train, stats=stats,
                               path=("decoder", f"decode_conv{i}", key))

    up = B.upsample_nearest2x
    if cfg.skip == "add":
        proj = dec.get("skip_proj", {})

        def tap(name, v):
            # Bottleneck extension: linear 1x1+BN projection onto the add
            # width (absent for BasicBlock nets — reference-parity path).
            if name not in proj:
                return v
            return L.apply_conv_bn(v, proj[name], act=None, train=train,
                                   stats=stats, path=("decoder", "skip_proj", name))

        # models.py:534-556
        y = dc(1, x7)
        y = up(y + tap("x6", x6))
        y = dc(2, y)
        y = up(y + tap("x5", x5))
        y = dc(3, y)
        y = up(y + tap("x4", x4))
        y = dc(4, y)
        y = up(y + tap("x3", x3))
        y = dc(5, y + tap("x1", x1))   # add BEFORE conv at stage 5 (models.py:550)
        y = up(y)
        return dc(6, y)
    # concat: models.py:630-652
    y = dc(1, x7)
    y = up(y)
    y = dc(2, jnp.concatenate([y, x5], axis=-1))
    y = up(y)
    y = dc(3, jnp.concatenate([y, x4], axis=-1))
    y = up(y)
    y = dc(4, jnp.concatenate([y, x3], axis=-1))
    y = up(y)
    y = dc(5, jnp.concatenate([y, x1], axis=-1))
    y = up(y)
    return dc(6, y)
