"""FastDepth: MobileNet encoder + NNConv5(dw) decoder with skip connections.

Reference semantics:
* ``MobileNetSkipAdd``    — models.py:654-732 (THE FastDepth model):
  encoder taps x1 = conv1 out, x2 = conv3 out, x3 = conv5 out; each decoder
  stage i in 1..5 runs dw5x5+pw then nearest x2 upsample, then adds
  x3 / x2 / x1 after stages 2 / 3 / 4; final pointwise(32 -> 1).
* ``MobileNetSkipConcat`` — models.py:734-814: same but channel-concat,
  widening decode_conv3/4/5 inputs.
* plain ``MobileNet``     — models.py:420-460: encoder -> any registry decoder.

Everything is channel-list parameterized so the NetAdapt-pruned network
(SURVEY.md §2) is the same code with ``FASTDEPTH_PRUNED``.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from fastdepth_tpu.config import ModelConfig
from fastdepth_tpu.models import decoders as D
from fastdepth_tpu.models import layers as L
from fastdepth_tpu.models import mobilenet as MN
from fastdepth_tpu.ops import blocks as B

Array = jax.Array

_SKIP_TAPS = (1, 3, 5)  # encoder block indices feeding skips (models.py:714-719)


def init_fastdepth(key: jax.Array, cfg: ModelConfig) -> Dict:
    cfg.validate()
    k_enc, k_dec = jax.random.split(key)
    params: Dict = {
        "encoder": MN.init_encoder(k_enc, cfg.encoder_channels, cfg.in_channels)
    }
    enc = cfg.encoder_channels
    dec = cfg.decoder_channels
    if len(dec) != 5:
        # apply_fastdepth walks exactly decode_conv1..5 + decode_conv6:
        # a longer list would orphan stages and reuse the final conv's
        # RNG key, a shorter one dies later with an opaque KeyError
        raise ValueError(
            f"decoder_channels must have exactly 5 entries, got "
            f"{len(dec)}: {tuple(dec)}")
    k = cfg.decoder_kernel
    keys = jax.random.split(k_dec, 6)
    cin = enc[-1]
    decoder: Dict = {}
    for i, cout in enumerate(dec, start=1):
        if cfg.decoder_depthwise:
            k1, k2 = jax.random.split(keys[i - 1])
            decoder[f"decode_conv{i}"] = {
                "dw": L.init_depthwise_bn(k1, k, cin),
                "pw": L.init_pointwise_bn(k2, cin, cout),
            }
        else:
            decoder[f"decode_conv{i}"] = {"conv": L.init_conv_bn(keys[i - 1], k, cin, cout)}
        cin = cout
        if cfg.skip == "concat":
            # concat widens the next stage's input (models.py:769-777)
            if i == 2:
                cin += enc[5]
            elif i == 3:
                cin += enc[3]
            elif i == 4:
                cin += enc[1]
    decoder["decode_conv6"] = {"pw": L.init_pointwise_bn(keys[5], cin, 1)}
    params["decoder"] = decoder
    return params


def apply_fastdepth(
    params: Dict,
    x: Array,
    cfg: ModelConfig,
    *,
    train: bool = False,
    stats: Optional[L.StatsDict] = None,
) -> Array:
    """NHWC forward: (N, 224, 224, 3) -> (N, 224, 224, 1)."""
    taps = _SKIP_TAPS if cfg.skip else ()
    feats, tapped = MN.apply_encoder(
        params["encoder"], x, relu6=cfg.encoder_relu6, taps=taps,
        train=train, stats=_sub_stats(stats, "encoder"),
    )
    y = feats
    dec = params["decoder"]
    # kernel size comes from the param shapes (decoder_kernel only
    # drives init); the skip family is nnconv-only (config.validate)
    for i in range(1, 6):
        p = dec[f"decode_conv{i}"]
        path = ("decoder", f"decode_conv{i}")
        if cfg.decoder_depthwise:
            y = L.apply_conv_bn(y, p["dw"], depthwise=True, train=train,
                                stats=stats, path=path + ("dw",))
            y = L.apply_conv_bn(y, p["pw"], train=train, stats=stats, path=path + ("pw",))
        else:
            y = L.apply_conv_bn(y, p["conv"], train=train, stats=stats, path=path + ("conv",))
        y = B.upsample_nearest2x(y)
        # skip fusion AFTER the upsample (models.py:720-729)
        if cfg.skip == "add":
            if i == 2:
                y = y + tapped[5]
            elif i == 3:
                y = y + tapped[3]
            elif i == 4:
                y = y + tapped[1]
        elif cfg.skip == "concat":
            if i == 2:
                y = jnp.concatenate([y, tapped[5]], axis=-1)
            elif i == 3:
                y = jnp.concatenate([y, tapped[3]], axis=-1)
            elif i == 4:
                y = jnp.concatenate([y, tapped[1]], axis=-1)
    return L.apply_conv_bn(
        y, dec["decode_conv6"]["pw"], train=train, stats=stats,
        path=("decoder", "decode_conv6", "pw"),
    )


# stats plumbing lives in layers.py (shared by every model family);
# kept as a module name for back-compat with older imports
_sub_stats = L.sub_stats


def init_mobilenet_decoder(key: jax.Array, cfg: ModelConfig) -> Dict:
    """Plain MobileNet + registry decoder, no skips (models.py:420-460)."""
    k_enc, k_dec = jax.random.split(key)
    return {
        "encoder": MN.init_encoder(k_enc, cfg.encoder_channels, cfg.in_channels),
        "decoder": D.init_decoder(
            k_dec, cfg.decoder, in_channels=cfg.encoder_channels[-1],
            channels=cfg.decoder_channels,
        ),
    }


def apply_mobilenet_decoder(
    params: Dict,
    x: Array,
    cfg: ModelConfig,
    *,
    train: bool = False,
    stats: Optional[L.StatsDict] = None,
) -> Array:
    feats, _ = MN.apply_encoder(
        params["encoder"], x, relu6=cfg.encoder_relu6,
        train=train, stats=_sub_stats(stats, "encoder"),
    )
    return D.apply_decoder(
        params["decoder"], cfg.decoder, feats,
        train=train, stats=_sub_stats(stats, "decoder"),
    )
