"""The decoder family registry.

Reference models.py:135-360 defines six decoder styles.  Five are
5-stage pyramids 1024 -> 512 -> 256 -> 128 -> 64 -> 32 -> pointwise(32, 1);
``shuffle`` instead derives every width from ``in_channels // 4**i``
(pixel-shuffle divides channels by 4 per stage) and ends in a BARE final
pixel-shuffle with no pointwise head (reference models.py:296-333), so
the config's channel list is unused there:

* ``deconv{k}[dw]``  — stride-2 transpose convs           (models.py:145-180)
* ``upconv``         — zero-unpool + 5x5 conv             (models.py:183-201)
* ``upproj``         — Laina two-branch upprojection      (models.py:203-222)
* ``nnconv{k}[dw]``  — conv then nearest x2 (FastDepth)   (models.py:224-270)
* ``blconv{k}[dw]``  — conv then bilinear x2              (models.py:272-294)
* ``shuffle{k}[dw]`` — pixel-shuffle then conv            (models.py:296-333)

All are channel-list parameterized here.  Stage param layout:
dense:      {'conv': {...}}
depthwise:  {'dw': {...}, 'pw': {...}}
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from fastdepth_tpu.config import DECODER_NAMES, UNPRUNED_DECODER_CHANNELS
from fastdepth_tpu.models import layers as L
from fastdepth_tpu.ops import blocks as B

Array = jax.Array


def parse_decoder_name(name: str) -> Tuple[str, int, bool]:
    """'nnconv5dw' -> ('nnconv', 5, True); mirrors choose_decoder parsing
    (reference models.py:335-360)."""
    if name not in DECODER_NAMES:
        raise ValueError(f"invalid decoder {name!r}; options: {DECODER_NAMES}")
    dw = name.endswith("dw")
    base = name[:-2] if dw else name
    if base in ("upconv", "upproj"):
        return base, 5, False
    kind, k = base[:-1], int(base[-1])
    return kind, k, dw


def _init_stage(key, kind: str, k: int, dw: bool, cin: int, cout: int) -> Dict:
    k1, k2 = jax.random.split(key)
    if kind == "deconv":
        if dw:
            return {
                "dw": L.init_convt_bn(k1, k, cin, cin, groups=cin),
                "pw": L.init_pointwise_bn(k2, cin, cout),
            }
        return {"conv": L.init_convt_bn(k1, k, cin, cout)}
    if kind == "upconv":
        return {"conv": L.init_conv_bn(k1, 5, cin, cout)}
    if kind == "upproj":
        k3 = jax.random.fold_in(key, 3)
        return {
            "branch1_conv1": L.init_conv_bn(k1, 5, cin, cout),
            "branch1_conv2": L.init_conv_bn(k2, 3, cout, cout),
            "branch2_conv": L.init_conv_bn(k3, 5, cin, cout),
        }
    # nnconv / blconv / shuffle share the conv-stage structure
    if dw:
        return {
            "dw": L.init_depthwise_bn(k1, k, cin),
            "pw": L.init_pointwise_bn(k2, cin, cout),
        }
    return {"conv": L.init_conv_bn(k1, k, cin, cout)}


def _apply_conv_stage(
    x: Array, p: Dict, *, train=False, stats=None, path=()
) -> Array:
    """conv or depthwise+pointwise stage with BN+ReLU each
    (reference models.py:52-75).  Kernel size is baked into the params
    at init time — nothing here depends on it."""
    if "dw" in p:
        x = L.apply_conv_bn(x, p["dw"], depthwise=True, train=train, stats=stats, path=path + ("dw",))
        x = L.apply_conv_bn(x, p["pw"], train=train, stats=stats, path=path + ("pw",))
        return x
    return L.apply_conv_bn(x, p["conv"], train=train, stats=stats, path=path + ("conv",))


def init_decoder(
    key: jax.Array,
    name: str,
    in_channels: int = 1024,
    channels: Sequence[int] = UNPRUNED_DECODER_CHANNELS,
) -> Dict:
    kind, k, dw = parse_decoder_name(name)
    keys = jax.random.split(key, 7)
    params: Dict = {}
    if kind == "shuffle":
        # pixel-shuffle divides channels by 4 before each conv
        # (reference models.py:296-333); widths derive from in_channels.
        cin = in_channels
        for i in range(1, 5):
            cin //= 4
            params[f"conv{i}"] = _init_stage(keys[i], "nnconv", k, dw, cin, cin)
        return params
    if len(channels) != 5:
        # apply_decoder walks exactly stage1..5 + final: a longer list
        # would silently orphan stages (and reuse 'final's RNG key), a
        # shorter one would die later with an opaque KeyError
        raise ValueError(
            f"decoder {name!r} takes exactly 5 stage channels, got "
            f"{len(channels)}: {tuple(channels)}")
    cin = in_channels
    for i, cout in enumerate(channels, start=1):
        params[f"stage{i}"] = _init_stage(keys[i], kind, k, dw, cin, cout)
        cin = cout
    params["final"] = {"pw": L.init_pointwise_bn(keys[6], cin, 1)}
    return params


def apply_decoder(
    params: Dict,
    name: str,
    x: Array,
    *,
    train: bool = False,
    stats: Optional[L.StatsDict] = None,
) -> Array:
    kind, k, dw = parse_decoder_name(name)

    if kind == "shuffle":
        for i in range(1, 5):
            x = B.pixel_shuffle(x, 2)
            x = _apply_conv_stage(x, params[f"conv{i}"], train=train, stats=stats, path=(f"conv{i}",))
        return B.pixel_shuffle(x, 2)

    for i in range(1, 6):
        p = params[f"stage{i}"]
        path = (f"stage{i}",)
        if kind == "deconv":
            if dw:
                x = L.apply_conv_bn(
                    x, p["dw"], transpose=True, stride=2, padding=(k - 1) // 2,
                    output_padding=k % 2, groups=x.shape[-1],
                    train=train, stats=stats, path=path + ("dw",),
                )
                x = L.apply_conv_bn(x, p["pw"], train=train, stats=stats, path=path + ("pw",))
            else:
                x = L.apply_conv_bn(
                    x, p["conv"], transpose=True, stride=2, padding=(k - 1) // 2,
                    output_padding=k % 2,
                    train=train, stats=stats, path=path + ("conv",),
                )
        elif kind == "upconv":
            x = B.unpool_zero(x)
            x = L.apply_conv_bn(x, p["conv"], train=train, stats=stats, path=path + ("conv",))
        elif kind == "upproj":
            x = B.unpool_zero(x)
            b1 = L.apply_conv_bn(x, p["branch1_conv1"], train=train, stats=stats, path=path + ("branch1_conv1",))
            b1 = L.apply_conv_bn(b1, p["branch1_conv2"], act=None, train=train, stats=stats, path=path + ("branch1_conv2",))
            b2 = L.apply_conv_bn(x, p["branch2_conv"], act=None, train=train, stats=stats, path=path + ("branch2_conv",))
            x = B.relu(b1 + b2)
        elif kind == "nnconv":
            x = _apply_conv_stage(x, p, train=train, stats=stats, path=path)
            x = B.upsample_nearest2x(x)
        elif kind == "blconv":
            x = _apply_conv_stage(x, p, train=train, stats=stats, path=path)
            x = B.upsample_bilinear2x(x)
        else:  # pragma: no cover
            raise ValueError(kind)

    return L.apply_conv_bn(x, params["final"]["pw"], train=train, stats=stats, path=("final", "pw"))
