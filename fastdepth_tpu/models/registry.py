"""Model registry: config -> (init, apply) and name-string parsing.

Replaces the reference's string-driven construction (``choose_decoder``,
models.py:335-360, plus the per-class zoo) with explicit configs.  Name
strings like 'mobilenet-nnconv5dw-skipadd[-pruned]' (the reference's
released-model naming, README.md:39-41) are parsed for CLI compatibility.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax

from fastdepth_tpu.config import (
    FASTDEPTH_PRUNED,
    FASTDEPTH_UNPRUNED,
    ModelConfig,
    PRUNED_DECODER_CHANNELS,
    PRUNED_ENCODER_CHANNELS,
)
from fastdepth_tpu.models import fastdepth as FD
from fastdepth_tpu.models import layers as L
from fastdepth_tpu.models import resnet as RN

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Model:
    """A bound (config, init, apply) triple — the framework's model handle."""

    config: ModelConfig
    init: Callable[[jax.Array], Dict]
    apply: Callable[..., Array]

    def fold(self, params: Dict) -> Dict:
        """Fold all BatchNorms for the inference fast path.

        Dense deconv decoders hold HWOI transpose-conv weights under
        their stages' ``conv`` key — BN scale applies on axis 2 there
        (grouped deconv-dw weights are (k, k, 1, C): the trailing axis
        is the BN axis, like ordinary depthwise)."""
        tk = (("conv",) if (self.config.decoder.startswith("deconv")
                            and not self.config.decoder_depthwise) else ())
        return L.tree_fold(params, transpose_keys=tk)


def build(cfg: ModelConfig) -> Model:
    cfg.validate()
    if cfg.encoder == "mobilenet":
        if cfg.skip is None:
            return Model(
                cfg,
                init=lambda key: FD.init_mobilenet_decoder(key, cfg),
                apply=lambda params, x, **kw: FD.apply_mobilenet_decoder(params, x, cfg, **kw),
            )
        return Model(
            cfg,
            init=lambda key: FD.init_fastdepth(key, cfg),
            apply=lambda params, x, **kw: FD.apply_fastdepth(params, x, cfg, **kw),
        )
    if cfg.encoder.startswith("resnet"):
        return Model(
            cfg,
            init=lambda key: RN.init_resnet_depth(key, cfg),
            apply=lambda params, x, **kw: RN.apply_resnet_depth(params, x, cfg, **kw),
        )
    raise ValueError(f"unknown encoder family: {cfg.encoder!r}")


def from_name(name: str) -> Model:
    """Parse 'mobilenet-nnconv5dw-skipadd-pruned' style names
    (reference README.md:39-41 model naming)."""
    parts = name.split("-")
    encoder = parts[0]
    decoder = parts[1] if len(parts) > 1 else "nnconv5dw"
    skip: Optional[str] = None
    pruned = "pruned" in parts
    if "skipadd" in parts:
        skip = "add"
    elif "skipconcat" in parts:
        skip = "concat"
    if encoder == "mobilenet":
        cfg = ModelConfig(
            encoder="mobilenet",
            decoder=decoder,
            skip=skip,
            encoder_channels=PRUNED_ENCODER_CHANNELS if pruned else FASTDEPTH_UNPRUNED.encoder_channels,
            decoder_channels=PRUNED_DECODER_CHANNELS if pruned else FASTDEPTH_UNPRUNED.decoder_channels,
        )
    else:
        cfg = ModelConfig(encoder=encoder, decoder=decoder, skip=skip)
    return build(cfg)


# The two released FastDepth variants.
def fastdepth_unpruned() -> Model:
    return build(FASTDEPTH_UNPRUNED)


def fastdepth_pruned() -> Model:
    return build(FASTDEPTH_PRUNED)
