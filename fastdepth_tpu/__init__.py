"""fastdepth_tpu — a TPU-native monocular depth estimation framework.

A ground-up JAX / XLA / Pallas re-design of the capabilities of
dwofk/fast-depth (ICRA 2019): MobileNet/ResNet encoders, the NNConv5
depthwise-separable decoder family with additive/concat skip connections,
the NYU Depth v2 data pipeline, depth metrics, training, checkpointing,
AOT deployment and benchmarking — all engineered TPU-first:

* NHWC layouts, static shapes, ``jax.jit``-compiled end to end.
* BatchNorm folding for inference; fused Pallas decoder kernels.
* Data parallelism over a ``jax.sharding.Mesh`` (ICI collectives via XLA).
* A host-side vectorized preprocessing pipeline replacing the reference's
  per-item PIL/scipy path (reference: dataloaders/transforms.py).
"""

__version__ = "0.1.0"

from fastdepth_tpu.config import (  # noqa: F401
    ModelConfig,
    MOBILENET_V1_CHANNELS,
    PRUNED_ENCODER_CHANNELS,
    PRUNED_DECODER_CHANNELS,
)

# Lazy top-level re-exports (PEP 562): the flat API documented in
# docs/api.md — `from fastdepth_tpu import Evaluator, Trainer, ...` —
# without making `import fastdepth_tpu` pull in jax (config stays
# importable in torch-only converter contexts and before the test
# conftest pins the CPU platform).
_EXPORTS = {
    "Model": "fastdepth_tpu.models.registry",
    "build": "fastdepth_tpu.models.registry",
    "from_name": "fastdepth_tpu.models.registry",
    "fastdepth_pruned": "fastdepth_tpu.models.registry",
    "fastdepth_unpruned": "fastdepth_tpu.models.registry",
    "NYUDataset": "fastdepth_tpu.data.nyu",
    "BatchLoader": "fastdepth_tpu.data.loader",
    "Trainer": "fastdepth_tpu.train.trainer",
    "TrainState": "fastdepth_tpu.train.trainer",
    "sgd_init": "fastdepth_tpu.train.trainer",
    "train_step": "fastdepth_tpu.train.trainer",
    "l1_loss": "fastdepth_tpu.train.loss",
    "masked_l1_loss": "fastdepth_tpu.train.loss",
    "make_mesh": "fastdepth_tpu.parallel.mesh",
    "make_mesh_2d": "fastdepth_tpu.parallel.mesh",
    "mesh_from_cli": "fastdepth_tpu.parallel.mesh",
    "replicate": "fastdepth_tpu.parallel.mesh",
    "shard_activations": "fastdepth_tpu.parallel.mesh",
    "shard_batch": "fastdepth_tpu.parallel.mesh",
    "save_checkpoint": "fastdepth_tpu.checkpoint.io",
    "load_checkpoint": "fastdepth_tpu.checkpoint.io",
    "Evaluator": "fastdepth_tpu.engine.evaluator",
    "validate": "fastdepth_tpu.engine.evaluator",
    "Result": "fastdepth_tpu.metrics",
    "AverageMeter": "fastdepth_tpu.metrics",
}


def __getattr__(name: str):
    target = _EXPORTS.get(name)
    if target is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(target), name)


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))
