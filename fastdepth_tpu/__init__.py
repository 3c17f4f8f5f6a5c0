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
