from fastdepth_tpu.ops.blocks import (  # noqa: F401
    conv2d,
    depthwise_conv2d,
    conv2d_transpose,
    batch_norm,
    fold_bn,
    relu,
    relu6,
    upsample_nearest2x,
    upsample_bilinear2x,
    unpool_zero,
    pixel_shuffle,
    avg_pool,
    max_pool_3x3_s2,
)
from fastdepth_tpu.ops.init import he_normal_conv, he_normal_convt, bn_init  # noqa: F401
