"""Op-level parity tests: every NHWC block must reproduce the reference's
torch op semantics per-pixel (torch CPU is the oracle; reference
models.py:18-107, imagenet/mobilenet.py:22-38)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from fastdepth_tpu import ops


def to_nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


def to_nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def test_conv2d_matches_torch(rng):
    x = rng.randn(2, 9, 9, 5).astype(np.float32)
    w_oihw = rng.randn(7, 5, 5, 5).astype(np.float32)  # OIHW
    out_t = F.conv2d(torch.from_numpy(to_nchw(x)), torch.from_numpy(w_oihw), padding=2)
    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))
    out_j = ops.conv2d(jnp.asarray(x), jnp.asarray(w_hwio))
    np.testing.assert_allclose(to_nhwc(out_t.numpy()), np.asarray(out_j), atol=1e-4)


@pytest.mark.parametrize("stride", [1, 2])
def test_depthwise_matches_torch(rng, stride):
    c = 6
    x = rng.randn(2, 8, 8, c).astype(np.float32)
    w_torch = rng.randn(c, 1, 5, 5).astype(np.float32)  # (cout, 1, kh, kw)
    out_t = F.conv2d(
        torch.from_numpy(to_nchw(x)), torch.from_numpy(w_torch),
        stride=stride, padding=2, groups=c,
    )
    w_hwio = np.transpose(w_torch, (2, 3, 1, 0))  # (kh, kw, 1, c)
    out_j = ops.depthwise_conv2d(jnp.asarray(x), jnp.asarray(w_hwio), stride=stride)
    np.testing.assert_allclose(to_nhwc(out_t.numpy()), np.asarray(out_j), atol=1e-4)


@pytest.mark.parametrize("k", [3, 5, 7, 9])
def test_conv_transpose_matches_torch(rng, k):
    # reference convt: stride 2, padding (k-1)//2, output_padding k%2
    # (models.py:77-87)
    stride, pad, opad = 2, (k - 1) // 2, k % 2
    x = rng.randn(1, 6, 6, 4).astype(np.float32)
    w_torch = rng.randn(4, 3, k, k).astype(np.float32)  # (cin, cout, kh, kw)
    out_t = F.conv_transpose2d(
        torch.from_numpy(to_nchw(x)), torch.from_numpy(w_torch),
        stride=stride, padding=pad, output_padding=opad,
    )
    w_hwoi = np.transpose(w_torch, (2, 3, 1, 0))  # (kh, kw, cout, cin)
    out_j = ops.conv2d_transpose(
        jnp.asarray(x), jnp.asarray(w_hwoi),
        stride=stride, padding=pad, output_padding=opad,
    )
    np.testing.assert_allclose(to_nhwc(out_t.numpy()), np.asarray(out_j), atol=1e-4)


@pytest.mark.parametrize("k", [3, 5])
def test_grouped_conv_transpose_matches_torch(rng, k):
    # reference convt_dw: depthwise transpose conv (models.py:89-99)
    c = 4
    stride, pad, opad = 2, (k - 1) // 2, k % 2
    x = rng.randn(1, 5, 5, c).astype(np.float32)
    w_torch = rng.randn(c, 1, k, k).astype(np.float32)  # (cin, cout/groups, kh, kw)
    out_t = F.conv_transpose2d(
        torch.from_numpy(to_nchw(x)), torch.from_numpy(w_torch),
        stride=stride, padding=pad, output_padding=opad, groups=c,
    )
    w_hwoi = np.transpose(w_torch, (2, 3, 1, 0))
    out_j = ops.conv2d_transpose(
        jnp.asarray(x), jnp.asarray(w_hwoi),
        stride=stride, padding=pad, output_padding=opad, groups=c,
    )
    np.testing.assert_allclose(to_nhwc(out_t.numpy()), np.asarray(out_j), atol=1e-4)


def test_batch_norm_matches_torch(rng):
    c = 5
    x = rng.randn(2, 4, 4, c).astype(np.float32)
    bn_t = torch.nn.BatchNorm2d(c).eval()
    with torch.no_grad():
        bn_t.weight.copy_(torch.from_numpy(rng.rand(c).astype(np.float32) + 0.5))
        bn_t.bias.copy_(torch.from_numpy(rng.randn(c).astype(np.float32)))
        bn_t.running_mean.copy_(torch.from_numpy(rng.randn(c).astype(np.float32)))
        bn_t.running_var.copy_(torch.from_numpy(rng.rand(c).astype(np.float32) + 0.2))
    out_t = bn_t(torch.from_numpy(to_nchw(x))).detach().numpy()
    p = {
        "scale": jnp.asarray(bn_t.weight.detach().numpy()),
        "bias": jnp.asarray(bn_t.bias.detach().numpy()),
        "mean": jnp.asarray(bn_t.running_mean.numpy()),
        "var": jnp.asarray(bn_t.running_var.numpy()),
    }
    out_j = ops.batch_norm(jnp.asarray(x), p)
    np.testing.assert_allclose(to_nhwc(out_t), np.asarray(out_j), atol=1e-5)


def test_fold_bn_equals_bn_of_conv(rng):
    x = rng.randn(1, 6, 6, 3).astype(np.float32)
    w = rng.randn(5, 5, 3, 8).astype(np.float32)
    bn = {
        "scale": jnp.asarray(rng.rand(8).astype(np.float32) + 0.5),
        "bias": jnp.asarray(rng.randn(8).astype(np.float32)),
        "mean": jnp.asarray(rng.randn(8).astype(np.float32)),
        "var": jnp.asarray(rng.rand(8).astype(np.float32) + 0.2),
    }
    ref = ops.batch_norm(ops.conv2d(jnp.asarray(x), jnp.asarray(w)), bn)
    w_f, b_f = ops.fold_bn(jnp.asarray(w), bn)
    got = ops.conv2d(jnp.asarray(x), w_f, bias=b_f)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)


def test_upsample_nearest2x_matches_torch(rng):
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    out_t = F.interpolate(torch.from_numpy(to_nchw(x)), scale_factor=2, mode="nearest")
    out_j = ops.upsample_nearest2x(jnp.asarray(x))
    np.testing.assert_array_equal(to_nhwc(out_t.numpy()), np.asarray(out_j))


def test_upsample_bilinear2x_matches_torch(rng):
    x = rng.randn(1, 6, 6, 2).astype(np.float32)
    out_t = F.interpolate(
        torch.from_numpy(to_nchw(x)), scale_factor=2,
        mode="bilinear", align_corners=False,
    )
    out_j = ops.upsample_bilinear2x(jnp.asarray(x))
    np.testing.assert_allclose(to_nhwc(out_t.numpy()), np.asarray(out_j), atol=1e-5)


def test_unpool_zero_matches_reference_unpool(rng):
    # Reference Unpool = grouped conv_transpose with kernel [[1,0],[0,0]]
    # (models.py:18-34)
    x = rng.randn(1, 4, 4, 3).astype(np.float32)
    c = 3
    mask = torch.zeros(c, 1, 2, 2)
    mask[:, :, 0, 0] = 1
    out_t = F.conv_transpose2d(torch.from_numpy(to_nchw(x)), mask, stride=2, groups=c)
    out_j = ops.unpool_zero(jnp.asarray(x))
    np.testing.assert_array_equal(to_nhwc(out_t.numpy()), np.asarray(out_j))


def test_pixel_shuffle_matches_torch(rng):
    x = rng.randn(2, 3, 4, 16).astype(np.float32)
    out_t = F.pixel_shuffle(torch.from_numpy(to_nchw(x)), 2)
    out_j = ops.pixel_shuffle(jnp.asarray(x), 2)
    np.testing.assert_array_equal(to_nhwc(out_t.numpy()), np.asarray(out_j))


def test_avg_pool_matches_torch(rng):
    x = rng.randn(1, 7, 7, 4).astype(np.float32)
    out_t = F.avg_pool2d(torch.from_numpy(to_nchw(x)), 7)
    out_j = ops.avg_pool(jnp.asarray(x), 7)
    np.testing.assert_allclose(to_nhwc(out_t.numpy()), np.asarray(out_j), atol=1e-5)


def test_max_pool_matches_torch(rng):
    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    out_t = F.max_pool2d(torch.from_numpy(to_nchw(x)), 3, stride=2, padding=1)
    out_j = ops.max_pool_3x3_s2(jnp.asarray(x))
    np.testing.assert_array_equal(to_nhwc(out_t.numpy()), np.asarray(out_j))


def test_relu6_matches_torch(rng):
    x = rng.randn(100).astype(np.float32) * 5
    out_t = F.relu6(torch.from_numpy(x))
    np.testing.assert_array_equal(out_t.numpy(), np.asarray(ops.relu6(jnp.asarray(x))))
