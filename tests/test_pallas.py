"""Pallas fused-decoder kernel parity (interpret mode on CPU; the same
kernels compile for TPU via Mosaic)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdepth_tpu.config import ModelConfig
from fastdepth_tpu.models import build
from fastdepth_tpu.models.fused import apply_fastdepth_fused
from fastdepth_tpu.ops import blocks as B
from fastdepth_tpu.ops.pallas.fused_decoder import (
    fused_decoder_stage,
    fused_pointwise_head,
)

TINY_ENC = (4, 6, 8, 10, 12, 14, 16, 16, 16, 16, 16, 16, 20, 24)
TINY_DEC = (18, 14, 10, 6, 4)


def _reference_stage(x, dw_w, dw_b, pw_w, pw_b, skip=None):
    y = B.relu(B.depthwise_conv2d(x, dw_w, bias=dw_b))
    y = B.relu(B.conv2d(y, pw_w, bias=pw_b))
    y = B.upsample_nearest2x(y)
    if skip is not None:
        y = y + skip
    return y


@pytest.mark.parametrize("has_skip", [False, True])
def test_fused_stage_matches_unfused(rng, has_skip):
    N, H, W, C, Cout = 2, 7, 7, 12, 6
    x = jnp.asarray(rng.randn(N, H, W, C).astype(np.float32))
    dw_w = jnp.asarray(rng.randn(5, 5, 1, C).astype(np.float32) * 0.2)
    dw_b = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    pw_w = jnp.asarray(rng.randn(1, 1, C, Cout).astype(np.float32) * 0.2)
    pw_b = jnp.asarray(rng.randn(Cout).astype(np.float32) * 0.1)
    skip = (
        jnp.asarray(rng.randn(N, 2 * H, 2 * W, Cout).astype(np.float32))
        if has_skip else None
    )
    ref = _reference_stage(x, dw_w, dw_b, pw_w, pw_b, skip)
    got = fused_decoder_stage(x, dw_w, dw_b, pw_w, pw_b, skip, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)


def test_fused_head_matches_unfused(rng):
    N, H, W, C = 2, 6, 6, 8
    x = jnp.asarray(rng.randn(N, H, W, C).astype(np.float32))
    w = jnp.asarray(rng.randn(1, 1, C, 1).astype(np.float32))
    b = jnp.asarray(rng.randn(1).astype(np.float32))
    ref = B.relu(B.conv2d(x, w, bias=b))
    got = fused_pointwise_head(x, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)


def test_fused_model_matches_reference_forward(rng):
    cfg = ModelConfig(encoder_channels=TINY_ENC, decoder_channels=TINY_DEC)
    model = build(cfg)
    params = model.fold(model.init(jax.random.PRNGKey(0)))
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    ref = model.apply(params, x)
    got = apply_fastdepth_fused(params, x, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)


def test_fused_rejects_unsupported_configs():
    cfg = ModelConfig(decoder="nnconv3dw", skip=None,
                      encoder_channels=TINY_ENC, decoder_channels=TINY_DEC)
    with pytest.raises(ValueError):
        apply_fastdepth_fused({}, jnp.zeros((1, 64, 64, 3)), cfg)
    # encoder family must be guarded too: a resnet skip-add config would
    # otherwise crash with an opaque KeyError inside the MobileNet walk
    cfg_rn = ModelConfig(encoder="resnet18", skip="add",
                         encoder_channels=TINY_ENC, decoder_channels=TINY_DEC)
    with pytest.raises(ValueError, match="MobileNet"):
        apply_fastdepth_fused({}, jnp.zeros((1, 64, 64, 3)), cfg_rn)


def test_fused_chunked_matches_reference_forward(rng):
    from fastdepth_tpu.models.fused import apply_fastdepth_fused_chunked

    cfg = ModelConfig(encoder_channels=TINY_ENC, decoder_channels=TINY_DEC)
    model = build(cfg)
    params = model.fold(model.init(jax.random.PRNGKey(0)))
    x = jnp.asarray(rng.rand(8, 64, 64, 3).astype(np.float32))
    ref = model.apply(params, x)
    got = apply_fastdepth_fused_chunked(params, x, cfg, chunk=4, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)


def test_fused_mixed_matches_reference_forward(rng):
    from fastdepth_tpu.models.fused import apply_fastdepth_mixed

    cfg = ModelConfig(encoder_channels=TINY_ENC, decoder_channels=TINY_DEC)
    model = build(cfg)
    params = model.fold(model.init(jax.random.PRNGKey(0)))
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    ref = model.apply(params, x)
    winners = {1: "pallas", 2: "xla", 3: "pallas", 4: "xla", 5: "pallas"}
    got = apply_fastdepth_mixed(params, x, cfg, winners, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)


@pytest.mark.parametrize("n", [16, 12])
def test_fused_mixed_large_batch_chunks_tail_stages(rng, n):
    """batch > 8 with pallas-winner LARGE-SPATIAL stages (4-5): the mixed
    path must grid-limit them (lax.map slices — the Mosaic helper 500s
    above grid ~8 on this platform) and stay value-identical, including
    the stage-4 skip add that chunks alongside the activations.  n=12
    exercises the non-multiple-of-8 batch: zero-pad to the chunk
    multiple, map, slice — 'compiles at any serving batch' means ANY."""
    from fastdepth_tpu.models.fused import apply_fastdepth_mixed

    cfg = ModelConfig(encoder_channels=TINY_ENC, decoder_channels=TINY_DEC)
    model = build(cfg)
    params = model.fold(model.init(jax.random.PRNGKey(0)))
    x = jnp.asarray(rng.rand(n, 32, 32, 3).astype(np.float32))
    ref = model.apply(params, x)
    winners = {1: "xla", 2: "xla", 3: "xla", 4: "pallas", 5: "pallas"}
    got = apply_fastdepth_mixed(params, x, cfg, winners, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)


def test_fused_hybrid_matches_reference_forward(rng):
    from fastdepth_tpu.models.fused import apply_fastdepth_fused_hybrid

    cfg = ModelConfig(encoder_channels=TINY_ENC, decoder_channels=TINY_DEC)
    model = build(cfg)
    params = model.fold(model.init(jax.random.PRNGKey(0)))
    x = jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32))
    ref = model.apply(params, x)
    got = apply_fastdepth_fused_hybrid(params, x, cfg, tail_chunk=2, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)


def test_fused_v2_hwbc_matches_reference_forward(rng):
    from fastdepth_tpu.models.fused import apply_fastdepth_fused_v2

    cfg = ModelConfig(encoder_channels=TINY_ENC, decoder_channels=TINY_DEC)
    model = build(cfg)
    params = model.fold(model.init(jax.random.PRNGKey(0)))
    x = jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32))
    ref = model.apply(params, x)
    got = apply_fastdepth_fused_v2(params, x, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)


@pytest.mark.parametrize("has_skip", [False, True])
@pytest.mark.parametrize("block_batch", [1, 2])
def test_fused_stage_v3_matches_unfused(rng, has_skip, block_batch):
    """Single-grid-step manual-DMA variant (double-buffered in/skip/out
    pipelines inside one kernel) == the unfused XLA ops."""
    from fastdepth_tpu.ops.pallas.fused_decoder import fused_decoder_stage_v3

    N, H, W, C, Cout = 4, 7, 7, 12, 6
    x = jnp.asarray(rng.randn(N, H, W, C).astype(np.float32))
    dw_w = jnp.asarray(rng.randn(5, 5, 1, C).astype(np.float32) * 0.2)
    dw_b = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    pw_w = jnp.asarray(rng.randn(1, 1, C, Cout).astype(np.float32) * 0.2)
    pw_b = jnp.asarray(rng.randn(Cout).astype(np.float32) * 0.1)
    skip = (
        jnp.asarray(rng.randn(N, 2 * H, 2 * W, Cout).astype(np.float32))
        if has_skip else None
    )
    ref = _reference_stage(x, dw_w, dw_b, pw_w, pw_b, skip)
    got = fused_decoder_stage_v3(x, dw_w, dw_b, pw_w, pw_b, skip,
                                 block_batch=block_batch, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)


def test_fused_v3_matches_reference_forward(rng):
    from fastdepth_tpu.models.fused import apply_fastdepth_fused_v3

    cfg = ModelConfig(encoder_channels=TINY_ENC, decoder_channels=TINY_DEC)
    model = build(cfg)
    params = model.fold(model.init(jax.random.PRNGKey(0)))
    x = jnp.asarray(rng.rand(8, 64, 64, 3).astype(np.float32))
    ref = model.apply(params, x)
    got = apply_fastdepth_fused_v3(params, x, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)
