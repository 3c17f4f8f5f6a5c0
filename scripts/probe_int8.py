"""Probe: int8 quantized conv throughput on v5e via XLA.

The model is HBM-bound (docs/roofline.md); storing inter-stage
activations as int8 halves the traffic, and v5e's MXU runs int8 at 2x
bf16 rate.  Questions answered here before building a quantized path:
  1. does XLA lower int8 conv_general_dilated (dense + depthwise,
     preferred_element_type=int32) on this TPU at all?
  2. is an int8 decoder tail (quantize -> int8 dw -> requant -> int8 pw
     -> ...) faster than the bf16 tail in-context?
  3. what does an int8 full forward do end-to-end?

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
  python -u scripts/probe_int8.py > /tmp/probe_int8.log 2>&1
"""
import json
import os
import time

import numpy as np

import jax

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax

from fastdepth_tpu.engine.benchmark import time_pipelined
from fastdepth_tpu.ops import blocks as B

N = 128
RES = {}
rng = np.random.RandomState(0)


def bench(tag, fn, args, calls=30):
    t0 = time.time()
    try:
        stats = time_pipelined(fn, args, warmup=3, calls=calls)
        us = stats["mean_s"] / N * 1e6
        RES[tag] = round(us, 2)
        print(f"{tag}: {us:.2f} us/frame ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        RES[tag] = f"error: {type(e).__name__}"
        print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:140]}", flush=True)


_NHWC = ("NHWC", "HWIO", "NHWC")


def conv_i8(x8, w8, *, stride=1, padding=None, groups=1):
    k = w8.shape[0]
    if padding is None:
        padding = (k - 1) // 2
    return lax.conv_general_dilated(
        x8, w8, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_NHWC, feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )


def requant(y32, mult, bias32):
    """int32 acc -> relu -> int8 with a per-channel float multiplier."""
    y = jnp.maximum(y32 + bias32, 0).astype(jnp.float32) * mult
    return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


# ---- 1. isolated int8 convs compile/run at the dec4/dec5 shapes?
x8_56 = jnp.asarray(rng.randint(-127, 127, (N, 56, 56, 120)), jnp.int8)
w8_dw = jnp.asarray(rng.randint(-127, 127, (5, 5, 1, 120)), jnp.int8)
w8_pw = jnp.asarray(rng.randint(-127, 127, (1, 1, 120, 56)), jnp.int8)
bench("iso_i8_dw4", jax.jit(lambda a: conv_i8(a, w8_dw, groups=120)), (x8_56,))
bench("iso_i8_pw4", jax.jit(lambda a: conv_i8(a, w8_pw)), (x8_56,))

# bf16 references at the same shapes
xb_56 = x8_56.astype(jnp.bfloat16)
wb_dw = w8_dw.astype(jnp.bfloat16)
wb_pw = w8_pw.astype(jnp.bfloat16)
bench("iso_bf16_dw4", jax.jit(lambda a: B.depthwise_conv2d(a, wb_dw)), (xb_56,))
bench("iso_bf16_pw4", jax.jit(lambda a: B.conv2d(a, wb_pw)), (xb_56,))

# ---- 2. int8 decoder tail vs bf16 tail (stages 4+5+head, head-commuted)
x1_8 = jnp.asarray(rng.randint(-127, 127, (N, 112, 112, 56)), jnp.int8)
w8_dw5 = jnp.asarray(rng.randint(-127, 127, (5, 5, 1, 56)), jnp.int8)
w8_pw5 = jnp.asarray(rng.randint(-127, 127, (1, 1, 56, 16)), jnp.int8)
w8_h = jnp.asarray(rng.randint(-127, 127, (1, 1, 16, 1)), jnp.int8)
mults = {k: jnp.float32(v) for k, v in
         (("dw4", 1e-4), ("pw4", 1e-4), ("dw5", 1e-4), ("pw5", 1e-4))}
b32 = jnp.zeros((), jnp.int32)


def tail_i8(y8, s8):
    y = requant(conv_i8(y8, w8_dw, groups=120), mults["dw4"], b32)
    y = requant(conv_i8(y, w8_pw), mults["pw4"], b32)
    y = B.upsample_nearest2x(y)
    # int8 skip add: both int8 in the same scale here (probe simplification)
    z = jnp.clip(y.astype(jnp.int16) + s8.astype(jnp.int16), -127, 127).astype(jnp.int8)
    z = requant(conv_i8(z, w8_dw5, groups=56), mults["dw5"], b32)
    z = requant(conv_i8(z, w8_pw5), mults["pw5"], b32)
    h = conv_i8(z, w8_h).astype(jnp.float32) * 1e-4
    return B.upsample_nearest2x(jnp.maximum(h, 0))


def tail_bf16(y, s):
    wb_dw5 = w8_dw5.astype(jnp.bfloat16)
    wb_pw5 = w8_pw5.astype(jnp.bfloat16)
    wb_h = w8_h.astype(jnp.bfloat16)
    y = B.relu(B.depthwise_conv2d(y, wb_dw))
    y = B.relu(B.conv2d(y, wb_pw))
    y = B.upsample_nearest2x(y) + s
    y = B.relu(B.depthwise_conv2d(y, wb_dw5))
    y = B.relu(B.conv2d(y, wb_pw5))
    return B.upsample_nearest2x(B.relu(B.conv2d(y, wb_h)))


bench("tail_i8", jax.jit(tail_i8), (x8_56, x1_8))
bench("tail_bf16", jax.jit(tail_bf16), (xb_56, x1_8.astype(jnp.bfloat16)))

# ---- 3. int8 encoder block 1 (the other >bound hot spot, 112^2 x 16)
x8_112 = jnp.asarray(rng.randint(-127, 127, (N, 112, 112, 16)), jnp.int8)
w8_e1d = jnp.asarray(rng.randint(-127, 127, (3, 3, 1, 16)), jnp.int8)
w8_e1p = jnp.asarray(rng.randint(-127, 127, (1, 1, 16, 56)), jnp.int8)


def enc1_i8(a):
    y = requant(conv_i8(a, w8_e1d, groups=16), mults["dw4"], b32)
    return requant(conv_i8(y, w8_e1p), mults["pw4"], b32)


def enc1_bf16(a):
    y = B.relu6(B.depthwise_conv2d(a, w8_e1d.astype(jnp.bfloat16)))
    return B.relu6(B.conv2d(y, w8_e1p.astype(jnp.bfloat16)))


bench("enc1_i8", jax.jit(enc1_i8), (x8_112,))
bench("enc1_bf16", jax.jit(enc1_bf16), (x8_112.astype(jnp.bfloat16),))

with open("/tmp/probe_int8.json", "w") as f:
    json.dump(RES, f, indent=1)
print(json.dumps(RES, indent=1), flush=True)
