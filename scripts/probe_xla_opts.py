"""Probe XLA-level decoder optimizations + a pure-DMA bandwidth sweep.

1. head-commute: apply the 1x1 head BEFORE the final nearest-x2 upsample
   (exact: per-pixel 1x1 conv + ReLU commute with nearest duplication) —
   saves the 224^2 x 16 intermediate.
2. tap-sum dw: dw5x5 written as 25 shifted multiply-adds on a padded
   activation, so XLA can fuse the whole depthwise into the pointwise
   dot's operand (XLA won't fuse conv->conv, but fuses elementwise into
   dot operands).
3. batch 256/512 full-model throughput.
4. grid=() Pallas DMA bandwidth vs chunk size (closes the manual-DMA
   question with numbers).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 3400 python -u scripts/probe_xla_opts.py > /tmp/probe_xla.log 2>&1 &
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

from fastdepth_tpu.engine.benchmark import time_pipelined
from fastdepth_tpu.models import fastdepth_pruned
from fastdepth_tpu.ops import blocks as B

RES = {}
rng = np.random.RandomState(0)
model = fastdepth_pruned()
cfg = model.config
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      model.fold(model.init(jax.random.PRNGKey(0))))


def bench(tag, fn, args, frames, calls=30):
    t0 = time.time()
    try:
        stats = time_pipelined(fn, args, warmup=3, calls=calls)
        us = stats["mean_s"] / frames * 1e6
        RES[tag] = round(us, 2)
        print(f"{tag}: {us:.1f} us/frame ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        RES[tag] = f"error: {type(e).__name__}"
        print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:120]} "
              f"({time.time()-t0:.0f}s)", flush=True)


def tapsum_dw(x, w, b):
    """dw5x5 as 25 shifted multiply-adds (XLA-fusible elementwise)."""
    N, H, W, C = x.shape
    w = w.reshape(5, 5, C)
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    acc = None
    for dh in range(5):
        for dw_ in range(5):
            t = xp[:, dh:dh + H, dw_:dw_ + W, :] * w[dh, dw_]
            acc = t if acc is None else acc + t
    return acc + b


def stage_ref(x, p, skip):
    y = B.relu(B.depthwise_conv2d(x, p["dw"]["w"], bias=p["dw"]["b"]))
    y = B.relu(B.conv2d(y, p["pw"]["w"], bias=p["pw"]["b"]))
    y = B.upsample_nearest2x(y)
    return y + skip if skip is not None else y


def stage_tapsum(x, p, skip):
    y = jnp.maximum(tapsum_dw(x, p["dw"]["w"], p["dw"]["b"]), 0)
    y = B.relu(B.conv2d(y, p["pw"]["w"], bias=p["pw"]["b"]))
    y = B.upsample_nearest2x(y)
    return y + skip if skip is not None else y


# ---- model variants ----
def fwd_ref(p, x):
    return model.apply(p, x)


def fwd_variant(p, x, tapsum_stages=(), head_commute=False):
    from fastdepth_tpu.models import mobilenet as MN

    feats, tapped = MN.apply_encoder(p["encoder"], x, relu6=True, taps=(1, 3, 5))
    dec = p["decoder"]
    y = feats
    skips = {2: tapped[5], 3: tapped[3], 4: tapped[1]}
    for i in range(1, 6):
        pi = dec[f"decode_conv{i}"]
        skip = skips.get(i)
        dw_fn = stage_tapsum if i in tapsum_stages else stage_ref
        if i == 5 and head_commute:
            # dw + pw of stage 5 (no upsample), then head at 112^2,
            # then ONE upsample of the 1-channel map
            if i in tapsum_stages:
                y = jnp.maximum(tapsum_dw(y, pi["dw"]["w"], pi["dw"]["b"]), 0)
            else:
                y = B.relu(B.depthwise_conv2d(y, pi["dw"]["w"], bias=pi["dw"]["b"]))
            y = B.relu(B.conv2d(y, pi["pw"]["w"], bias=pi["pw"]["b"]))
            head = dec["decode_conv6"]["pw"]
            y = B.relu(B.conv2d(y, head["w"], bias=head["b"]))
            return B.upsample_nearest2x(y)
        y = dw_fn(y, pi, skip)
    head = dec["decode_conv6"]["pw"]
    return B.relu(B.conv2d(y, head["w"], bias=head["b"]))


x128 = jnp.asarray(rng.rand(128, 224, 224, 3), jnp.bfloat16)

# correctness first (f32, small batch)
p32 = model.fold(model.init(jax.random.PRNGKey(0)))
x4 = jnp.asarray(rng.rand(4, 224, 224, 3), jnp.float32)
ref = np.asarray(jax.jit(fwd_ref)(p32, x4))
for tag, kw in (
    ("headcomm", dict(head_commute=True)),
    ("tapsum45", dict(tapsum_stages=(4, 5))),
    ("tapsum_all_headcomm", dict(tapsum_stages=(1, 2, 3, 4, 5), head_commute=True)),
):
    got = np.asarray(jax.jit(lambda p, x, kw=kw: fwd_variant(p, x, **kw))(p32, x4))
    md = float(np.abs(ref - got).max())
    print(f"parity {tag}: maxdiff={md:.2e}", flush=True)
    RES[f"parity_{tag}"] = md

bench("model_ref_b128", jax.jit(fwd_ref), (params, x128), 128)
bench("model_headcomm_b128",
      jax.jit(lambda p, x: fwd_variant(p, x, head_commute=True)),
      (params, x128), 128)
bench("model_tapsum45_headcomm_b128",
      jax.jit(lambda p, x: fwd_variant(p, x, tapsum_stages=(4, 5), head_commute=True)),
      (params, x128), 128)
bench("model_tapsum_all_headcomm_b128",
      jax.jit(lambda p, x: fwd_variant(p, x, tapsum_stages=(1, 2, 3, 4, 5),
                                       head_commute=True)),
      (params, x128), 128)

# ---- batch scaling ----
for b in (256, 512):
    xb = jnp.asarray(rng.rand(b, 224, 224, 3), jnp.bfloat16)
    bench(f"model_ref_b{b}", jax.jit(fwd_ref), (params, xb), b, calls=15)
    bench(f"model_best_b{b}",
          jax.jit(lambda p, x: fwd_variant(p, x, tapsum_stages=(4, 5),
                                           head_commute=True)),
          (params, xb), b, calls=15)

# ---- pure DMA bandwidth sweep (pallas grid=(), chunked copy) ----
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def dma_copy(total_mb=64, chunk_rows=256):
    rows, lanes = 8192, 1024  # 32 MB f32
    xx = jnp.asarray(rng.rand(rows, lanes), jnp.float32)
    nchunks = rows // chunk_rows

    def kernel(x_hbm, o_hbm, scr, sem_i, sem_o):
        def body(i, _):
            sl = jax.lax.rem(i, 2)
            d = pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * chunk_rows, chunk_rows)], scr.at[sl], sem_i.at[sl])
            d.start(); d.wait()
            d2 = pltpu.make_async_copy(
                scr.at[sl], o_hbm.at[pl.ds(i * chunk_rows, chunk_rows)], sem_o.at[sl])
            d2.start(); d2.wait()
            return _
        jax.lax.fori_loop(0, nchunks, body, None)

    fn = jax.jit(lambda x: pl.pallas_call(
        kernel, grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, chunk_rows, lanes), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,))],
    )(x))
    t0 = time.time()
    try:
        stats = time_pipelined(fn, (xx,), warmup=3, calls=20)
        gbps = 2 * xx.nbytes / stats["mean_s"] / 1e9  # read + write
        RES[f"dma_gbps_chunk{chunk_rows}"] = round(gbps, 1)
        print(f"dma chunk_rows={chunk_rows} ({chunk_rows*lanes*4//1024} KB): "
              f"{gbps:.0f} GB/s ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        RES[f"dma_gbps_chunk{chunk_rows}"] = f"error: {type(e).__name__}"
        print(f"dma chunk_rows={chunk_rows}: FAIL {type(e).__name__} "
              f"({time.time()-t0:.0f}s)", flush=True)


for cr in (64, 256, 1024, 4096):
    dma_copy(chunk_rows=cr)

with open("/tmp/probe_xla.json", "w") as f:
    json.dump(RES, f, indent=1)
print(json.dumps(RES, indent=1), flush=True)
