"""Decisive probe: TIME the v3 manual-DMA kernel at a real shape with
DMA-legal lanes (C=Cout=128), plus compile probes for the two workaround
primitives (rank-3 folded-lane DMA; value reshape splitting lanes).

s4-like shape: N=32, H=W=56, C=128 (real s4 is 120), Cout=128 (real 56).
Round-1 auto-pipeline paid ~117 us/frame here; XLA in-context does the
REAL s4 in ~15.5 us/frame.  If v3 lands near the HBM bound (~7 us/frame
at these padded sizes), manual DMA kills the floor and the padding
workaround is worth building.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 3400 python -u scripts/bisect_v3e.py > /tmp/bisect_v3e.log 2>&1 &
"""
import os
import time

import numpy as np

import jax

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastdepth_tpu.engine.benchmark import time_pipelined
from fastdepth_tpu.ops import blocks as B
from fastdepth_tpu.ops.pallas.fused_decoder import fused_decoder_stage_v3

rng = np.random.RandomState(0)

# ---- 1. timed v3 at DMA-legal s4-like shape ----
N, H, C, Cout = 32, 56, 128, 128
dtype = jnp.bfloat16
x = jnp.asarray(rng.rand(N, H, H, C), dtype)
dw_w = jnp.asarray(rng.rand(5, 5, 1, C) * 0.1, dtype)
dw_b = jnp.asarray(rng.rand(C) * 0.1, dtype)
pw_w = jnp.asarray(rng.rand(1, 1, C, Cout) * 0.1, dtype)
pw_b = jnp.asarray(rng.rand(Cout) * 0.1, dtype)
skip = jnp.asarray(rng.rand(N, 2 * H, 2 * H, Cout), dtype)

for tag, sk in (("v3_s4like_C128_skip", skip), ("v3_s4like_C128_noskip", None)):
    t0 = time.time()
    try:
        fn = jax.jit(lambda x, sk=sk: fused_decoder_stage_v3(
            x, dw_w, dw_b, pw_w, pw_b, sk, block_batch=1))
        stats = time_pipelined(fn, (x,), warmup=3, calls=30)
        print(f"{tag}: {stats['mean_s']/N*1e6:.1f} us/frame "
              f"({time.time()-t0:.0f}s incl compile)", flush=True)
    except Exception as e:
        print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:110]} "
              f"({time.time()-t0:.0f}s)", flush=True)

# parity check at this shape (f32)
xf = jnp.asarray(rng.rand(4, H, H, C), jnp.float32)
dwf = jnp.asarray(rng.rand(5, 5, 1, C) * 0.1, jnp.float32)
dbf = jnp.asarray(rng.rand(C) * 0.1, jnp.float32)
pwf = jnp.asarray(rng.rand(1, 1, C, Cout) * 0.1, jnp.float32)
pbf = jnp.asarray(rng.rand(Cout) * 0.1, jnp.float32)
skf = jnp.asarray(rng.rand(4, 2 * H, 2 * H, Cout), jnp.float32)
try:
    ref = B.relu(B.depthwise_conv2d(xf, dwf, bias=dbf))
    ref = B.relu(B.conv2d(ref, pwf, bias=pbf))
    ref = B.upsample_nearest2x(ref) + skf
    got = fused_decoder_stage_v3(xf, dwf, dbf, pwf, pbf, skf)
    print(f"onchip parity maxdiff: {float(jnp.max(jnp.abs(ref-got))):.2e}",
          flush=True)
except Exception as e:
    print(f"onchip parity FAIL: {type(e).__name__}", flush=True)

# XLA same padded shape for context
t0 = time.time()
fn_x = jax.jit(lambda x: B.upsample_nearest2x(
    B.relu(B.conv2d(B.relu(B.depthwise_conv2d(x, dw_w, bias=dw_b)),
                    pw_w, bias=pw_b))) + skip)
stats = time_pipelined(fn_x, (x,), warmup=3, calls=30)
print(f"xla_s4like_C128_isolated: {stats['mean_s']/N*1e6:.1f} us/frame "
      f"({time.time()-t0:.0f}s)", flush=True)


# ---- 2. compile probes for workaround primitives ----
def timed(tag, fn):
    t0 = time.time()
    try:
        out = fn()
        print(f"{tag}: OK ({time.time()-t0:.0f}s) sum={np.asarray(out).sum():.1f}",
              flush=True)
    except Exception as e:
        print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:110]} ({time.time()-t0:.0f}s)",
              flush=True)


def rank3_folded_dma():
    """(1, H, W*C) DMA with W*C a 128-multiple (56*128=7168)."""
    n, h, wc = 4, 56, 56 * 128
    xx = jnp.asarray(rng.rand(n, h, wc), jnp.float32)

    def kernel(x_hbm, o_hbm, scr, osc, s1, s2):
        def body(i, _):
            d = pltpu.make_async_copy(x_hbm.at[pl.ds(i, 1)], scr, s1)
            d.start(); d.wait()
            osc[:] = scr[:] * 2.0
            d2 = pltpu.make_async_copy(osc, o_hbm.at[pl.ds(i, 1)], s2)
            d2.start(); d2.wait()
            return _
        jax.lax.fori_loop(0, n, body, None)

    return pl.pallas_call(
        kernel, grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((n, h, wc), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, h, wc), jnp.float32),
                        pltpu.VMEM((1, h, wc), jnp.float32),
                        pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(())],
    )(xx)


timed("rank3_folded_dma_7168", rank3_folded_dma)


def value_reshape_split():
    """DMA (1,H,W*C) then reshape VALUE (H, W*C)->(H,W,C) for compute."""
    n, h, w, c = 4, 56, 56, 128
    xx = jnp.asarray(rng.rand(n, h, w * c), jnp.float32)

    def kernel(x_hbm, o_hbm, scr, osc, s1, s2):
        def body(i, _):
            d = pltpu.make_async_copy(x_hbm.at[pl.ds(i, 1)], scr, s1)
            d.start(); d.wait()
            v = scr[0].reshape(h, w, c)       # split lanes
            v = v * 2.0 + v[:, :, :1]
            osc[:] = v.reshape(1, h, w * c)   # refold
            d2 = pltpu.make_async_copy(osc, o_hbm.at[pl.ds(i, 1)], s2)
            d2.start(); d2.wait()
            return _
        jax.lax.fori_loop(0, n, body, None)

    return pl.pallas_call(
        kernel, grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((n, h, w * c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, h, w * c), jnp.float32),
                        pltpu.VMEM((1, h, w * c), jnp.float32),
                        pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(())],
    )(xx)


timed("value_reshape_split", value_reshape_split)
print("bisect5 done", flush=True)
