"""Bisect round 4: the lane-size rule for manual DMA in grid=() kernels,
and the flat-DMA workaround.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 3400 python -u scripts/bisect_v3d.py > /tmp/bisect_v3d.log 2>&1 &
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

rng = np.random.RandomState(0)
N = 4


def timed(tag, fn):
    t0 = time.time()
    try:
        out = fn()
        print(f"{tag}: OK ({time.time()-t0:.0f}s) sum={np.asarray(out).sum():.1f}",
              flush=True)
        return True
    except Exception as e:
        print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:110]} ({time.time()-t0:.0f}s)",
              flush=True)
        return False


def dma_matmul(C, Cout, H=8, W=8):
    x = jnp.asarray(rng.rand(N, H, W, C), jnp.float32)
    w = jnp.asarray(rng.rand(C, Cout) * 0.1, jnp.float32)

    def kernel(x_hbm, w_ref, o_hbm, scr, osc, sem_i, sem_o):
        def body(i, _):
            d = pltpu.make_async_copy(x_hbm.at[pl.ds(i, 1)], scr, sem_i)
            d.start(); d.wait()
            y = jnp.dot(scr[:].reshape(H * W, C), w_ref[:],
                        preferred_element_type=jnp.float32)
            osc[:] = y.reshape(1, H, W, Cout)
            d2 = pltpu.make_async_copy(osc, o_hbm.at[pl.ds(i, 1)], sem_o)
            d2.start(); d2.wait()
            return _
        jax.lax.fori_loop(0, N, body, None)

    return pl.pallas_call(
        kernel, grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((N, H, W, Cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, H, W, C), jnp.float32),
                        pltpu.VMEM((1, H, W, Cout), jnp.float32),
                        pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(())],
    )(x, w)


# lane-size rule probes
timed("matmul_192to192", lambda: dma_matmul(192, 192))
timed("matmul_256to120", lambda: dma_matmul(256, 120))


def flat_dma(C, H=8, W=8):
    """DMA a flattened (1, H*W*C) slice; reshape as VALUES in the kernel."""
    x = jnp.asarray(rng.rand(N, H, W, C), jnp.float32)
    x_flat = x.reshape(N, H * W * C)

    def kernel(x_hbm, o_hbm, scr, osc, sem_i, sem_o):
        def body(i, _):
            d = pltpu.make_async_copy(x_hbm.at[pl.ds(i, 1)], scr, sem_i)
            d.start(); d.wait()
            v = scr[:].reshape(H, W, C) * 2.0
            osc[:] = v.reshape(1, H * W * C)
            d2 = pltpu.make_async_copy(osc, o_hbm.at[pl.ds(i, 1)], sem_o)
            d2.start(); d2.wait()
            return _
        jax.lax.fori_loop(0, N, body, None)

    return pl.pallas_call(
        kernel, grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((N, H * W * C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, H * W * C), jnp.float32),
                        pltpu.VMEM((1, H * W * C), jnp.float32),
                        pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(())],
    )(x_flat)


timed("flat_dma_C64_hwc4096", lambda: flat_dma(64))            # 4096 = 32*128
timed("flat_dma_C56_hwc3584", lambda: flat_dma(56))            # 3584 = 28*128
timed("flat_dma_C200_hw14_39200", lambda: flat_dma(200, 14, 14))  # 39200 = 306.25*128


def vmem_autocopy_small_lane(C=64, H=8, W=8):
    """grid=() with plain VMEM in/out specs (no manual DMA), small lane."""
    x = jnp.asarray(rng.rand(N, H, W, C), jnp.float32)

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    return pl.pallas_call(
        kernel, grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W, C), jnp.float32),
    )(x)


timed("vmem_autocopy_C64", vmem_autocopy_small_lane)


def dma_2d_small_lane(C=64, rows=64):
    """2-D (rows, C) DMA with lane=C<128 — is rank the issue?"""
    x = jnp.asarray(rng.rand(N, rows, C), jnp.float32)

    def kernel(x_hbm, o_hbm, scr, osc, sem_i, sem_o):
        def body(i, _):
            d = pltpu.make_async_copy(x_hbm.at[pl.ds(i, 1)], scr, sem_i)
            d.start(); d.wait()
            osc[:] = scr[:] * 2.0
            d2 = pltpu.make_async_copy(osc, o_hbm.at[pl.ds(i, 1)], sem_o)
            d2.start(); d2.wait()
            return _
        jax.lax.fori_loop(0, N, body, None)

    return pl.pallas_call(
        kernel, grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((N, rows, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, rows, C), jnp.float32),
                        pltpu.VMEM((1, rows, C), jnp.float32),
                        pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(())],
    )(x)


timed("dma_2d_C64", dma_2d_small_lane)
print("bisect4 done", flush=True)
