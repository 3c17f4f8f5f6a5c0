"""Bisect round 3: which compute op fails when Cout != C inside the
grid=() manual-DMA kernel.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 3400 python -u scripts/bisect_v3c.py > /tmp/bisect_v3c.log 2>&1 &
"""
import functools
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

N, H, W = 4, 8, 8
rng = np.random.RandomState(0)


def make_kernel(C, Cout, mode):
    def kernel(x_hbm, w_ref, o_hbm, scr, osc, pad, sem_i, sem_o):
        def in_dma(i):
            return pltpu.make_async_copy(x_hbm.at[pl.ds(i, 1)], scr, sem_i)

        def out_dma(i):
            return pltpu.make_async_copy(osc, o_hbm.at[pl.ds(i, 1)], sem_o)

        def body(i, _):
            dma = in_dma(i)
            dma.start()
            dma.wait()
            xin = scr[:].astype(jnp.float32)  # (1, H, W, C)
            if mode == "matmul":          # pw only, no taps, no upsample
                y = jnp.dot(xin.reshape(H * W, C), w_ref[:],
                            preferred_element_type=jnp.float32)
                osc[:] = y.reshape(1, H, W, Cout)
            elif mode == "matmul_up":     # pw + upsample
                y = jnp.dot(xin.reshape(H * W, C), w_ref[:],
                            preferred_element_type=jnp.float32).reshape(1, H, W, Cout)
                up = jnp.broadcast_to(y[:, :, None, :, None, :],
                                      (1, H, 2, W, 2, Cout))
                osc[:] = up.reshape(1, 2 * H, 2 * W, Cout)
            elif mode == "taps":          # dw taps only (C==Cout required)
                pad[:] = jnp.zeros_like(pad)
                pad[:, 2:H + 2, 2:W + 2, :] = xin
                acc = jnp.zeros((1, H, W, C), jnp.float32)
                for dw in range(5):
                    sh = pad[:, :, dw:dw + W, :]
                    for dh in range(5):
                        acc += sh[:, dh:dh + H] * 0.04
                osc[:] = acc
            elif mode == "up_only":       # upsample only (C==Cout)
                up = jnp.broadcast_to(xin[:, :, None, :, None, :],
                                      (1, H, 2, W, 2, C))
                osc[:] = up.reshape(1, 2 * H, 2 * W, C)
            dma2 = out_dma(i)
            dma2.start()
            dma2.wait()
            return _

        jax.lax.fori_loop(0, N, body, None)

    return kernel


def run(tag, C, Cout, mode, out_hw):
    t0 = time.time()
    x = jnp.asarray(rng.rand(N, H, W, C), jnp.float32)
    w = jnp.asarray(rng.rand(C, Cout) * 0.1, jnp.float32)
    try:
        out = pl.pallas_call(
            make_kernel(C, Cout, mode),
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((N, out_hw, out_hw, Cout), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((1, H, W, C), jnp.float32),
                pltpu.VMEM((1, out_hw, out_hw, Cout), jnp.float32),
                pltpu.VMEM((1, H + 4, W + 4, C), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        )(x, w)
        print(f"{tag}: OK ({time.time()-t0:.0f}s) sum={np.asarray(out).sum():.1f}",
              flush=True)
    except Exception as e:
        print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:110]} ({time.time()-t0:.0f}s)",
              flush=True)


run("matmul_128to64", 128, 64, "matmul", H)
run("matmul_128to128", 128, 128, "matmul", H)
run("matmul_up_128to64", 128, 64, "matmul_up", 2 * H)
run("taps_120", 120, 120, "taps", H)
run("up_only_64", 64, 64, "up_only", 2 * H)
run("matmul_120to56", 120, 56, "matmul", H)
run("matmul_128to256", 128, 256, "matmul", H)
print("bisect3 done", flush=True)
