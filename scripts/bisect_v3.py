"""Bisect which construct in the v3 manual-DMA kernel the remote Mosaic
compile helper rejects.  Tiny shapes; each failing compile returns in
seconds, successes in ~1 min.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 3400 python -u scripts/bisect_v3.py > /tmp/bisect_v3.log 2>&1 &
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

N, H, W, C = 4, 8, 8, 128
x = jnp.asarray(np.random.RandomState(0).rand(N, H, W, C), jnp.float32)


def run(tag, kernel, scratch_shapes, n_out=None):
    t0 = time.time()
    try:
        out = pl.pallas_call(
            kernel,
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((n_out or N, H, W, C), jnp.float32),
            scratch_shapes=scratch_shapes,
        )(x)
        got = np.asarray(out)
        print(f"{tag}: OK ({time.time()-t0:.0f}s) sum={got.sum():.1f}", flush=True)
        return True
    except Exception as e:
        print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:140]} "
              f"({time.time()-t0:.0f}s)", flush=True)
        return False


# A: single static DMA in + compute + DMA out, no loop
def k_a(x_hbm, o_hbm, scr, osc, sem_i, sem_o):
    cp = pltpu.make_async_copy(x_hbm, scr, sem_i)
    cp.start()
    cp.wait()
    osc[:] = scr[:] * 2.0
    cp2 = pltpu.make_async_copy(osc, o_hbm, sem_o)
    cp2.start()
    cp2.wait()


run("A_static_dma", k_a,
    [pltpu.VMEM((N, H, W, C), jnp.float32), pltpu.VMEM((N, H, W, C), jnp.float32),
     pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(())])


# B: fori_loop over N, per-image sliced DMA, single buffer (slot 0 static)
def k_b(x_hbm, o_hbm, scr, osc, sem_i, sem_o):
    def body(i, _):
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(i, 1)], scr, sem_i)
        cp.start()
        cp.wait()
        osc[:] = scr[:] * 2.0
        cp2 = pltpu.make_async_copy(osc, o_hbm.at[pl.ds(i, 1)], sem_o)
        cp2.start()
        cp2.wait()
        return _
    jax.lax.fori_loop(0, N, body, None)


run("B_loop_static_slot", k_b,
    [pltpu.VMEM((1, H, W, C), jnp.float32), pltpu.VMEM((1, H, W, C), jnp.float32),
     pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(())])


# C: B + dynamic slot indexing of scratch + sem arrays
def k_c(x_hbm, o_hbm, scr, osc, sem_i, sem_o):
    def body(i, _):
        slot = jax.lax.rem(i, 2)
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(i, 1)], scr.at[slot], sem_i.at[slot])
        cp.start()
        cp.wait()
        osc[slot] = scr[slot] * 2.0
        cp2 = pltpu.make_async_copy(osc.at[slot], o_hbm.at[pl.ds(i, 1)], sem_o.at[slot])
        cp2.start()
        cp2.wait()
        return _
    jax.lax.fori_loop(0, N, body, None)


run("C_dynamic_slot", k_c,
    [pltpu.VMEM((2, 1, H, W, C), jnp.float32), pltpu.VMEM((2, 1, H, W, C), jnp.float32),
     pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,))])


# D: C + pl.when guards + true double buffering (the v3 skeleton)
def k_d(x_hbm, o_hbm, scr, osc, sem_i, sem_o):
    def in_dma(slot, i):
        return pltpu.make_async_copy(x_hbm.at[pl.ds(i, 1)], scr.at[slot], sem_i.at[slot])

    def out_dma(slot, i):
        return pltpu.make_async_copy(osc.at[slot], o_hbm.at[pl.ds(i, 1)], sem_o.at[slot])

    in_dma(0, 0).start()

    def body(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < N)
        def _():
            in_dma(nxt, i + 1).start()

        in_dma(slot, i).wait()

        @pl.when(i >= 2)
        def _():
            out_dma(slot, i - 2).wait()

        osc[slot] = scr[slot] * 2.0
        out_dma(slot, i).start()
        return _

    jax.lax.fori_loop(0, N, body, None)

    @pl.when(N >= 2)
    def _():
        out_dma(jax.lax.rem(N - 2, 2), N - 2).wait()

    out_dma(jax.lax.rem(N - 1, 2), N - 1).wait()


run("D_double_buffer", k_d,
    [pltpu.VMEM((2, 1, H, W, C), jnp.float32), pltpu.VMEM((2, 1, H, W, C), jnp.float32),
     pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,))])


# E: D + the real stage compute (dw5x5 taps via pad scratch + matmul + upsample)
from fastdepth_tpu.ops.pallas.fused_decoder import _compute_stage


def k_e(x_hbm, o_hbm, scr, osc, pad, sem_i, sem_o):
    dww = jnp.full((5, 5, C), 0.1, jnp.float32)
    dwb = jnp.zeros((C,), jnp.float32)
    pww = jnp.eye(C, dtype=jnp.float32)
    pwb = jnp.zeros((C,), jnp.float32)

    def in_dma(slot, i):
        return pltpu.make_async_copy(x_hbm.at[pl.ds(i, 1)], scr.at[slot], sem_i.at[slot])

    def out_dma(slot, i):
        return pltpu.make_async_copy(osc.at[slot], o_hbm.at[pl.ds(i, 1)], sem_o.at[slot])

    in_dma(0, 0).start()

    def body(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < N)
        def _():
            in_dma(nxt, i + 1).start()

        in_dma(slot, i).wait()

        @pl.when(i >= 2)
        def _():
            out_dma(slot, i - 2).wait()

        up = _compute_stage(scr[slot].astype(jnp.float32), pad,
                            dww, dwb, pww, pwb, H, W, C, C)
        osc[slot] = up.astype(osc.dtype)
        out_dma(slot, i).start()
        return _

    jax.lax.fori_loop(0, N, body, None)

    @pl.when(N >= 2)
    def _():
        out_dma(jax.lax.rem(N - 2, 2), N - 2).wait()

    out_dma(jax.lax.rem(N - 1, 2), N - 1).wait()


def run_e():
    t0 = time.time()
    try:
        out = pl.pallas_call(
            k_e,
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((N, 2 * H, 2 * W, C), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, 1, H, W, C), jnp.float32),
                pltpu.VMEM((2, 1, 2 * H, 2 * W, C), jnp.float32),
                pltpu.VMEM((1, H + 4, W + 4, C), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(x)
        print(f"E_full_compute: OK ({time.time()-t0:.0f}s) "
              f"sum={np.asarray(out).sum():.1f}", flush=True)
    except Exception as e:
        print(f"E_full_compute: FAIL {type(e).__name__}: {str(e)[:140]} "
              f"({time.time()-t0:.0f}s)", flush=True)


run_e()
print("bisect done", flush=True)
