"""Bisect round 2: fused_decoder_stage_v3 itself, walking from the
known-good bisect shape toward real stage shapes/dtypes.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 3400 python -u scripts/bisect_v3b.py > /tmp/bisect_v3b.log 2>&1 &
"""
import os
import time

import numpy as np

import jax

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from fastdepth_tpu.ops.pallas.fused_decoder import fused_decoder_stage_v3

rng = np.random.RandomState(0)


def run(tag, N, H, C, Cout, dtype, has_skip, bb):
    t0 = time.time()
    try:
        x = jnp.asarray(rng.rand(N, H, H, C), dtype)
        dw_w = jnp.asarray(rng.rand(5, 5, 1, C) * 0.1, dtype)
        dw_b = jnp.asarray(rng.rand(C) * 0.1, dtype)
        pw_w = jnp.asarray(rng.rand(1, 1, C, Cout) * 0.1, dtype)
        pw_b = jnp.asarray(rng.rand(Cout) * 0.1, dtype)
        skip = jnp.asarray(rng.rand(N, 2 * H, 2 * H, Cout), dtype) if has_skip else None
        out = fused_decoder_stage_v3(x, dw_w, dw_b, pw_w, pw_b, skip, block_batch=bb)
        s = float(jnp.sum(out.astype(jnp.float32)))
        print(f"{tag}: OK ({time.time()-t0:.0f}s) sum={s:.1f}", flush=True)
        return True
    except Exception as e:
        print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:120]} "
              f"({time.time()-t0:.0f}s)", flush=True)
        return False


# 0. replicate bisect-E conditions through the real kernel
run("f32_C128_Cout128_noskip_bb1", 4, 8, 128, 128, jnp.float32, False, 1)
# 1. Cout != C
run("f32_C128_Cout64_noskip_bb1", 4, 8, 128, 64, jnp.float32, False, 1)
# 2. non-128 lanes
run("f32_C120_Cout56_noskip_bb1", 4, 8, 120, 56, jnp.float32, False, 1)
# 3. bf16 operands
run("bf16_C128_Cout128_noskip_bb1", 4, 8, 128, 128, jnp.bfloat16, False, 1)
# 4. with skip
run("f32_C128_Cout128_skip_bb1", 4, 8, 128, 128, jnp.float32, True, 1)
# 5. block_batch 2
run("f32_C128_Cout128_noskip_bb2", 4, 8, 128, 128, jnp.float32, False, 2)
# 6. bigger spatial (stage-4-like H)
run("f32_C120_Cout56_skip_H56", 4, 56, 120, 56, jnp.float32, True, 1)
# 7. the real stage-4 probe shape that failed
run("bf16_C120_Cout56_skip_H56_N32", 32, 56, 120, 56, jnp.bfloat16, True, 1)
print("bisect2 done", flush=True)
