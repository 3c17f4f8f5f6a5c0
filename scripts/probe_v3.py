"""On-chip probe: v3 (single-grid-step, manual double-buffered DMA) fused
decoder kernels vs round-1 measurements and XLA.

Run: PYTHONPATH=/root/repo nohup timeout 3400 python -u scripts/probe_v3.py > /tmp/probe_v3.log 2>&1 &
(one TPU process at a time!)
"""
import json
import os
import sys
import time

import numpy as np

import jax

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from fastdepth_tpu.engine.benchmark import time_pipelined
from fastdepth_tpu.models import fastdepth_pruned
from fastdepth_tpu.models.fused import apply_fastdepth_fused_v3
from fastdepth_tpu.ops import blocks as B
from fastdepth_tpu.ops.pallas.fused_decoder import fused_decoder_stage_v3

RESULTS = {}


def probe(tag, fn, args, batch, calls=30):
    t0 = time.time()
    try:
        stats = time_pipelined(jax.jit(fn), args, warmup=3, calls=calls)
        us_frame = stats["mean_s"] / batch * 1e6
        RESULTS[tag] = round(us_frame, 2)
        print(f"{tag}: {us_frame:.1f} us/frame ({time.time()-t0:.0f}s incl compile)",
              flush=True)
    except Exception as e:
        RESULTS[tag] = f"error: {type(e).__name__}: {str(e)[:120]}"
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]} "
              f"({time.time()-t0:.0f}s)", flush=True)


rng = np.random.RandomState(0)
model = fastdepth_pruned()
cfg = model.config
params32 = model.fold(model.init(jax.random.PRNGKey(0)))
params16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params32)

# ---- per-stage probes (pruned shapes), bf16, batch 32 ----
# stage specs: (i, h, cin, cout, has_skip)
STAGES = [(1, 7, 512, 200, False), (2, 14, 200, 256, True),
          (3, 28, 256, 120, True), (4, 56, 120, 56, True),
          (5, 112, 56, 16, False)]
N = 32
dtype = jnp.bfloat16
for i, h, cin, cout, has_skip in STAGES:
    x = jnp.asarray(rng.rand(N, h, h, cin), dtype)
    dw_w = jnp.asarray(rng.rand(5, 5, 1, cin) * 0.1, dtype)
    dw_b = jnp.asarray(rng.rand(cin) * 0.1, dtype)
    pw_w = jnp.asarray(rng.rand(1, 1, cin, cout) * 0.1, dtype)
    pw_b = jnp.asarray(rng.rand(cout) * 0.1, dtype)
    skip = jnp.asarray(rng.rand(N, 2 * h, 2 * h, cout), dtype) if has_skip else None
    bb = {1: 8, 2: 4, 3: 2, 4: 1, 5: 1}[i]
    probe(f"v3_s{i}_b{N}_bb{bb}",
          lambda x, skip=skip, dw_w=dw_w, dw_b=dw_b, pw_w=pw_w, pw_b=pw_b, bb=bb:
          fused_decoder_stage_v3(x, dw_w, dw_b, pw_w, pw_b, skip, block_batch=bb),
          (x,), N)

# correctness spot check on-chip for stage 4 (f32)
try:
    h, cin, cout = 56, 120, 56
    x = jnp.asarray(rng.rand(4, h, h, cin), jnp.float32)
    dw_w = jnp.asarray(rng.rand(5, 5, 1, cin) * 0.1, jnp.float32)
    dw_b = jnp.asarray(rng.rand(cin) * 0.1, jnp.float32)
    pw_w = jnp.asarray(rng.rand(1, 1, cin, cout) * 0.1, jnp.float32)
    pw_b = jnp.asarray(rng.rand(cout) * 0.1, jnp.float32)
    skip = jnp.asarray(rng.rand(4, 2 * h, 2 * h, cout), jnp.float32)
    ref = B.relu(B.depthwise_conv2d(x, dw_w, bias=dw_b))
    ref = B.relu(B.conv2d(ref, pw_w, bias=pw_b))
    ref = B.upsample_nearest2x(ref) + skip
    got = fused_decoder_stage_v3(x, dw_w, dw_b, pw_w, pw_b, skip)
    md = float(jnp.max(jnp.abs(ref - got)))
    RESULTS["v3_s4_onchip_maxdiff"] = md
    print(f"on-chip parity s4 maxdiff: {md:.2e}", flush=True)
except Exception as e:
    RESULTS["v3_s4_onchip_maxdiff"] = f"error: {type(e).__name__}"
    print(f"on-chip parity FAILED: {e}", flush=True)

# ---- full-model fused v3, bf16 ----
x128 = jnp.asarray(rng.rand(128, 224, 224, 3), dtype)
probe("v3_model_b128", lambda p, a: apply_fastdepth_fused_v3(p, a, cfg),
      (params16, x128), 128)
x32 = jnp.asarray(rng.rand(32, 224, 224, 3), dtype)
probe("v3_model_b32", lambda p, a: apply_fastdepth_fused_v3(p, a, cfg),
      (params16, x32), 32)

# XLA reference at the same batch for context
probe("xla_model_b128", lambda p, a: model.apply(p, a), (params16, x128), 128)

with open("/tmp/probe_v3.json", "w") as f:
    json.dump(RESULTS, f, indent=1)
print(json.dumps(RESULTS, indent=1))
