"""Sustained-throughput soak of the serving path: run the headline
config (opt forward, bf16 b128) back-to-back for N minutes, reporting
per-30s window fps — evidence the headline number holds in steady state
(thermals, queue health) rather than only in a 30-call burst.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 900 \
  python -u scripts/soak_serving.py [minutes] > /tmp/soak.log 2>&1
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

from fastdepth_tpu.engine.benchmark import sync
from fastdepth_tpu.models import fastdepth_pruned
from fastdepth_tpu.models.fused import apply_fastdepth_opt

MINUTES = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
BATCH = 128
WINDOW_S = 30.0
CHUNK = 64  # calls enqueued back-to-back between syncs

model = fastdepth_pruned()
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      model.fold(model.init(jax.random.PRNGKey(0))))
x = jnp.asarray(np.random.RandomState(0).rand(BATCH, 224, 224, 3), jnp.bfloat16)
fn = jax.jit(lambda p, a: apply_fastdepth_opt(p, a, model.config))

# warmup
sync(fn(params, x))
# Submission pattern matters on this tunneled transport: a sync costs a
# full ~25-40 ms RTT, so syncing per call gates throughput at 1/RTT
# regardless of device speed.  Enqueue CHUNK calls back-to-back into the
# FIFO device queue, then sync only the last (same protocol as
# engine/benchmark.time_pipelined, which produced the headline number).
windows = []
t_end = time.time() + MINUTES * 60
calls_total = 0
while time.time() < t_end:
    w0 = time.time()
    calls = 0
    while time.time() - w0 < WINDOW_S:
        out = None
        for _ in range(CHUNK):
            out = fn(params, x)
        sync(out)  # FIFO: last done => all done
        calls += CHUNK
    fps = calls * BATCH / (time.time() - w0)
    windows.append(round(fps, 1))
    calls_total += calls
    print(f"window {len(windows):2d}: {fps:,.0f} fps", flush=True)

res = {
    "batch": BATCH, "impl": "opt", "dtype": "bf16",
    "minutes": MINUTES, "chunk": CHUNK,
    "windows_fps": windows,
    "mean_fps": round(float(np.mean(windows)), 1),
    "min_fps": min(windows), "max_fps": max(windows),
    "frames_total": calls_total * BATCH,
}
with open("/tmp/soak.json", "w") as f:
    json.dump(res, f, indent=1)
print(json.dumps(res, indent=1), flush=True)
