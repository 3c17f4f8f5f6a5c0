"""Serving-engine soak WITH latency distribution (VERDICT r3 item 7).

Unlike scripts/soak_serving.py (raw jit calls — the device ceiling),
this drives the actual InferenceServer: a saturating in-process client
keeps >= 2 batches of single-frame submits in flight for N minutes;
reports per-30s-window fps plus the engine's own stats() —
mean_occupancy and the submit->resolved p50/p99/max request latency.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 580 python -u \
       scripts/soak_server_r4.py [minutes] [--out docs/soak_r4.json]
"""

import json
import sys
import time
from collections import deque

import numpy as np

import jax

from fastdepth_tpu.engine.benchmark import setup_compile_cache

setup_compile_cache()

import jax.numpy as jnp

from fastdepth_tpu.engine.server import InferenceServer
from fastdepth_tpu.models import fastdepth_pruned

import argparse

_ap = argparse.ArgumentParser()
_ap.add_argument("minutes", nargs="?", type=float, default=5.0)
_ap.add_argument("--out", default="/tmp/soak_r4.json")
_args = _ap.parse_args()
MINUTES = _args.minutes
OUT = _args.out
BATCH = 128
WINDOW_S = 30.0

model = fastdepth_pruned()
params = model.init(jax.random.PRNGKey(0))
frame = (np.random.RandomState(0).rand(224, 224, 3) * 255).astype(np.uint8)

srv = InferenceServer(model, params, batch_size=BATCH, image_size=(224, 224),
                      dtype=jnp.bfloat16, input_dtype=np.uint8,
                      output_dtype=np.float16, max_queue=8 * BATCH,
                      pipeline_depth=2,
                      # one immutable frame, submitted repeatedly: skip
                      # submit()'s defensive copy on the hot path
                      copy_inputs=False)
# warmup/compile
futs = [srv.submit(frame) for _ in range(2 * BATCH)]
for f in futs:
    f.result(timeout=900)

inflight: deque = deque()
DEPTH = 4 * BATCH
windows = []
t_end = time.time() + MINUTES * 60
done_total = 0
w0, done_w = time.time(), 0
while time.time() < t_end:
    inflight.append(srv.submit(frame))
    if len(inflight) >= DEPTH:
        inflight.popleft().result(timeout=900)
        done_w += 1
        done_total += 1
    now = time.time()
    if now - w0 >= WINDOW_S:
        windows.append(round(done_w / (now - w0), 1))
        print(f"window {len(windows)}: {windows[-1]} fps", flush=True)
        w0, done_w = now, 0
while inflight:
    inflight.popleft().result(timeout=900)
    done_total += 1

stats = srv.stats()
srv.close()
result = {
    "what": "InferenceServer soak, bf16 b128, uint8 in / fp16 out, "
            "in-process saturating single client",
    "minutes": MINUTES,
    "frames": done_total,
    "windows_fps": windows,
    "mean_fps": round(float(np.mean(windows)), 1) if windows else None,
    "spread_pct": round(float(np.ptp(windows) / np.mean(windows) * 100), 2)
    if windows else None,
    "occupancy": stats["mean_occupancy"],
    "client_depth": DEPTH,
    "latency_ms": stats["latency_ms"],
    "note": "through the sandbox tunnel the engine is LINK-bound "
            "(~147 KB uint8 frame over a volatile ~5-15 MB/s up-link; "
            "the same server drains 19.6k fps fed device-locally, "
            "docs/soak_r2.json), so the request-latency distribution is "
            "queue-depth dominated (Little's law: depth/fps). The "
            "distribution machinery itself is the deliverable; p50/p99 "
            "become service-time-meaningful on a directly-attached host.",
}
with open(OUT, "w") as f:
    json.dump(result, f, indent=1)
    f.write("\n")
print(json.dumps(result))
