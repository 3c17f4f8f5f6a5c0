"""Chain-mode client-depth -> (fps, p50, p99) frontier (VERDICT r4 item 5).

docs/b1_serving_r4.json measured the chain-K cases at one client depth
(>= 2 windows in flight, i.e. queue-depth dominated: Little's law makes
p50 ~ depth / fps there, which says nothing about the latency a
latency-SENSITIVE client would see at modest occupancy).  This sweep
re-runs the headline single-stream case — chain K=32, the b1 graph the
reference's README.md:136 latency rows are quoted at — across client
depths {1, 2, 8, 32, 512}, reporting throughput and the request-latency
distribution PER DEPTH so a deployment can pick its operating point:

  * depth 1   — fully synchronous: each request is a window of 1 real
                frame (31 pad rows), latency = one window exec + RTT,
  * depth 2-8 — partial windows, latency still dominated by exec+RTT,
  * depth 32  — exactly one full window in flight,
  * depth 512 — the saturated (throughput) regime b1_serving_r4 ran at.

Engine-level (InferenceServer.submit in-process, uint8 in / fp16 out)
— the same measurement surface as b1_serving_r4, so rows are comparable.
Per-depth latencies come from a FRESH server's stats() deque (one
server per depth; the jitted graph is identical across cases so the
persistent compile cache makes re-setup cheap).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 580 python -u \
       scripts/bench_chain_depth_frontier.py [--out docs/b1_depth_frontier_r5.json]
"""

import argparse
import json
import time
from collections import deque

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--hw", type=int, default=224)
p.add_argument("--k", type=int, default=32, help="chain window length")
p.add_argument("--depths", default="1,2,8,32,512")
p.add_argument("--out", default="/tmp/b1_depth_frontier_r5.json")
args = p.parse_args()

import jax  # noqa: E402

from fastdepth_tpu.engine.benchmark import setup_compile_cache  # noqa: E402

setup_compile_cache()

import jax.numpy as jnp  # noqa: E402

from fastdepth_tpu.engine.server import InferenceServer  # noqa: E402
from fastdepth_tpu.models import fastdepth_pruned  # noqa: E402

model = fastdepth_pruned()
params = model.init(jax.random.PRNGKey(0))
frame = (np.random.RandomState(0).rand(args.hw, args.hw, 3) * 255
         ).astype(np.uint8)

results = {
    "surface": "engine (InferenceServer.submit in-process), chain mode",
    "k": args.k, "hw": args.hw,
    "dtype": "bf16 compute, uint8 in / fp16 out",
    "rows": [],
}

for depth in (int(d) for d in args.depths.split(",")):
    srv = InferenceServer(
        model, params, batch_size=args.k, chain=True,
        image_size=(args.hw, args.hw), dtype=jnp.bfloat16,
        input_dtype=np.uint8, output_dtype=np.float16,
        max_queue=max(4 * args.k, depth + args.k), pipeline_depth=2,
        copy_inputs=False)
    try:
        # warmup: compile + steady the pipeline, then reset the counters
        # so the row's stats cover only the timed region
        for f in [srv.submit(frame) for _ in range(2 * args.k)]:
            f.result(timeout=900)
        with srv._lat_lock:
            srv._lat.clear()
        # occupancy counters also restart post-warmup (drainer is idle:
        # every warmup future has resolved and nothing new is queued)
        srv._frames = 0
        srv._batches = 0
        # scale work to the regime: low depths are SLOW by design
        frames = max(64, min(2048, depth * 64))
        inflight = deque()
        t0 = time.perf_counter()
        for _ in range(frames):
            inflight.append(srv.submit(frame))
            if len(inflight) >= depth:
                inflight.popleft().result(timeout=900)
        while inflight:
            inflight.popleft().result(timeout=900)
        dt = time.perf_counter() - t0
        st = srv.stats()
        row = {
            "depth": depth, "frames": frames,
            "fps": round(frames / dt, 1),
            "ms_per_frame": round(dt / frames * 1e3, 3),
            "mean_occupancy": st["mean_occupancy"],
            "latency_ms": st.get("latency_ms"),
        }
        results["rows"].append(row)
        print(json.dumps(row), flush=True)
    finally:
        srv.close()

# annotate the knee: the largest depth whose p50 stays within 3x of the
# depth-1 p50 (beyond it latency grows ~linearly with queue depth while
# fps saturates — Little's law regime)
rows = results["rows"]
if rows and rows[0]["latency_ms"]:
    base = rows[0]["latency_ms"]["p50"]
    knee = max((r["depth"] for r in rows
                if r["latency_ms"] and r["latency_ms"]["p50"] <= 3 * base),
               default=rows[0]["depth"])
    results["knee"] = {
        "depth": knee,
        "criterion": "largest depth with p50 <= 3x the depth-1 p50",
    }
    print(json.dumps(results["knee"]), flush=True)

with open(args.out, "w") as f:
    json.dump(results, f, indent=1)
    f.write("\n")
print("wrote", args.out)
