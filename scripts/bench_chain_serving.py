"""Single-stream b1 serving: frame-chaining vs per-call dispatch (VERDICT
r3 item 6).

A single-stream client at batch 1 pays one device round trip PER FRAME
(a sync costs a full tunnel RTT on this platform — CLAUDE.md); the
--chain server packs the stream into K-frame windows executed as
in-graph SEQUENTIAL batch-1 forwards (lax.map), so the per-call floor
amortizes over K while each frame still runs the b1 graph the
reference's latency rows quote (README.md:136; device b1 compute:
274.8 us/frame, docs/b1_latency.md).

Measures engine-level (InferenceServer.submit, a pipelined single
client, uint8 input / fp16 output to keep the tunnel link out of the
way as far as possible):
  * batch_size=1 server      — the per-call floor (lower bound story)
  * chain server, K in {32, 128}  — the amortized b1 path
  * batch server, b=128      — the batched-compute ceiling (context)

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 580 python -u \
       scripts/bench_chain_serving.py [--frames 2048] [--out docs/b1_serving_r4.json]
"""

import argparse
import json
import time

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--frames", type=int, default=2048)
p.add_argument("--hw", type=int, default=224)
p.add_argument("--out", default="/tmp/b1_serving_r4.json")
args = p.parse_args()

import jax  # noqa: E402

from fastdepth_tpu.engine.benchmark import setup_compile_cache  # noqa: E402

setup_compile_cache()

import jax.numpy as jnp  # noqa: E402

from fastdepth_tpu.engine.server import InferenceServer  # noqa: E402
from fastdepth_tpu.models import fastdepth_pruned  # noqa: E402

model = fastdepth_pruned()
params = model.init(jax.random.PRNGKey(0))
rng = np.random.RandomState(0)
frame = (rng.rand(args.hw, args.hw, 3) * 255).astype(np.uint8)

results = {"frames_per_case": args.frames, "hw": args.hw,
           "dtype": "bf16 compute, uint8 in / fp16 out", "cases": []}


def run_case(tag, *, batch_size, chain, frames):
    srv = InferenceServer(
        model, params, batch_size=batch_size, chain=chain,
        image_size=(args.hw, args.hw), dtype=jnp.bfloat16,
        input_dtype=np.uint8, output_dtype=np.float16,
        max_queue=4 * batch_size + 64, pipeline_depth=2,
        # one immutable frame submitted repeatedly: skip the copy
        copy_inputs=False)
    try:
        # warmup: compile + steady the pipeline
        futs = [srv.submit(frame) for _ in range(2 * batch_size)]
        for f in futs:
            f.result(timeout=900)
        # steady-state single stream: keep >= 2 windows in flight so the
        # drainer always has a full window to pack (request_stream's
        # in-process equivalent)
        from collections import deque

        inflight = deque()
        depth = max(2 * batch_size, 64)
        t0 = time.perf_counter()
        done = 0
        for _ in range(frames):
            inflight.append(srv.submit(frame))
            if len(inflight) >= depth:
                inflight.popleft().result(timeout=900)
                done += 1
        while inflight:
            inflight.popleft().result(timeout=900)
            done += 1
        dt = time.perf_counter() - t0
        stats = srv.stats()
        row = {
            "case": tag, "batch_size": batch_size, "chain": chain,
            "fps": round(frames / dt, 1),
            "ms_per_frame": round(dt / frames * 1e3, 3),
            "mean_occupancy": stats["mean_occupancy"],
            "latency_ms": stats.get("latency_ms"),
        }
        results["cases"].append(row)
        print(json.dumps(row), flush=True)
    finally:
        srv.close()


# fewer frames through the unamortized b1 floor (it is SLOW by design)
run_case("b1 per-call floor", batch_size=1, chain=False,
         frames=max(64, args.frames // 16))
run_case("chain K=32", batch_size=32, chain=True, frames=args.frames)
run_case("chain K=128", batch_size=128, chain=True, frames=args.frames)
run_case("batched b=128 (context)", batch_size=128, chain=False,
         frames=args.frames)

results["device_b1_compute_us"] = 274.8  # docs/b1_latency.md
with open(args.out, "w") as f:
    json.dump(results, f, indent=1)
    f.write("\n")
print("wrote", args.out)
