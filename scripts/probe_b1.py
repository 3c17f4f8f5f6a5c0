"""Batch-1 latency attribution (round-3 item: VERDICT r2 #3).

The reference's headline is batch-1 latency (5.6 ms on TX2 GPU,
reference README.md:136).  Our frontier shows ~0.8 ms/frame pipelined at
b1 — 6-7x, under the 10x north star — but nothing attributes where the
~800 us goes when b128 amortizes to ~51 us/frame.  This script separates:

* **dispatch floor** — pipelined per-call cost of a trivial jit (the
  host->device submit path with no compute to speak of),
* **pure device compute at b1** — K barrier-separated full forwards
  inside ONE jit call: no per-call overhead at all, so per-forward time
  is the honest b1 device-compute number,
* **per-call variants** — fp32/bf16, straight vs head-commute ('opt')
  graphs, donated input buffer, AOT executable: what a serving loop
  actually achieves per frame at queue depth 1 batch 1,
* **batch scaling** b in {1,2,4,8,16,32}: fixed-vs-variable split.

Run (single-tenant TPU):
  PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
    python -u scripts/probe_b1.py > /tmp/probe_b1.log 2>&1
"""
import json
import os
import time

import numpy as np

import jax

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
from fastdepth_tpu.engine.benchmark import setup_compile_cache  # noqa: E402

setup_compile_cache()

import jax.numpy as jnp
from jax import lax

from fastdepth_tpu.engine.benchmark import time_fn, time_pipelined
from fastdepth_tpu.models import fastdepth_pruned
from fastdepth_tpu.models.fused import apply_fastdepth_opt

CALLS = 120
RES = {"calls": CALLS, "rows": []}
rng = np.random.RandomState(0)

model = fastdepth_pruned()
params32 = model.fold(model.init(jax.random.PRNGKey(0)))
params16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params32)


def report(name, per_call_us, extra=None):
    row = {"name": name, "us": round(per_call_us, 1)}
    row.update(extra or {})
    RES["rows"].append(row)
    print(f"{name:44s} {per_call_us:>9.1f} us", flush=True)


def run(name, fn, args, calls=CALLS, latency=False):
    t0 = time.time()
    f = jax.jit(fn) if not hasattr(fn, "cost_analysis") else fn
    stats = time_pipelined(f, args, warmup=5, calls=calls)
    extra = {}
    if latency:
        lat = time_fn(f, args, warmup=2, repeats=10)
        extra["single_call_ms"] = round(lat["median_s"] * 1e3, 2)
    report(name, stats["mean_s"] * 1e6, extra)
    return stats["mean_s"] * 1e6


# ---- dispatch floor ----
tiny = jnp.zeros((8,), jnp.float32)
run("dispatch floor (mul on 8 floats)", lambda x: x * 2.0, (tiny,), calls=300)

# ---- pure device compute at b1: K forwards in one jit ----
K = 8
x1_16 = jnp.asarray(rng.rand(1, 224, 224, 3), jnp.bfloat16)
x1_32 = jnp.asarray(rng.rand(1, 224, 224, 3), jnp.float32)


def chain(p, x, apply):
    for _ in range(K):
        y = apply(p, x)
        # feed a scalar of the output back into the input: data dependence
        # without shape change, so XLA cannot run forwards concurrently
        x = lax.optimization_barrier(x + y.mean().astype(x.dtype) * 1e-9)
    return x


for name, p, x, ap in (
    ("in-graph fwd bf16 b1 (xla)", params16, x1_16, model.apply),
    ("in-graph fwd bf16 b1 (opt)", params16, x1_16,
     lambda p, x: apply_fastdepth_opt(p, x, model.config)),
    ("in-graph fwd fp32 b1 (xla)", params32, x1_32, model.apply),
):
    t = run(name, lambda p, x, ap=ap: chain(p, x, ap), (p, x), calls=40)
    RES["rows"][-1]["per_forward_us"] = round(t / K, 1)
    print(f"    -> per-forward: {t / K:.1f} us", flush=True)

# ---- per-call serving variants at b1 ----
run("per-call fp32 b1 (xla)", model.apply, (params32, x1_32), latency=True)
run("per-call bf16 b1 (xla)", model.apply, (params16, x1_16), latency=True)
run("per-call bf16 b1 (opt)",
    lambda p, x: apply_fastdepth_opt(p, x, model.config),
    (params16, x1_16), latency=True)

# donated input: the device buffer is reused, saving an alloc per call
don = jax.jit(lambda p, x: model.apply(p, x), donate_argnums=(1,))
for _ in range(5):
    out = don(params16, jnp.asarray(rng.rand(1, 224, 224, 3), jnp.bfloat16))
t0 = time.perf_counter()
xs = [jnp.asarray(rng.rand(1, 224, 224, 3), jnp.bfloat16) for _ in range(CALLS)]
t_make = time.perf_counter() - t0
from fastdepth_tpu.engine.benchmark import sync
t0 = time.perf_counter()
for x in xs:
    out = don(params16, x)
sync(out)
report("per-call bf16 b1 (xla, donated input)",
       (time.perf_counter() - t0) / CALLS * 1e6,
       {"input_prep_us": round(t_make / CALLS * 1e6, 1)})

# AOT executable (no python jit-dispatch cache lookup)
from fastdepth_tpu.engine.aot import compile_forward

compiled, prep = compile_forward(model, params32, batch_size=1,
                                 dtype=jnp.bfloat16, fold_bn=False, impl="xla")
run("per-call bf16 b1 (AOT executable)", compiled, (prep, x1_32))

# ---- batch scaling (bf16 xla) ----
scale = {}
for b in (1, 2, 4, 8, 16, 32):
    x = jnp.asarray(rng.rand(b, 224, 224, 3), jnp.bfloat16)
    t = run(f"per-call bf16 b{b} (xla)", model.apply, (params16, x))
    scale[b] = t
RES["batch_scaling_us"] = {str(k): round(v, 1) for k, v in scale.items()}
# linear fit t(b) = fixed + b * slope over b>=2
bs = np.array([b for b in scale if b >= 2], float)
ts = np.array([scale[int(b)] for b in bs])
slope, fixed = np.polyfit(bs, ts, 1)
RES["fit"] = {"fixed_us_per_call": round(float(fixed), 1),
              "marginal_us_per_frame": round(float(slope), 2)}
print(f"fit: fixed {fixed:.0f} us/call + {slope:.1f} us/frame", flush=True)

out_path = os.path.join(repo, "docs", "probe_r3_b1.json")
with open(out_path, "w") as f:
    json.dump(RES, f, indent=1)
print(json.dumps(RES, indent=1), flush=True)
