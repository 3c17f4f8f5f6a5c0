"""Confirm/refute: head-commute ('opt') graph at batch 1.

Round-2 frontier recorded opt as slower at b1 (so Evaluator/auto routes
b1 to the straight graph); round-3's probe_b1.py measured the opposite
(bf16 b1 per-call: opt 988 us vs xla 1110 us; in-graph per-forward: opt
275 us vs xla 312 us).  Settle it: 3 repetitions x 200 pipelined calls
per config, fp32 + bf16, plus the AOT executable with impl=opt.

Run (single-tenant TPU):
  PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
    python -u scripts/confirm_b1_opt.py > /tmp/confirm_b1_opt.log 2>&1
"""
import json
import os

import numpy as np

import jax

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
from fastdepth_tpu.engine.benchmark import setup_compile_cache  # noqa: E402

setup_compile_cache()

import jax.numpy as jnp

from fastdepth_tpu.engine.aot import compile_forward
from fastdepth_tpu.engine.benchmark import time_pipelined
from fastdepth_tpu.models import fastdepth_pruned
from fastdepth_tpu.models.fused import apply_fastdepth_opt

REPS, CALLS = 3, 200
RES = {"reps": REPS, "calls": CALLS, "rows": []}
rng = np.random.RandomState(0)

model = fastdepth_pruned()
params32 = model.fold(model.init(jax.random.PRNGKey(0)))
params16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params32)
x32 = jnp.asarray(rng.rand(1, 224, 224, 3), jnp.float32)
x16 = x32.astype(jnp.bfloat16)

configs = [
    ("fp32 b1 xla", jax.jit(model.apply), (params32, x32)),
    ("fp32 b1 opt",
     jax.jit(lambda p, x: apply_fastdepth_opt(p, x, model.config)),
     (params32, x32)),
    ("bf16 b1 xla", jax.jit(model.apply), (params16, x16)),
    ("bf16 b1 opt",
     jax.jit(lambda p, x: apply_fastdepth_opt(p, x, model.config)),
     (params16, x16)),
]
aot, prep = compile_forward(model, params32, batch_size=1,
                            dtype=jnp.bfloat16, fold_bn=False, impl="opt")
configs.append(("bf16 b1 AOT(opt)", aot, (prep, x32)))
aotx, prepx = compile_forward(model, params32, batch_size=1,
                              dtype=jnp.bfloat16, fold_bn=False, impl="xla")
configs.append(("bf16 b1 AOT(xla)", aotx, (prepx, x32)))

for name, fn, args in configs:
    times = []
    for _ in range(REPS):
        stats = time_pipelined(fn, args, warmup=5, calls=CALLS)
        times.append(stats["mean_s"] * 1e6)
    med = float(np.median(times))
    RES["rows"].append({"name": name, "us_med": round(med, 1),
                        "us_all": [round(t, 1) for t in times]})
    print(f"{name:20s} {med:>8.1f} us  (reps: "
          + ", ".join(f"{t:.0f}" for t in times) + ")", flush=True)

out = os.path.join(repo, "docs", "probe_r3_b1_confirm.json")
with open(out, "w") as f:
    json.dump(RES, f, indent=1)
print(json.dumps(RES, indent=1), flush=True)
