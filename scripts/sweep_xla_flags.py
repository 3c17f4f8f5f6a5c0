"""Sweep XLA TPU flags over the opt forward (bf16 b128) — each flag set
needs a fresh process (XLA flags are process-global), run sequentially
(single-tenant chip).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3500 \
  python -u scripts/sweep_xla_flags.py > /tmp/sweep_flags.log 2>&1
"""
import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys
import numpy as np
import jax
repo = sys.argv[1]
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from fastdepth_tpu.engine.benchmark import time_pipelined
from fastdepth_tpu.models import fastdepth_pruned
from fastdepth_tpu.models.fused import apply_fastdepth_opt
model = fastdepth_pruned()
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      model.fold(model.init(jax.random.PRNGKey(0))))
x = jnp.asarray(np.random.RandomState(0).rand(128, 224, 224, 3), jnp.bfloat16)
fn = jax.jit(lambda p, a: apply_fastdepth_opt(p, a, model.config))
stats = time_pipelined(fn, (params, x), warmup=3, calls=40)
print("RESULT " + json.dumps({"us_per_frame": stats["mean_s"] / 128 * 1e6}))
"""

FLAG_SETS = {
    "baseline": "",
    "vmem_32m": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem_128m": "--xla_tpu_scoped_vmem_limit_kib=131072",
}

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RES = {}
for name, flags in FLAG_SETS.items():
    env = dict(os.environ)
    if flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
    try:
        out = subprocess.run(
            [sys.executable, "-c", CHILD, repo], env=env, timeout=700,
            capture_output=True, text=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
        if line:
            RES[name] = json.loads(line[0][7:])["us_per_frame"]
            print(f"{name}: {RES[name]:.2f} us/frame", flush=True)
        else:
            RES[name] = f"no result (rc={out.returncode})"
            print(f"{name}: FAIL rc={out.returncode}\n{out.stderr[-400:]}",
                  flush=True)
    except subprocess.TimeoutExpired:
        RES[name] = "timeout"
        print(f"{name}: TIMEOUT", flush=True)

with open("/tmp/sweep_flags.json", "w") as f:
    json.dump(RES, f, indent=1)
print(json.dumps(RES, indent=1))
