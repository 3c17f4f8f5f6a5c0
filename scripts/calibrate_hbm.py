"""Calibrate the roofline denominator (round-3 item: VERDICT r2 #2).

docs/roofline.md bounds every layer with the HBM *spec* peak (819 GB/s),
leaving "1.39x bound" ambiguous between ~30% real headroom and
near-optimality.  This script measures what XLA actually achieves on
this chip:

1. **elementwise streaming ceiling** — K barrier-separated multiply
   passes over large flat arrays (bf16 + f32) and over the exact
   dec4/dec5 activation shapes; each pass reads+writes HBM once, and
   ``lax.optimization_barrier`` stops XLA fusing the chain into one pass,
2. **2-read-1-write add** at the same shapes (the skip-add pattern),
3. **dw5x5 conv chains** at the exact dec4 (56^2 x 120ch) and dec5
   (112^2 x 56ch) geometries — the ops the roofline says run 1.9-2.6x
   over their spec-peak bounds,
4. **MXU control** — a big bf16 matmul chain, sanity-checking the
   compute-peak end of the roofline.

Chained-in-one-jit timing amortizes this platform's per-call dispatch
cost (docs/kernel_notes.md: isolated op calls carry ~1.4 ms fixed cost);
per-pass time = pipelined mean / K.

Run (single-tenant TPU):
  PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
    python -u scripts/calibrate_hbm.py > /tmp/calibrate_hbm.log 2>&1
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

from fastdepth_tpu.engine.benchmark import time_pipelined
from fastdepth_tpu.ops import blocks as B

K = 16          # barrier-separated passes per call
CALLS = 30
SPEC_GBS = 819.0  # v5e HBM spec peak

RES = {"K": K, "calls": CALLS, "spec_GBs": SPEC_GBS, "rows": []}
rng = np.random.RandomState(0)


def bench(name, fn, args, bytes_per_pass, k=K):
    t0 = time.time()
    f = jax.jit(fn)
    stats = time_pipelined(f, args, warmup=3, calls=CALLS)
    per_pass_s = stats["mean_s"] / k
    gbs = bytes_per_pass / per_pass_s / 1e9
    row = {"name": name, "per_pass_us": round(per_pass_s * 1e6, 2),
           "GBs": round(gbs, 1), "pct_spec": round(100 * gbs / SPEC_GBS, 1),
           "bytes_per_pass": bytes_per_pass}
    RES["rows"].append(row)
    print(f"{name:42s} {row['per_pass_us']:>9.1f} us/pass  "
          f"{row['GBs']:>7.1f} GB/s  ({row['pct_spec']:5.1f}% spec) "
          f"[{time.time()-t0:.0f}s]", flush=True)
    return row


def mul_chain(x, c):
    for _ in range(K):
        x = lax.optimization_barrier(x * c)
    return x


def add_chain(x, y, c):
    for _ in range(K):
        x = lax.optimization_barrier(x + y)
        y = lax.optimization_barrier(y * c)  # keep both live; 2nd pass counted
    return x, y


def dw_chain(x, w, b):
    for _ in range(K):
        x = lax.optimization_barrier(
            B.relu(B.depthwise_conv2d(x, w, bias=b)))
    return x


def pw_chain(x, w, b):
    for _ in range(K):
        x = lax.optimization_barrier(B.relu(B.conv2d(x, w, bias=b)))
    return x


def mm_chain(x, w):
    for _ in range(4):
        x = lax.optimization_barrier(x @ w)
    return x


# ---- 1. flat streaming ceilings ----
for name, dtype, n in (
    ("flat mul bf16 256MB", jnp.bfloat16, 1 << 27),
    ("flat mul f32 256MB", jnp.float32, 1 << 26),
    ("flat mul bf16 64MB", jnp.bfloat16, 1 << 25),
):
    x = jnp.asarray(rng.rand(n), dtype)
    nbytes = n * x.dtype.itemsize
    bench(name, mul_chain, (x, jnp.asarray(1.0009, dtype)), 2 * nbytes)

# ---- 2. dec4/dec5 activation-shaped streams (bf16 b128) ----
SHAPES = {
    "dec4_in (128,56,56,120)": (128, 56, 56, 120),
    "dec4_out (128,112,112,56)": (128, 112, 112, 56),
    "dec5_out (128,224,224,16)": (128, 224, 224, 16),
}
for name, shp in SHAPES.items():
    x = jnp.asarray(rng.rand(*shp), jnp.bfloat16)
    nbytes = int(np.prod(shp)) * 2
    bench(f"mul {name}", mul_chain, (x, jnp.bfloat16(1.0009)), 2 * nbytes)

# skip-add at the dec4 add site: 2 reads + 1 write, plus the keep-alive
# mul pass (2 more moves) -> 5 moves per chain iteration counted
shp = (128, 112, 112, 56)
x = jnp.asarray(rng.rand(*shp), jnp.bfloat16)
y = jnp.asarray(rng.rand(*shp), jnp.bfloat16)
nbytes = int(np.prod(shp)) * 2
bench("add+mul dec4_out (5 moves)", add_chain,
      (x, y, jnp.bfloat16(1.0009)), 5 * nbytes)

# ---- 3. dw5x5 / pw chains at the exact decoder geometries ----
# dec4 dw: 120ch @56^2; dec5 dw: 56ch @112^2 (roofline rows dec4/dec5).
for name, shp in (("dec4 dw5x5 120ch@56^2", (128, 56, 56, 120)),
                  ("dec5 dw5x5 56ch@112^2", (128, 112, 112, 56)),
                  ("dec3 dw5x5 256ch@28^2", (128, 28, 28, 256))):
    c = shp[-1]
    x = jnp.asarray(rng.rand(*shp), jnp.bfloat16)
    w = jnp.asarray(rng.rand(5, 5, 1, c) * 0.1, jnp.bfloat16)
    b = jnp.zeros((c,), jnp.bfloat16)
    nbytes = int(np.prod(shp)) * 2
    bench(name, dw_chain, (x, w, b), 2 * nbytes)

# square pw (1x1 conv) at dec5 geometry: 56->56 @112^2 — MXU-bound side
shp = (128, 112, 112, 56)
x = jnp.asarray(rng.rand(*shp), jnp.bfloat16)
w = jnp.asarray(rng.rand(1, 1, 56, 56) * 0.1, jnp.bfloat16)
b = jnp.zeros((56,), jnp.bfloat16)
bench("pw 56->56 @112^2", pw_chain, (x, w, b), 2 * int(np.prod(shp)) * 2)

# ---- 4. MXU control ----
n = 8192
x = jnp.asarray(rng.rand(n, n) * 0.1, jnp.bfloat16)
w = jnp.asarray(rng.rand(n, n) * 0.1, jnp.bfloat16)
row = bench("matmul 8192^3 bf16 (x4)", mm_chain, (x, w),
            3 * n * n * 2, k=4)
flops = 2.0 * n * n * n / (row["per_pass_us"] / 1e6)
RES["mxu_tflops"] = round(flops / 1e12, 1)
print(f"MXU: {RES['mxu_tflops']} TFLOP/s bf16 (spec 197)", flush=True)

out = os.path.join(repo, "docs", "probe_r3_hbm.json")
with open(out, "w") as f:
    json.dump(RES, f, indent=1)
print(json.dumps(RES, indent=1), flush=True)
