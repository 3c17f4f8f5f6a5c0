"""Stage-level on-chip cost of the device-augment gathers (r5 probe).

docs/bench_train_device_aug_r5.json measured the full device-augment
train step at 126 fps vs 4,264 plain (97% step cost) — this probe
decomposes apply_train_augment into its individual gathers and times
each standalone on the real chip, plus candidate reformulations, so the
optimization targets the measured bottleneck instead of a guess:

  rows (all b=128, raw 480x640, out 224x224):
    rgb_u8_gather        take_along_axis (B,307200,3)u8 by (B,N,1)
    rgb_u32_gather       same pixels packed RGBA u32: (B,307200)u32 by (B,N)
    depth_f32_gather     (B,307200)f32 by (B,N)
    jitter_slot_2d       one _jitter_slot: (B,N,3) idx into (B,65536)u8
    small_lut_256        (B,N,3) values through per-item (B,256)u8 tables
    unit_lut_take        (B,N,3) take from the 256-entry f32 constant
    pil_l_compute        the integer L plane + mean-gray (no gather)
    full_augment         apply_train_augment as shipped

Protocol: jit each stage standalone, stage args on device once, 3 warmup
+ 10 timed FIFO-enqueued calls, scalar-fetch sync (the only honest sync
on this transport).  Isolated calls carry ~1.4 ms fixed dispatch cost —
irrelevant at the 100s-of-ms scale probed here.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 550 python -u \
       scripts/probe_r5_device_gathers.py [--out docs/probe_r5_device_gathers.json]
"""

import argparse
import json
import time

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--batch", type=int, default=128)
p.add_argument("--calls", type=int, default=10)
p.add_argument("--out", default="/tmp/probe_r5_device_gathers.json")
args = p.parse_args()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fastdepth_tpu.data import device_aug as DA  # noqa: E402
from fastdepth_tpu.data import transforms as T  # noqa: E402
from fastdepth_tpu.engine.benchmark import setup_compile_cache, sync  # noqa: E402

setup_compile_cache()

b = args.batch
n = 224 * 224
hw = 480 * 640
rng = np.random.RandomState(0)

rgb_u8 = jnp.asarray(rng.randint(0, 256, (b, hw, 3)), jnp.uint8)
rgb_u32 = jnp.asarray(
    rng.randint(0, 2**31, (b, hw), dtype=np.int64).astype(np.uint32))
depth = jnp.asarray(rng.rand(b, hw), jnp.float32)
idx = jnp.asarray(rng.randint(0, hw, (b, n)), jnp.int32)
vals = jnp.asarray(rng.randint(0, 256, (b, n, 3)), jnp.uint8)
tab2d = jnp.asarray(np.stack([T.blend_grid(f)
                              for f in rng.uniform(0.6, 1.4, b)]))
tab1d = jnp.asarray(rng.randint(0, 256, (b, 256)), jnp.uint8)
kinds = jnp.asarray(np.full(b, DA.KIND_SATURATION, np.int32))

unit = DA._unit_lut()

stages = {
    "rgb_u8_gather": (
        lambda a, i: jnp.take_along_axis(a, i[..., None], axis=1),
        (rgb_u8, idx)),
    "rgb_u32_gather": (
        lambda a, i: jnp.take_along_axis(a, i, axis=1), (rgb_u32, idx)),
    "depth_f32_gather": (
        lambda a, i: jnp.take_along_axis(a, i, axis=1), (depth, idx)),
    "jitter_slot_2d": (
        lambda v, t, k: DA._jitter_slot(v, t, k), (vals, tab2d, kinds)),
    "small_lut_256": (
        lambda v, t: jnp.take_along_axis(
            t, v.astype(jnp.int32).reshape(b, -1), axis=1).reshape(v.shape),
        (vals, tab1d)),
    "unit_lut_take": (
        lambda v: jnp.take(unit, v.astype(jnp.int32)), (vals,)),
    "pil_l_compute": (
        lambda v: (DA._pil_l(v), jnp.sum(DA._pil_l(v), axis=-1)), (vals,)),
}

results = {"batch": b, "calls": args.calls, "rows": {}}
for tag, (fn, a) in stages.items():
    jf = jax.jit(fn)
    for _ in range(3):
        out = jf(*a)
    sync(out)
    t0 = time.time()
    for _ in range(args.calls):
        out = jf(*a)
    sync(out)
    ms = (time.time() - t0) / args.calls * 1e3
    results["rows"][tag] = round(ms, 2)
    print(json.dumps({tag: results["rows"][tag]}), flush=True)

# the full shipped augment for cross-checking the stage sum
flat = jnp.asarray(np.where(rng.rand(b, n) < 0.02, -1,
                            rng.randint(0, hw, (b, n))), jnp.int32)
scale = jnp.asarray(rng.rand(b) * 0.5 + 1.0, jnp.float32)
tables = jnp.asarray(np.stack([tab2d, tab2d, tab2d], axis=1))
kinds3 = jnp.asarray(np.tile(np.array([1, 2, 3], np.int32), (b, 1)))
jf = jax.jit(lambda *a: DA.apply_train_augment(*a))
raw3 = rgb_u8.reshape(b, 480, 640, 3)
draw = depth.reshape(b, 480, 640)
for _ in range(3):
    out = jf(raw3, draw, flat, scale, tables, kinds3)
sync(out)
t0 = time.time()
for _ in range(args.calls):
    out = jf(raw3, draw, flat, scale, tables, kinds3)
sync(out)
results["rows"]["full_augment"] = round(
    (time.time() - t0) / args.calls * 1e3, 2)
print(json.dumps({"full_augment": results["rows"]["full_augment"]}),
      flush=True)

with open(args.out, "w") as f:
    json.dump(results, f, indent=1)
    f.write("\n")
print("wrote", args.out)
