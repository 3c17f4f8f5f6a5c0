"""On-chip device-augment train-step rate (VERDICT r4 item 3 closure).

Times the DEVICE-RESIDENT step rate of the full train step in both
feeding modes on the real chip, same protocol as bench.py's train row
(staged batch, FIFO-enqueued calls, scalar-fetch sync):

  * plain          — step(state, rgb224, depth224, lr): host did the
                     augmentation (the r4 4,303 train-fps configuration),
  * device-aug dot — aug_step(state, raw480x640 frames, gather maps,
                     jitter grids, lr): the WHOLE pixel pipeline
                     (gather, rotation pad, depth/=s, PIL-exact jitter,
                     /255) runs inside the same jit before fwd+bwd+SGD,
                     with the LUT stages as gather-free one-hot
                     contractions / select-sums (data/device_aug.py,
                     lut_impl="dot" — the default),
  * device-aug gather — same step with every lookup as a plain
                     per-element table gather (lut_impl="gather", the
                     r5 first cut).

The delta between plain and the aug rows is what the chip pays to
absorb the augmentation; the host-side saving it buys is measured
separately in docs/bench_host_train_r5.json (per-item 3.97 -> 3.35 ms,
pixel work 0.88 -> 0.07 ms).  MEASURED RESULT (r5 first cut): the
all-gather form pays ~1.0 s/batch — 126 vs 4,264 fps, a 97% step cost —
because per-element gathers floor at ~12 ns/index on this platform
(decomposed stage-by-stage in scripts/probe_r5_device_gathers.py ->
docs/probe_r5_device_gathers.json).  The LUT class of that cost (~86%)
is gather-free under lut_impl="dot"
(docs/probe_r5_lut_alternatives.json); this script measures how much of
the step cost that recovers.  Analysis: docs/kernel_notes.md "r5: the
XLA gather floor".

Honest note: batches here are STAGED (one h2d, repeated steps) — this
isolates the chip rate from the sandbox's 5-15 MB/s tunnel, exactly like
bench.py.  Raw-frame batches are ~3x the bytes of preprocessed ones, so
tunnel-streamed end-to-end runs are link-bound in BOTH modes here; on a
real TPU host the per-batch transfer is PCIe and the loader cost is the
per-item times above.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 550 python -u \
       scripts/bench_train_device_aug_r5.py [--batch 128] \
       [--out docs/bench_train_device_aug_r5.json]
"""

import argparse
import json
import time

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--batch", type=int, default=128)
p.add_argument("--calls", type=int, default=20)
p.add_argument("--out", default="/tmp/bench_train_device_aug_r5.json")
args = p.parse_args()

import jax  # noqa: E402

from fastdepth_tpu.engine.benchmark import setup_compile_cache, sync  # noqa: E402

setup_compile_cache()

import jax.numpy as jnp  # noqa: E402

from fastdepth_tpu.config import TrainConfig  # noqa: E402
from fastdepth_tpu.data import transforms as T  # noqa: E402
from fastdepth_tpu.models import fastdepth_pruned  # noqa: E402
from fastdepth_tpu.train import Trainer  # noqa: E402

b = args.batch
model = fastdepth_pruned()
rng = np.random.RandomState(0)
lr = jnp.float32(0.01)
results = {"batch": b, "calls": args.calls, "dtype": "bf16", "rows": {}}


def time_steps(trainer, step_args, tag):
    for _ in range(3):
        trainer.state, loss = trainer._step(trainer.state, *step_args, lr)
    sync(loss)
    t0 = time.time()
    for _ in range(args.calls):
        trainer.state, loss = trainer._step(trainer.state, *step_args, lr)
    sync(loss)
    fps = b * args.calls / (time.time() - t0)
    results["rows"][tag] = round(fps, 1)
    print(json.dumps({tag: results["rows"][tag]}), flush=True)


# plain: host-preprocessed 224x224 items staged on device
t_plain = Trainer(model, model.init(jax.random.PRNGKey(0)),
                  TrainConfig(lr=0.01), compute_dtype=jnp.bfloat16)
rgb = jnp.asarray(rng.rand(b, 224, 224, 3), jnp.float32)
dep = jnp.asarray(rng.rand(b, 224, 224, 1) * 5 + 0.5, jnp.float32)
time_steps(t_plain, (rgb, dep), "plain_train_fps")
del t_plain, rgb, dep

# device-aug: raw frames + per-item parameters staged on device; the
# jitter plan is the NYU one (3 enhance slots, real blend grids).
# lut_impl="dot" is the Trainer default; the "gather" row jits the same
# wrap the Trainer builds (trainer.py aug_step) around the legacy forms.
n_out = 224 * 224
tables = np.stack([np.stack([T.blend_grid(f) for f in
                             rng.uniform(0.6, 1.4, 3)]) for _ in range(b)])
raw_args = (
    jnp.asarray(rng.randint(0, 256, (b, 480, 640, 3)), jnp.uint8),
    jnp.asarray(rng.rand(b, 480, 640) * 5 + 0.5, jnp.float32),
    jnp.asarray(np.where(rng.rand(b, n_out) < 0.02, -1,
                         rng.randint(0, 480 * 640, (b, n_out))), jnp.int32),
    jnp.asarray(rng.rand(b) * 0.5 + 1.0, jnp.float32),
    jnp.asarray(tables),
    jnp.asarray(np.tile(np.array([1, 2, 3], np.int32), (b, 1))),
)
t_aug = Trainer(model, model.init(jax.random.PRNGKey(0)),
                TrainConfig(lr=0.01), compute_dtype=jnp.bfloat16,
                device_augment=True)
time_steps(t_aug, raw_args, "device_augment_dot_train_fps")
del t_aug

from fastdepth_tpu.data.device_aug import apply_train_augment  # noqa: E402
from fastdepth_tpu.train.trainer import make_train_step  # noqa: E402


class _GatherTrainer:
    def __init__(self):
        t = Trainer(model, model.init(jax.random.PRNGKey(0)),
                    TrainConfig(lr=0.01), compute_dtype=jnp.bfloat16)
        base = make_train_step(model, t.cfg, compute_dtype=jnp.bfloat16)

        def aug_step(state, rgb_raw, depth_raw, flat, scale, tables, kinds,
                     lr):
            rgb, depth = apply_train_augment(
                rgb_raw, depth_raw, flat, scale, tables, kinds,
                lut_impl="gather")
            return base(state, rgb, depth, lr)

        self.state = t.state
        self._step = jax.jit(aug_step, donate_argnums=(0,))


time_steps(_GatherTrainer(), raw_args, "device_augment_gather_train_fps")

for tag in ("dot", "gather"):
    results[f"aug_cost_pct_{tag}"] = round(
        100.0 * (1 - results["rows"][f"device_augment_{tag}_train_fps"]
                 / results["rows"]["plain_train_fps"]), 2)
print(json.dumps({k: v for k, v in results.items() if "pct" in k}),
      flush=True)
with open(args.out, "w") as f:
    json.dump(results, f, indent=1)
    f.write("\n")
print("wrote", args.out)
