"""On-chip training-step throughput: the full jitted step (train-mode BN
forward, backward, SGD+momentum update, BN-stat merge) for the pruned
flagship at 224x224, across batch sizes, remat, and compute dtype
(fp32 vs bf16 mixed-precision).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1750 \
  python -u scripts/bench_train.py [--batches 8,16,32,64] \
      [--remat 0,1] [--dtypes fp32,bf16] [--out /tmp/bench_train.json]
"""
import argparse
import itertools
import json
import time

import numpy as np

import jax

from fastdepth_tpu.engine.benchmark import setup_compile_cache, sync

setup_compile_cache()

import jax.numpy as jnp

from fastdepth_tpu.config import TrainConfig
from fastdepth_tpu.models import fastdepth_pruned
from fastdepth_tpu.train import Trainer

p = argparse.ArgumentParser()
p.add_argument("--batches", default="8,16,32,64")
p.add_argument("--remat", default="0,1")
p.add_argument("--dtypes", default="fp32")
p.add_argument("--accum", default="1",
               help="comma list of gradient-accumulation factors")
p.add_argument("--out", default="/tmp/bench_train.json")
args = p.parse_args()

DTYPES = {"fp32": None, "bf16": jnp.bfloat16}
rng = np.random.RandomState(0)
results = []
for dtype_tag, accum, remat, batch in itertools.product(
        args.dtypes.split(","),
        (int(a) for a in args.accum.split(",")),
        (bool(int(r)) for r in args.remat.split(",")),
        (int(b) for b in args.batches.split(","))):
    model = fastdepth_pruned()
    trainer = Trainer(model, model.init(jax.random.PRNGKey(0)),
                      TrainConfig(lr=0.01), remat=remat,
                      compute_dtype=DTYPES[dtype_tag],
                      accum_steps=accum)
    rgb = jnp.asarray(rng.rand(batch, 224, 224, 3), jnp.float32)
    depth = jnp.asarray(rng.rand(batch, 224, 224, 1) * 5 + 0.5,
                        jnp.float32)
    lr = jnp.float32(0.01)
    # warmup (compile)
    for _ in range(3):
        trainer.state, loss = trainer._step(trainer.state, rgb, depth, lr)
    sync(loss)
    t0 = time.time()
    calls = 30
    for _ in range(calls):
        trainer.state, loss = trainer._step(trainer.state, rgb, depth, lr)
    sync(loss)
    dt = (time.time() - t0) / calls
    row = {"batch": batch, "remat": remat, "dtype": dtype_tag,
           "step_ms": round(dt * 1e3, 2),
           "train_fps": round(batch / dt, 1),
           "final_loss": float(loss)}
    if accum != 1:
        row["accum"] = accum
    results.append(row)
    print(f"b{batch} remat={remat} {dtype_tag} accum={accum}: "
          f"{row['step_ms']} ms/step = {row['train_fps']:,} "
          f"train-fps (loss {row['final_loss']:.4f})", flush=True)

with open(args.out, "w") as f:
    json.dump(results, f, indent=1)
    f.write("\n")
print(json.dumps(results))
