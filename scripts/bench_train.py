"""On-chip training-step throughput: the full jitted step (train-mode BN
forward, backward, SGD+momentum update, BN-stat merge) for the pruned
flagship at 224x224, across batch sizes, with and without remat.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1750 \
  python -u scripts/bench_train.py > /tmp/bench_train.log 2>&1
"""
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

rng = np.random.RandomState(0)
results = []
for remat in (False, True):
    for batch in (8, 16, 32, 64):
        model = fastdepth_pruned()
        trainer = Trainer(model, model.init(jax.random.PRNGKey(0)),
                          TrainConfig(lr=0.01), remat=remat)
        rgb = jnp.asarray(rng.rand(batch, 224, 224, 3), jnp.float32)
        depth = jnp.asarray(rng.rand(batch, 224, 224, 1) * 5 + 0.5, jnp.float32)
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
        row = {"batch": batch, "remat": remat,
               "step_ms": round(dt * 1e3, 2),
               "train_fps": round(batch / dt, 1)}
        results.append(row)
        print(f"b{batch} remat={remat}: {row['step_ms']} ms/step = "
              f"{row['train_fps']:,} train-fps", flush=True)

with open("/tmp/bench_train.json", "w") as f:
    json.dump(results, f, indent=1)
print(json.dumps(results))
