"""End-to-end daemon throughput: K client threads stream frames through
the unix-socket protocol into the micro-batching server on the chip.

Quantifies what the serving front end costs on top of the raw jit loop
(soak_serving.py: ~19.6k fps device-side at bf16 b128), and what uint8
ingestion (device-side /255) buys over float32 frames.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 550 \
  python -u scripts/bench_serve_daemon.py > /tmp/bench_daemon.log 2>&1
"""
import json
import os
import threading
import time

import numpy as np

import jax

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from fastdepth_tpu.engine.server import InferenceServer, request, serve_unix_socket
from fastdepth_tpu.models import fastdepth_pruned

CLIENTS = 8
FRAMES_PER_CLIENT = 150
BATCH = 32

model = fastdepth_pruned()
params = model.init(jax.random.PRNGKey(0))
rng = np.random.RandomState(0)
results = {}

for input_dtype, name in ((np.float32, "float32"), (np.uint8, "uint8")):
    frame = (rng.rand(224, 224, 3) * 255).astype(input_dtype)
    sock = f"/tmp/fd_bench_{name}.sock"
    stop = threading.Event()
    ready = threading.Event()
    with InferenceServer(model, params, batch_size=BATCH, dtype=jnp.bfloat16,
                         input_dtype=input_dtype,
                         # wire frames arrive freshly allocated per
                         # request; nothing mutates them after submit
                         copy_inputs=False) as srv:
        t = threading.Thread(target=serve_unix_socket, args=(srv, sock),
                             kwargs={"ready": ready, "stop": stop,
                                     "log": lambda *a: None}, daemon=True)
        t.start()
        ready.wait(timeout=10)
        request(sock, frame)  # warmup (compile)

        # engine-level: futures straight into the queue, no socket
        t0 = time.time()
        futs = [srv.submit(frame) for _ in range(CLIENTS * FRAMES_PER_CLIENT)]
        for f in futs:
            f.result(timeout=120)
        dt = time.time() - t0
        results[f"{name}_engine_fps"] = round(CLIENTS * FRAMES_PER_CLIENT / dt, 1)

        # socket-level: K concurrent client connections
        def client(n):
            for _ in range(n):
                request(sock, frame)

        t0 = time.time()
        threads = [threading.Thread(target=client, args=(FRAMES_PER_CLIENT,))
                   for _ in range(CLIENTS)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        dt = time.time() - t0
        results[f"{name}_socket_fps"] = round(CLIENTS * FRAMES_PER_CLIENT / dt, 1)
        stop.set()
        t.join(timeout=5)
    print(f"{name}: engine {results[f'{name}_engine_fps']:,} fps, "
          f"socket {results[f'{name}_socket_fps']:,} fps "
          f"({CLIENTS} clients)", flush=True)

results.update(clients=CLIENTS, frames_per_client=FRAMES_PER_CLIENT,
               batch=BATCH, dtype="bf16")
with open("/tmp/bench_daemon.json", "w") as f:
    json.dump(results, f, indent=1)
print(json.dumps(results, indent=1))
