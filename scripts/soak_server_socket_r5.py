"""Device-local SOCKET-layer soak (VERDICT r4 item 4).

docs/soak_r2.json soaks the ENGINE drain loop (InferenceServer.submit
in-process) at the ~19.6k fps device rate; docs/soak_r4.json soaks the
full daemon THROUGH THE SANDBOX TUNNEL, where the 5-15 MB/s link is the
bound.  This script closes the gap between them: it soaks
``serve_unix_socket`` itself — handler threads, reader/writer queues,
npy wire protocol — with in-sandbox clients over a LOCAL unix socket,
so the link is loopback and whatever rate emerges is the socket stack's
own, not the network's.

MEASURED FINDING (docs/soak_server_local_r5.json): on this sandbox the
loopback daemon lands in the TUNNEL soak's own link-bound regime
(47.8 and 68.3 fps across two runs vs soak_r4's 47.7 — the 5-15 MB/s
link drifts hour-to-hour) because a socket-fed frame
must still cross the 5-15 MB/s device tunnel H2D before the chip can
run it (soak_r2's 19.6k fps staged its input ON device).  The socket
hop itself therefore adds nothing measurable; to isolate the socket
stack's OWN ceiling, ``--backend cpu-tiny`` runs the identical daemon
code (handler threads, npy wire protocol, reader/writer queues,
drainer) against a tiny model on the in-process CPU backend — no
tunnel anywhere — and that rate is the stack's, bounded only by this
host's single core.

Honest-bound note: this sandbox exposes ONE host core shared by the
client threads, the server's reader/writer/drainer threads, and the
device runtime.  The artifact records the achieved socket-layer rate
and its per-window spread; comparison against the engine ceiling says
how much of the gap is the python socket stack vs the missing cores
(the stats() wire counters separate protocol stalls from device
stalls).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 580 python -u \
       scripts/soak_server_socket_r5.py [minutes] [--clients 4] \
       [--backend axon|cpu-tiny] [--out docs/soak_server_local_r5.json]
"""

import argparse
import itertools
import json
import threading
import time

import numpy as np

import jax

from fastdepth_tpu.engine.benchmark import setup_compile_cache

setup_compile_cache()

import jax.numpy as jnp

from fastdepth_tpu.engine.server import (
    InferenceServer,
    request,
    request_stream,
    serve_unix_socket,
)
from fastdepth_tpu.models import fastdepth_pruned

ap = argparse.ArgumentParser()
ap.add_argument("minutes", nargs="?", type=float, default=5.0)
ap.add_argument("--clients", type=int, default=4)
ap.add_argument("--depth", type=int, default=256,
                help="in-flight requests per client connection")
ap.add_argument("--batch", type=int, default=128)
ap.add_argument("--backend", choices=("axon", "cpu-tiny", "null"),
                default="axon",
                help="axon = real chip through the tunnel (frames pay the "
                     "tunnel H2D); cpu-tiny = tiny model on the in-process "
                     "CPU backend (measured COMPUTE-bound on this 1-core "
                     "host, docs/soak_server_cpu_r5.json); null = identity-"
                     "cost forward (channel mean) on CPU — the only mode "
                     "that isolates the socket stack itself on one core")
ap.add_argument("--out", default="/tmp/soak_server_local_r5.json")
args = ap.parse_args()

WINDOW_S = 30.0
SOCK = "/tmp/fd_soak_socket_r5.sock"

server_impl = "auto"
if args.backend == "cpu-tiny":
    jax.config.update("jax_platforms", "cpu")
    from fastdepth_tpu.config import ModelConfig
    from fastdepth_tpu.models import build

    model = build(ModelConfig(
        encoder_channels=(4, 6, 8, 10, 12, 14, 16, 16, 16, 16, 16, 16,
                          20, 24),
        decoder_channels=(18, 14, 10, 6, 4)))
    params = model.init(jax.random.PRNGKey(0))
elif args.backend == "null":
    # identity-cost forward: (B,H,W,3) -> channel mean (B,H,W,1).  The
    # server runs its REAL code end-to-end (wire decode, submit, queue,
    # batch pack, jit dispatch, future resolve, wire encode); only the
    # model math is free, so on one core the measured rate is the
    # socket stack's own ceiling.  impl='xla' routes _pick_apply to
    # model.apply verbatim (no opt-path rewrite of the shim).
    jax.config.update("jax_platforms", "cpu")
    from fastdepth_tpu.models.registry import Model

    model = Model(config=fastdepth_pruned().config,
                  init=lambda key: {},
                  apply=lambda p, x, **kw: jnp.mean(
                      x, axis=-1, keepdims=True))
    params = {}
    server_impl = "xla"
else:
    model = fastdepth_pruned()
    params = model.init(jax.random.PRNGKey(0))
frame = (np.random.RandomState(0).rand(224, 224, 3) * 255).astype(np.uint8)

counts_lock = threading.Lock()
served = 0
stop_at = None


def client(idx):
    """One saturating pipelined connection: stream frames until the
    deadline, counting answered predictions."""
    global served

    def frames():
        while time.perf_counter() < stop_at:
            yield frame

    local = 0
    for _ in request_stream(SOCK, frames(), depth=args.depth):
        local += 1
        if local % 64 == 0:
            with counts_lock:
                served += 64
    with counts_lock:
        served += local % 64


with InferenceServer(model, params, batch_size=args.batch,
                     dtype=jnp.bfloat16, input_dtype=np.uint8,
                     output_dtype=np.float16, max_queue=8 * args.batch,
                     pipeline_depth=2, impl=server_impl,
                     # wire frames arrive freshly allocated per request
                     copy_inputs=False) as srv:
    ready = threading.Event()
    stop = threading.Event()
    t_srv = threading.Thread(
        target=serve_unix_socket, args=(srv, SOCK),
        kwargs={"ready": ready, "stop": stop, "log": lambda *a: None},
        daemon=True)
    t_srv.start()
    assert ready.wait(timeout=30), "socket server did not come up"
    request(SOCK, frame)  # warmup: compile outside the timed region

    stop_at = time.perf_counter() + args.minutes * 60.0
    clients = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(args.clients)]
    t0 = time.perf_counter()
    for c in clients:
        c.start()

    windows = []
    last_served, last_t = 0, t0
    while time.perf_counter() < stop_at:
        time.sleep(min(WINDOW_S, max(0.2, stop_at - time.perf_counter())))
        now = time.perf_counter()
        with counts_lock:
            cur = served
        st = srv.stats()
        windows.append({
            "t_s": round(now - t0, 1),
            "fps": round((cur - last_served) / (now - last_t), 1),
            "mean_occupancy": st["mean_occupancy"],
            "latency_ms_p50": (st.get("latency_ms") or {}).get("p50"),
            "latency_ms_p99": (st.get("latency_ms") or {}).get("p99"),
        })
        print(json.dumps(windows[-1]), flush=True)
        last_served, last_t = cur, now
    for c in clients:
        c.join(timeout=120)
    elapsed = time.perf_counter() - t0
    stop.set()

# every window's fps is normalized by its own true duration, so the
# (possibly short) final window is still a valid rate sample
rates = [w["fps"] for w in windows]
mean_fps = float(np.mean(rates))
spread = float((np.max(rates) - np.min(rates)) / mean_fps) if mean_fps else 0.0
report = {
    "surface": "serve_unix_socket (handler threads + npy wire protocol), "
               "loopback unix socket, in-sandbox clients",
    "backend": args.backend,
    "minutes": args.minutes,
    "clients": args.clients,
    "depth_per_client": args.depth,
    "batch": args.batch,
    "dtype": "bf16 compute, uint8 in / float16 out wire",
    "frames_total": served,
    "mean_fps": round(mean_fps, 1),
    "window_fps": rates,
    "window_spread_pct": round(spread * 100, 2),
    "windows": windows,
    "engine_ceiling_fps": 19615.0,  # docs/soak_r2.json (engine drain loop)
    "fraction_of_engine_ceiling": round(mean_fps / 19615.0, 3),
    "host_cores": __import__("os").cpu_count(),
    "note": (
        "single-core sandbox: client threads + server reader/writer/"
        "drainer + device runtime share one CPU, so this measures the "
        "socket stack's 1-core rate; spread < 5% is the stability "
        "criterion (soak_r2's bar)"
        if args.backend == "cpu-tiny" else
        "backend=axon: socket-fed frames still cross the 5-15 MB/s "
        "device tunnel H2D (soak_r2 staged input ON device), so this "
        "row is link-bound like soak_r4 — equality with soak_r4's rate "
        "is the finding (the socket hop adds nothing); the stack's own "
        "ceiling is the backend=cpu-tiny row"),
}
print(json.dumps({k: report[k] for k in
                  ("mean_fps", "window_spread_pct",
                   "fraction_of_engine_ceiling", "frames_total")}))
with open(args.out, "w") as f:
    json.dump(report, f, indent=1)
    f.write("\n")
