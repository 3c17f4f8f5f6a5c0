"""Benchmark: flagship FastDepth (pruned, BN-folded) 224x224 inference
throughput on one TPU chip.

Protocol mirrors the reference's TVM deploy benchmarking — warmup runs
then timed repeats (reference deploy/tx2_run_tvm.py:42-53) — with
``block_until_ready`` timing.  Baseline: TX2 GPU 5.6 ms/frame = 178.6 fps
(reference README.md:136; BASELINE.md).  Prints ONE JSON line.
"""

import json
import time

import numpy as np


def _bench_fn(fn, args, warmup=3, repeats=10):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    import jax

    # persistent compile cache: first-compile on the tunnel is minutes
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from fastdepth_tpu.models import fastdepth_pruned

    model = fastdepth_pruned()
    params32 = model.fold(model.init(jax.random.PRNGKey(0)))
    rng = np.random.RandomState(0)

    results = {}
    best_fps = 0.0
    best_cfg = None
    for dtype, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        params = jax.tree.map(lambda a: a.astype(dtype), params32)
        fwd = jax.jit(lambda p, x: model.apply(p, x))
        for batch in (1, 32, 128):
            x = jnp.asarray(rng.rand(batch, 224, 224, 3), dtype)
            try:
                t = _bench_fn(fwd, (params, x))
            except Exception as e:  # OOM etc.
                results[f"{tag}_b{batch}"] = f"error: {type(e).__name__}"
                continue
            fps = batch / t
            results[f"{tag}_b{batch}_fps"] = round(fps, 1)
            if batch == 1:
                results[f"{tag}_latency_ms"] = round(t * 1e3, 3)
            if fps > best_fps:
                best_fps = fps
                best_cfg = f"{tag}_b{batch}"

    tx2_gpu_fps = 1000.0 / 5.6  # README.md:136
    print(json.dumps({
        "metric": "224x224 NYUv2 frames/sec/chip",
        "value": round(best_fps, 1),
        "unit": "fps",
        "vs_baseline": round(best_fps / tx2_gpu_fps, 2),
        "best_config": best_cfg,
        "detail": results,
    }))


if __name__ == "__main__":
    main()
