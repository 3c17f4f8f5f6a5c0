"""Benchmark protocol: warmup runs then timed repeats, mirroring the
reference's TVM ``time_evaluator`` flow (deploy/tx2_run_tvm.py:42-65).

Synchronization: on some PJRT transports (e.g. the tunneled single-chip
dev platform used here) ``jax.block_until_ready`` returns before device
execution finishes, so every timing below synchronizes by fetching a
host scalar derived from the output — ``float()`` of a device scalar
cannot complete until the computation has.  ``_sync`` compiles its
reduction once per output shape to keep recompiles out of timed regions.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Sequence

import jax
import numpy as np

_sync_fns: Dict = {}


def sync(out) -> float:
    """Force completion of `out` (array or pytree) by fetching a scalar."""
    leaf = jax.tree.leaves(out)[0]
    key = (leaf.shape, str(leaf.dtype))
    fn = _sync_fns.get(key)
    if fn is None:
        import jax.numpy as jnp

        fn = jax.jit(lambda a: jnp.sum(a, dtype=jnp.float32))
        _sync_fns[key] = fn
    return float(fn(leaf))


def time_fn(
    fn: Callable,
    args,
    *,
    warmup: int = 5,
    repeats: int = 20,
) -> Dict[str, float]:
    """Single-call latency: each repeat launches one call and waits for
    its result (includes per-call host<->device round trip)."""
    for _ in range(warmup):
        sync(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        sync(fn(*args))
        times.append(time.perf_counter() - t0)
    arr = np.asarray(times)
    return {
        "mean_s": float(arr.mean()),
        "median_s": float(np.median(arr)),
        "std_s": float(arr.std()),
        "min_s": float(arr.min()),
    }


def time_pipelined(
    fn: Callable,
    args,
    *,
    warmup: int = 3,
    calls: int = 30,
) -> Dict[str, float]:
    """Steady-state throughput: launch `calls` back-to-back (device
    executes FIFO), then wait for the last — amortizes dispatch latency
    the way a serving loop does."""
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(calls):
        out = fn(*args)
    sync(out)
    total = time.perf_counter() - t0
    return {"mean_s": total / calls, "median_s": total / calls,
            "total_s": total, "calls": float(calls)}


def time_randomized(
    fn: Callable,
    make_input: Callable[[int], object],
    *,
    warmup: int = 5,
    repeats: int = 20,
) -> Dict[str, float]:
    """Randomized-input timing variant (deploy/tx2_run_tvm.py:56-65):
    fresh inputs each run, so constant-folding can't cheat."""
    for i in range(warmup):
        sync(fn(make_input(i)))
    times = []
    for i in range(repeats):
        x = make_input(warmup + i)
        t0 = time.perf_counter()
        sync(fn(x))
        times.append(time.perf_counter() - t0)
    arr = np.asarray(times)
    return {
        "mean_s": float(arr.mean()),
        "median_s": float(np.median(arr)),
        "std_s": float(arr.std()),
        "min_s": float(arr.min()),
    }


def throughput_sweep(
    model,
    params,
    *,
    batch_sizes: Sequence[int] = (1, 32, 128),
    dtype=None,
    image_size=(224, 224),
    warmup: int = 3,
    calls: int = 30,
) -> Dict[str, Dict[str, float]]:
    """Amortized fps per batch size for a model's folded forward pass.
    ``params`` must already be folded (the sweep would otherwise time the
    unfused-BN graph while claiming the folded one)."""
    import jax.numpy as jnp

    from fastdepth_tpu.engine.aot import compile_forward
    from fastdepth_tpu.models.fused import tree_has_bn

    if tree_has_bn(params):
        raise ValueError("throughput_sweep needs pre-folded params "
                         "(Model.fold) — it documents the folded forward")
    dtype = dtype or jnp.float32
    rng = np.random.RandomState(0)
    out: Dict[str, Dict[str, float]] = {}
    for b in batch_sizes:
        compiled, prepared = compile_forward(
            model, params, batch_size=b, image_size=image_size, dtype=dtype,
            fold_bn=False,  # caller pre-folds; avoid double fold
            impl="xla",  # this sweep measures the straight folded forward
        )
        x = jnp.asarray(rng.rand(b, *image_size, 3), jnp.float32)
        stats = time_pipelined(compiled, (prepared, x), warmup=warmup, calls=calls)
        stats["fps"] = b / stats["mean_s"]
        out[str(b)] = stats
    return out


def setup_compile_cache(min_compile_secs: float = 1.0) -> str:
    """Point JAX's persistent compilation cache at <repo>/.jax_cache —
    first compiles through this platform's remote helper cost minutes,
    so every benchmarking CLI wants this on.  One shared helper: the
    same three lines were drifting across the CLIs."""
    import os

    import jax

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cache = os.path.join(repo, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return cache
