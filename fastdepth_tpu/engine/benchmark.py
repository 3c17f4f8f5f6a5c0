"""Benchmark protocol: warmup runs then timed repeats, mirroring the
reference's TVM ``time_evaluator`` flow (deploy/tx2_run_tvm.py:42-65),
with proper ``block_until_ready`` device timing."""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional, Sequence

import jax
import numpy as np


def time_fn(
    fn: Callable,
    args,
    *,
    warmup: int = 5,
    repeats: int = 20,
) -> Dict[str, float]:
    """Returns {'mean_s', 'median_s', 'std_s', 'min_s'} over repeats."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    arr = np.asarray(times)
    return {
        "mean_s": float(arr.mean()),
        "median_s": float(np.median(arr)),
        "std_s": float(arr.std()),
        "min_s": float(arr.min()),
    }


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
        jax.block_until_ready(fn(make_input(i)))
    times = []
    for i in range(repeats):
        x = make_input(warmup + i)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
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
    batch_sizes: Sequence[int] = (1, 8, 32, 64, 128),
    dtype=None,
    image_size=(224, 224),
    warmup: int = 3,
    repeats: int = 10,
) -> Dict[str, Dict[str, float]]:
    """fps per batch size for a model's folded forward pass."""
    import jax.numpy as jnp

    from fastdepth_tpu.engine.aot import compile_forward

    dtype = dtype or jnp.float32
    rng = np.random.RandomState(0)
    out: Dict[str, Dict[str, float]] = {}
    for b in batch_sizes:
        compiled, prepared = compile_forward(
            model, params, batch_size=b, image_size=image_size, dtype=dtype,
            fold_bn=False,  # caller pre-folds; avoid double fold
        )
        x = jnp.asarray(rng.rand(b, *image_size, 3), jnp.float32)
        stats = time_fn(compiled, (prepared, x), warmup=warmup, repeats=repeats)
        stats["fps"] = b / stats["median_s"]
        out[str(b)] = stats
    return out
