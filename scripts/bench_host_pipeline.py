"""Host train-pipeline benchmark: the committed evidence behind the
round-3 host-pipeline section of docs/kernel_notes.md.

Measures per-item cost of the production composed-gather train pipeline
against a stepwise reconstruction of the reference chain (separate
gathers + scipy 4-channel rotate — what the code shipped before the
rewrite), verifies the two produce IDENTICAL bytes on every measured
sample, and records the stage breakdown.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_host_pipeline.py \
        [--out docs/host_pipeline_r3.json]

CPU-only (no device work); single-thread numbers — scale by host cores,
modulo the GIL share (docs/kernel_notes.md caveat).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from fastdepth_tpu.data import transforms as T
from fastdepth_tpu.data.pipeline import TrainPipeline, TrainSample


def stepwise_reference(pipe, rgb, depth, s):
    """The pre-rewrite path: per-stage gathers + scipy rotate of the
    actual image channels (reference nyu.py:26-46 order)."""
    depth = depth / s.scale
    rgb_small = rgb[pipe.rows1][:, pipe.cols1]
    depth_small = depth[pipe.rows1][:, pipe.cols1]
    rgb_rot = T.rotate(rgb_small, s.angle)
    depth_rot = T.rotate(depth_small, s.angle)
    rows, cols = pipe.post_rotate_indices(s)
    rgb_out = rgb_rot[rows][:, cols]
    depth_out = depth_rot[rows][:, cols]
    return (np.asarray(rgb_out, np.float32) / 255.0,
            np.asarray(depth_out, np.float32))


def timed(fn, n, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/host_pipeline_r3.json")
    p.add_argument("--calls", type=int, default=40)
    args = p.parse_args(argv)

    rng = np.random.RandomState(0)
    rgb = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    depth = (rng.rand(480, 640) * 9 + 0.5).astype(np.float32)
    pipe = TrainPipeline()
    cj = T.ColorJitter(0.4, 0.4, 0.4)

    # exactness gate first: composed == stepwise on 25 random draws
    draw_rng = np.random.RandomState(7)
    for _ in range(25):
        s = TrainSample.draw(draw_rng)
        a = pipe(rgb, depth, s)
        b = stepwise_reference(pipe, rgb, depth, s)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])

    s = TrainSample(scale=1.23, angle=-3.7, do_flip=True)
    jr = np.random.RandomState(0)
    out224 = np.ascontiguousarray(
        (rng.rand(224, 224, 3) * 255).astype(np.uint8))
    rows = {
        "stepwise_geometry_ms": timed(
            lambda: stepwise_reference(pipe, rgb, depth, s), args.calls),
        "composed_geometry_ms": timed(
            lambda: pipe(rgb, depth, s), args.calls),
        "stepwise_full_ms": timed(
            lambda: (stepwise_reference(pipe, rgb, depth, s), cj(out224, jr)),
            args.calls),
        "composed_full_ms": timed(
            lambda: pipe(rgb, depth, s, color_jitter=cj, rng=jr), args.calls),
        "rotate_index_map_ms": timed(
            lambda: T.rotate_nearest_indices(pipe.h1, pipe.w1, s.angle),
            args.calls),
        "scipy_rotate_4ch_ms": timed(
            lambda: (T.rotate(rgb[pipe.rows1][:, pipe.cols1], s.angle),
                     T.rotate(depth[pipe.rows1][:, pipe.cols1], s.angle)),
            args.calls),
        "color_jitter_ms": timed(lambda: cj(out224, jr), args.calls),
    }
    result = {
        "what": "per-item host train-pipeline cost, 480x640 -> augmented "
                "224^2 pair, single thread",
        "exactness": "composed == stepwise reference, 25 random draws, "
                     "bit-equal (asserted before timing)",
        "speedup_geometry": round(
            rows["stepwise_geometry_ms"] / rows["composed_geometry_ms"], 2),
        "speedup_full": round(
            rows["stepwise_full_ms"] / rows["composed_full_ms"], 2),
        **{k: round(v, 3) for k, v in rows.items()},
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    return result


if __name__ == "__main__":
    main()
