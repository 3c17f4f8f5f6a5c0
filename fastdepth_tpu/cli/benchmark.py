"""End-to-end streaming inference benchmark (BASELINE.json config #4):
HDF5 loader + fused host transforms + batched device eval, measured as a
pipeline — loader threads, device transfer, model, and on-device metrics
all overlapping.

Usage:
    python -m fastdepth_tpu.cli.benchmark [--evaluate CKPT] [--data-root D]
        [--synthetic N] [--batch-size 64] [--bf16]

Without a dataset, ``--synthetic N`` fabricates an NYU-layout val tree of
N frames in a temp dir first (this sandbox ships no NYU data).
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="streaming inference benchmark")
    p.add_argument("-e", "--evaluate", default=None,
                   help="checkpoint; default: random-init pruned FastDepth")
    p.add_argument("--data", default="nyudepthv2")
    p.add_argument("--data-root", default=None)
    p.add_argument("--synthetic", type=int, default=256,
                   help="frames of synthetic data when no --data-root")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("-j", "--workers", type=int, default=8)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--json", action="store_true", help="emit one JSON line")
    return p.parse_args(argv)


def make_synthetic_tree(n: int) -> str:
    import h5py
    import numpy as np

    root = tempfile.mkdtemp(prefix="fd_synth_")
    val = os.path.join(root, "nyudepthv2", "val", "scene_0")
    os.makedirs(val)
    rng = np.random.RandomState(0)
    for i in range(n):
        with h5py.File(os.path.join(val, f"{i:05d}.h5"), "w") as f:
            f["rgb"] = (rng.rand(3, 480, 640) * 255).astype(np.uint8)
            f["depth"] = (rng.rand(480, 640) * 9 + 0.5).astype(np.float32)
    return root


def main(argv=None):
    args = parse_args(argv)

    import jax

    from fastdepth_tpu.engine.benchmark import setup_compile_cache

    setup_compile_cache()

    import jax.numpy as jnp

    from fastdepth_tpu.data import BatchLoader, NYUDataset
    from fastdepth_tpu.engine import Evaluator, validate
    from fastdepth_tpu.models import fastdepth_pruned

    if args.evaluate:
        from fastdepth_tpu.cli.evaluate import load_params_and_model

        params, model, _ = load_params_and_model(args.evaluate)
    else:
        model = fastdepth_pruned()
        params = model.init(jax.random.PRNGKey(0))

    data_root = args.data_root or make_synthetic_tree(args.synthetic)
    dataset = NYUDataset(os.path.join(data_root, args.data, "val"), split="val",
                         device_normalize=True)
    loader = BatchLoader(dataset, batch_size=args.batch_size,
                         num_workers=args.workers, pad_last=True)
    evaluator = Evaluator(
        model, params, batch_size=args.batch_size,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )

    # warmup pass compiles + fills caches
    validate(loader, evaluator, print_freq=0, make_images=False, log=lambda *a: None)
    t0 = time.perf_counter()
    validate(loader, evaluator, print_freq=0, make_images=False, log=lambda *a: None)
    elapsed = time.perf_counter() - t0
    fps = len(dataset) / elapsed

    result = {
        "metric": "end-to-end streaming eval fps (h5 -> transforms -> device -> metrics)",
        "frames": len(dataset),
        "batch_size": args.batch_size,
        "dtype": "bf16" if args.bf16 else "fp32",
        "elapsed_s": round(elapsed, 3),
        "fps": round(fps, 1),
    }
    print(json.dumps(result) if args.json else
          f"=> {result['frames']} frames in {result['elapsed_s']}s = {result['fps']} fps "
          f"(batch {args.batch_size}, {result['dtype']})")
    return result


if __name__ == "__main__":
    main()
