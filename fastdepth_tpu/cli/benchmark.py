"""End-to-end streaming benchmark: HDF5 loader + fused host transforms +
batched device work, measured as a pipeline — loader threads, device
transfer, model, and on-device metrics all overlapping.

Two modes:

* default — inference/eval (BASELINE.json config #4),
* ``--train`` — one full training pass (augmentation chain incl. the
  composed rotate-gather, Trainer step with BN batch stats); reports
  end-to-end train-fps, quantifying the host-feeding balance against
  the device-only step rate (docs/bench_train_r3.json,
  docs/kernel_notes.md host-pipeline section).

Usage:
    python -m fastdepth_tpu.cli.benchmark [--evaluate CKPT] [--data-root D]
        [--synthetic N] [--batch-size 64] [--bf16] [--train]

Without a dataset, ``--synthetic N`` fabricates an NYU-layout tree of
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
    p.add_argument("--train", action="store_true",
                   help="benchmark the end-to-end TRAIN pipeline (loader + "
                        "augmentations + Trainer step) instead of eval")
    p.add_argument("--device-augment", action="store_true",
                   help="with --train: run the whole augmentation chain on "
                        "device inside the train jit (host ships raw frames "
                        "+ per-item gather maps/jitter grids; bit-identical "
                        "items — tests/test_device_aug.py; the spatial "
                        "gathers keep it well below plain train fps on this "
                        "TPU — host aug stays the default unless the host "
                        "has ~1 core; kernel_notes r5)")
    p.add_argument("--worker-mode", default="thread",
                   choices=["thread", "process"],
                   help="loader worker model: GIL-sharing threads (h5py/"
                        "native kernels release the GIL) or spawned worker "
                        "processes (the torch num_workers model, reference "
                        "main.py:40-41)")
    p.add_argument("--json", action="store_true", help="emit one JSON line")
    return p.parse_args(argv)


def make_synthetic_tree(n: int, split: str = "val") -> str:
    import h5py
    import numpy as np

    root = tempfile.mkdtemp(prefix="fd_synth_")
    d = os.path.join(root, "nyudepthv2", split, "scene_0")
    os.makedirs(d)
    rng = np.random.RandomState(0)
    # stems 00001/00201 are the holdout files the train split filters out
    # (data/nyu.py): skip them so the tree holds exactly n train items
    stems = (k for k in range(n + 2) if split != "train" or k not in (1, 201))
    for _ in range(n):
        with h5py.File(os.path.join(d, f"{next(stems):05d}.h5"), "w") as f:
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

    if args.train:
        return train_main(args, model, params)

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


def train_main(args, model, params):
    """End-to-end TRAIN throughput: threaded loader (h5 read + composed
    rotate-gather + ColorJitter) feeding the full Trainer step (fwd+bwd+
    SGD update+BN-stat merge).  The device-only step rate is
    docs/bench_train_r3.json; the gap between that and this number is
    the host-feeding cost (docs/kernel_notes.md host-pipeline section)."""
    import jax.numpy as jnp

    from fastdepth_tpu.config import TrainConfig
    from fastdepth_tpu.data import BatchLoader, NYUDataset
    from fastdepth_tpu.train import Trainer

    data_root = args.data_root or make_synthetic_tree(args.synthetic, "train")
    dataset = NYUDataset(os.path.join(data_root, args.data, "train"),
                         split="train", device_augment=args.device_augment)
    trainer = Trainer(
        model, params, TrainConfig(lr=0.01, batch_size=args.batch_size),
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        device_augment=args.device_augment,
    )

    def one_pass(epoch):
        loader = BatchLoader(dataset, batch_size=args.batch_size,
                             shuffle=True, num_workers=args.workers,
                             drop_last=True, pad_last=False, seed=0,
                             worker_mode=args.worker_mode)
        loader.set_epoch(epoch)
        return trainer.run_epoch(loader, epoch, print_freq=0,
                                 log=lambda *a: None)

    one_pass(0)  # warmup pass compiles + fills caches
    t0 = time.perf_counter()
    loss = one_pass(1)
    elapsed = time.perf_counter() - t0
    frames = (len(dataset) // args.batch_size) * args.batch_size
    result = {
        "metric": "end-to-end streaming TRAIN fps "
                  "(h5 -> augmentations -> device -> sgd step)",
        "frames": frames,
        "batch_size": args.batch_size,
        "dtype": "bf16" if args.bf16 else "fp32",
        "workers": args.workers,
        "worker_mode": args.worker_mode,
        "device_augment": args.device_augment,
        "elapsed_s": round(elapsed, 3),
        "fps": round(frames / elapsed, 1),
        "final_loss": round(float(loss), 4),
    }
    print(json.dumps(result) if args.json else
          f"=> {frames} frames in {result['elapsed_s']}s = {result['fps']} "
          f"train-fps (batch {args.batch_size}, {result['dtype']}, "
          f"{args.workers} workers)")
    return result


if __name__ == "__main__":
    main()
