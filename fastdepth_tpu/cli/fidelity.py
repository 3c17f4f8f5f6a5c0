"""fp32 vs bf16 fidelity harness (BASELINE.json config #3): evaluates a
checkpoint in both precisions over the same data and reports per-metric
deltas, so the bf16 serving path's accuracy cost is quantified rather
than assumed.

Usage:
    python -m fastdepth_tpu.cli.fidelity --evaluate CKPT --data-root DIR
        [--batch-size 8] [--limit N]
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="fp32 vs bf16 fidelity check")
    p.add_argument("--data", default="nyudepthv2", choices=["nyudepthv2"])
    p.add_argument("--data-root", default=os.path.join("..", "data"))
    p.add_argument("-e", "--evaluate", required=True)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("-j", "--workers", type=int, default=8)
    p.add_argument("--limit", type=int, default=0,
                   help="evaluate only the first N images (0 = all)")
    p.add_argument("--json", default=None,
                   help="also write the per-metric table to this JSON file")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax.numpy as jnp

    from fastdepth_tpu.engine.benchmark import setup_compile_cache

    setup_compile_cache()

    from fastdepth_tpu.cli.evaluate import load_params_and_model
    from fastdepth_tpu.data import BatchLoader, NYUDataset
    from fastdepth_tpu.engine import Evaluator, validate
    from fastdepth_tpu.metrics import METRIC_FIELDS

    params, model, _ = load_params_and_model(args.evaluate)
    dataset = NYUDataset(os.path.join(args.data_root, args.data, "val"), split="val")
    if args.limit:
        dataset = dataset.take(args.limit)

    results = {}
    for tag, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        loader = BatchLoader(dataset, batch_size=args.batch_size,
                             num_workers=args.workers, pad_last=True)
        ev = Evaluator(model, params, batch_size=args.batch_size, dtype=dtype)
        results[tag] = validate(loader, ev, print_freq=0, make_images=False,
                                log=lambda *a: None)
        print(f"[{tag}] RMSE={results[tag].rmse:.3f} "
              f"Delta1={results[tag].delta1:.4f} REL={results[tag].absrel:.4f}")

    print("\nmetric       fp32         bf16         |delta|      rel")
    table = {}
    for f in METRIC_FIELDS:
        a = getattr(results["fp32"], f)
        b = getattr(results["bf16"], f)
        rel = abs(b - a) / abs(a) if a else 0.0
        table[f] = {"fp32": a, "bf16": b, "abs_delta": abs(b - a), "rel": rel}
        print(f"{f:<10}  {a:>11.5f}  {b:>11.5f}  {abs(b - a):>11.5f}  {rel:>8.2%}")
    if args.json:
        import json

        with open(args.json, "w") as fh:
            json.dump({"checkpoint": args.evaluate, "images": len(dataset),
                       "batch_size": args.batch_size, "metrics": table},
                      fh, indent=1)
        print(f"=> wrote {args.json}")
    return results


if __name__ == "__main__":
    main()
