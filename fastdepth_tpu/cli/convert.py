"""Offline checkpoint converter CLI — PyTorch pickle -> native .npz.

The one-time conversion tool that keeps torch out of the serving
dependency set (SURVEY.md §7 hard part (d)).

Usage:
    python -m fastdepth_tpu.cli.convert model_best.pth.tar out.npz
"""

from __future__ import annotations

import argparse
import dataclasses
import json


def main(argv=None):
    p = argparse.ArgumentParser(description="torch checkpoint -> fastdepth-tpu .npz")
    p.add_argument("input",
                   help="reference .pth[.tar] checkpoint (full-module pickle; "
                        "unpickling executes code — TRUSTED sources only)")
    p.add_argument("output", help="output .npz path")
    p.add_argument("--quiet", action="store_true")
    args = p.parse_args(argv)

    from fastdepth_tpu.checkpoint.convert import convert_checkpoint
    from fastdepth_tpu.checkpoint.io import save_checkpoint

    params, cfg, meta = convert_checkpoint(args.input)
    best = {k[len("best_"):]: v for k, v in meta.items() if k.startswith("best_")}
    save_checkpoint(
        args.output, params, cfg,
        epoch=meta.get("epoch", 0),
        best_result=best or None,
        extra={"source_class": meta.get("source_class"), "source": args.input},
    )
    if not args.quiet:
        print(f"=> {args.input} ({meta.get('source_class')}) -> {args.output}")
        print(f"=> config: {json.dumps(dataclasses.asdict(cfg))}")
    return cfg


if __name__ == "__main__":
    main()
