"""Autotune runner: produce per-op tuning records for the released model
family on the attached chip — the breadth of the reference's AutoTVM
tuning DB (reference tvm_compile/tuning/: 8 logs = 4 models x 2 targets,
every conv task; README.md:69).

    python -m fastdepth_tpu.cli.autotune [--models all] [--out tuning/]

Writes ``tuning/<device>.<model>.json`` with every encoder conv op and
every decoder stage timed per dtype (XLA path always; the fused Pallas
kernel additionally for dw5x5 decoders, where the Mosaic compile
succeeds).  ``models/fused.apply_fastdepth_mixed`` consumes the winner
map (engine/autotune.load_tuning).
"""

from __future__ import annotations

import argparse
import os

# The 4 released depth models (reference README download table / tuning
# log names).
MODEL_CONFIGS = {
    "mobilenet-nnconv5": dict(decoder="nnconv5", skip=None),
    "mobilenet-nnconv5dw": dict(decoder="nnconv5dw", skip=None),
    "mobilenet-nnconv5dw-skipadd": dict(decoder="nnconv5dw", skip="add"),
    "mobilenet-nnconv5dw-skipadd-pruned": "pruned",
}


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="per-op kernel tuning records")
    p.add_argument("--models", default="all",
                   help="comma list or 'all': " + ",".join(MODEL_CONFIGS))
    p.add_argument("--out", default="tuning")
    p.add_argument("--batch-enc", type=int, default=32)
    p.add_argument("--batch-dec", type=int, default=4)
    p.add_argument("--calls", type=int, default=20)
    p.add_argument("--dtypes", default="bfloat16,float32")
    p.add_argument("--no-pallas", action="store_true",
                   help="skip the Pallas decoder impl (XLA-only records)")
    return p.parse_args(argv)


def config_for(name: str):
    from fastdepth_tpu.config import FASTDEPTH_PRUNED, ModelConfig

    spec = MODEL_CONFIGS[name]
    if spec == "pruned":
        return FASTDEPTH_PRUNED
    return ModelConfig(**spec)


def main(argv=None):
    args = parse_args(argv)

    from fastdepth_tpu.engine.autotune import _device_kind, tune_model
    from fastdepth_tpu.engine.benchmark import setup_compile_cache

    setup_compile_cache()

    names = (list(MODEL_CONFIGS) if args.models == "all"
             else [m.strip() for m in args.models.split(",")])
    unknown = [n for n in names if n not in MODEL_CONFIGS]
    if unknown:  # fail BEFORE any (minutes-long) tuning runs
        raise SystemExit(
            f"unknown model(s) {unknown}; valid: {sorted(MODEL_CONFIGS)}")
    dtypes = tuple(d.strip() for d in args.dtypes.split(","))
    device = _device_kind().replace(" ", "").lower()
    written = []
    for name in names:
        cfg = config_for(name)
        out_path = os.path.join(args.out, f"{device}.{name}.json")
        print(f"=> tuning {name} -> {out_path}", flush=True)
        tune_model(
            cfg,
            batch_enc=args.batch_enc, batch_dec=args.batch_dec,
            dtypes=dtypes, calls=args.calls,
            out_path=out_path,
            with_pallas=not args.no_pallas,
        )
        written.append(out_path)
        print(f"   done {name}", flush=True)
    print("records:", *written, sep="\n  ")
    return written


if __name__ == "__main__":
    main()
