"""Evaluation CLI — the ``main.py --evaluate`` equivalent
(reference main.py:26-60, utils.py:12-34).

Usage:
    python -m fastdepth_tpu.cli.evaluate --evaluate CKPT [--data nyudepthv2] ...

CKPT may be a native .npz checkpoint or a reference PyTorch .pth[.tar]
pickle (converted on the fly via checkpoint/convert.py — unpickling a
full-module checkpoint executes code, so pass TRUSTED .pth files only;
the reference format leaves no safe alternative).  TPU-native
extras over the reference CLI: --batch-size, --bf16, --mesh-devices,
--mesh-spatial, --no-fold-bn.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp


def parse_args(argv=None):
    from fastdepth_tpu.parallel.distributed import add_distributed_args

    p = argparse.ArgumentParser(description="FastDepth-TPU evaluation")
    add_distributed_args(p)
    # reference flags (utils.py:12-34)
    p.add_argument("--data", metavar="DATA", default="nyudepthv2",
                   choices=["nyudepthv2"], help="dataset name")
    p.add_argument("--data-root", default=os.path.join("..", "data"),
                   help="datasets directory (reference hardcodes ../data, main.py:31)")
    p.add_argument("--modality", "-m", default="rgb", choices=["rgb"])
    p.add_argument("-j", "--workers", default=8, type=int, metavar="N")
    p.add_argument("--print-freq", "-p", default=50, type=int, metavar="N")
    p.add_argument("-e", "--evaluate", required=True, type=str, metavar="PATH")
    # TPU-native flags
    p.add_argument("--batch-size", default=8, type=int)
    p.add_argument("--bf16", action="store_true", help="run the model in bfloat16")
    p.add_argument("--mesh-devices", default=None, type=int,
                   help="shard batches over this many devices (default: no mesh)")
    p.add_argument("--mesh-spatial", default=None, type=int, metavar="S",
                   help="additionally shard image HEIGHT S-way (spatial "
                        "partitioning: XLA exchanges conv halos over ICI; "
                        "total devices = mesh-devices x S; forward-exact, "
                        "see parallel/mesh.py)")
    p.add_argument("--no-fold-bn", action="store_true",
                   help="keep BatchNorm unfolded (exact reference numerics)")
    p.add_argument("--tuning", default=None, metavar="JSON",
                   help="with --impl mixed: tuning record (tuning/*.json) "
                        "selecting each decoder stage's kernel")
    p.add_argument("--impl", default="auto",
                   choices=["auto", "xla", "opt", "mixed"],
                   help="forward impl: auto = head-commute fast path when the "
                        "architecture supports it (bit-exact)")
    p.add_argument("--no-images", action="store_true", help="skip comparison PNGs")
    p.add_argument("--split", default="val", choices=["val", "holdout"],
                   help="dataset split (holdout = the two NetAdapt files, nyu.py:13-24)")
    p.add_argument("--device-normalize", action="store_true",
                   help="send uint8 RGB and /255 on device (less host->device transfer)")
    p.add_argument("--device-preprocess", action="store_true",
                   help="run the whole val resize/crop chain ON DEVICE as a "
                        "gather inside the jitted step (raw 480x640 frames "
                        "ship to the chip; host work drops to the h5 read; "
                        "identical values to the host pipeline)")
    p.add_argument("--csv", default=None, help="append final metrics to this CSV")
    return p.parse_args(argv)


def load_params_and_model(path: str):
    """Dispatch on checkpoint format; returns (params, Model, meta)."""
    from fastdepth_tpu.checkpoint.io import load_checkpoint, numpy_to_jax
    from fastdepth_tpu.models import build

    if path.endswith(".npz"):
        params, cfg, meta = load_checkpoint(path)
    else:
        from fastdepth_tpu.checkpoint.convert import convert_checkpoint

        params, cfg, meta = convert_checkpoint(path)
    return numpy_to_jax(params), build(cfg), meta


def main(argv=None):
    args = parse_args(argv)
    # multi-process wiring FIRST (before any device enumeration binds
    # the backend); every rank then runs this same function — the
    # primary owns prints/CSV/PNGs, all ranks share the collectives
    from fastdepth_tpu.parallel.distributed import (
        init_distributed,
        is_primary,
        shard_kwargs,
        validate_distributed_batches,
    )

    distributed = init_distributed(args)
    validate_distributed_batches(
        distributed, args.mesh_devices,
        **{"--batch-size": args.batch_size})
    primary = is_primary()
    log = print if primary else (lambda *a, **k: None)
    # mesh args are validated (SystemExit) before any device/data work:
    # a non-divisor would otherwise surface as a low-level sharding
    # error on batch 1.  The sharded height is what reaches device_put:
    # 224 post-preprocess frames normally, RAW 480-row frames under
    # --device-preprocess (the resize happens on device, inside the
    # sharded step).
    from fastdepth_tpu.data.nyu import OUTPUT_SIZE, RAW_SIZE
    from fastdepth_tpu.parallel import mesh_from_cli

    mesh = mesh_from_cli(
        args.mesh_devices, args.mesh_spatial,
        image_height=(RAW_SIZE if args.device_preprocess else OUTPUT_SIZE)[0],
        batch_size=args.batch_size)
    assert os.path.isfile(args.evaluate), f"=> no model found at '{args.evaluate}'"
    # persistent compile cache: on tunneled-TPU hosts the remote compile
    # helper can take minutes per graph; a fresh process must not re-pay it
    from fastdepth_tpu.engine.benchmark import setup_compile_cache

    setup_compile_cache()
    log(f"=> loading model '{args.evaluate}'")
    params, model, meta = load_params_and_model(args.evaluate)
    log(f"=> loaded model (epoch {meta.get('epoch', 0)})")

    from fastdepth_tpu.data import BatchLoader, NYUDataset
    from fastdepth_tpu.engine import Evaluator, validate

    log("=> creating data loaders...")
    valdir = os.path.join(args.data_root, args.data, "val")
    dataset = NYUDataset(valdir, split=args.split, modality=args.modality,
                         device_normalize=args.device_normalize,
                         raw_items=args.device_preprocess)
    loader = BatchLoader(
        dataset, batch_size=args.batch_size, num_workers=args.workers,
        pad_last=True, **shard_kwargs(),
    )
    log("=> data loaders created.")

    evaluator = Evaluator(
        model, params,
        batch_size=args.batch_size,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        mesh=mesh,
        fold_bn=not args.no_fold_bn,
        impl=args.impl,
        tuning=args.tuning,
        val_pipeline=dataset.val_pipeline if args.device_preprocess else None,
    )
    output_dir = os.path.dirname(os.path.abspath(args.evaluate))
    # comparison strips stay off in multi-process mode: each host holds
    # only its rgb shard, so global-index strip rows aren't addressable
    result = validate(
        loader, evaluator,
        epoch=meta.get("epoch", 0),
        print_freq=args.print_freq,
        output_dir=output_dir if primary else None,
        make_images=not args.no_images and not distributed,
        viz_transform=dataset.val_pipeline if args.device_preprocess else None,
        write_to_file=args.csv is not None and primary,
        csv_path=args.csv,
        log=log,
    )
    return result


if __name__ == "__main__":
    main()
