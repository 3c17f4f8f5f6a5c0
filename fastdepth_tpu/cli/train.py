"""Training CLI — the full train/validate/checkpoint cycle the reference
release dropped (its main.py keeps only --evaluate, main.py:45-60; CSV
fieldnames and best-result tracking at main.py:20-24 define the harness
semantics rebuilt here; recipe per BASELINE.json config #5).

Usage:
    python -m fastdepth_tpu.cli.train --data-root ../data [--epochs 20]
        [--pretrained-encoder imagenet.npz|model_best.pth.tar]
        [--arch mobilenet-nnconv5dw-skipadd] [--mesh-devices N]
"""

from __future__ import annotations

import argparse
import csv
import os
import time

import numpy as np


def parse_args(argv=None):
    from fastdepth_tpu.parallel.distributed import add_distributed_args

    p = argparse.ArgumentParser(description="FastDepth-TPU training")
    p.add_argument("--data", default="nyudepthv2", choices=["nyudepthv2"])
    p.add_argument("--data-root", default=os.path.join("..", "data"))
    p.add_argument("--arch", default="mobilenet-nnconv5dw-skipadd")
    p.add_argument("--arch-json", default=None, metavar="JSON",
                   help="train an explicit ModelConfig loaded from a JSON "
                        "file (per-layer channel lists — how pruned nets "
                        "are specified) instead of a registry --arch name")
    add_distributed_args(p)
    p.add_argument("--pretrained-encoder", default=None,
                   help="ImageNet MobileNet ckpt (torch .pth.tar or .npz)")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--lr-decay-step", type=int, default=5)
    p.add_argument("--lr-decay-gamma", type=float, default=0.2)
    p.add_argument("-j", "--workers", type=int, default=8)
    p.add_argument("--print-freq", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh-devices", type=int, default=None)
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the forward in backprop (jax.checkpoint): "
                        "trades FLOPs for activation memory at large batch/resolution")
    p.add_argument("--bf16", action="store_true",
                   help="mixed-precision training: bf16 forward/backward on "
                        "the MXU, fp32 master weights/momentum/BN stats "
                        "(no loss scaling needed — bf16 keeps fp32's "
                        "exponent range)")
    p.add_argument("--device-augment", action="store_true",
                   help="run the whole train augmentation chain (composed "
                        "gather, rotation pad, depth/=s, color jitter, /255) "
                        "ON DEVICE inside the jitted train step; the host "
                        "computes only per-item index vectors and jitter "
                        "factors — bit-identical items to the host pipeline "
                        "(tests/test_device_aug.py). Measured a large net "
                        "LOSS on this TPU (XLA per-index gather floor: 126 "
                        "vs 4,264 train fps at b128 — docs/kernel_notes.md "
                        "r5); use only on backends whose gathers ride DMA")
    p.add_argument("--accum-steps", type=int, default=1,
                   help="gradient accumulation: split each batch into this "
                        "many sequential microbatches (lax.scan) and apply "
                        "one averaged update — the memory lever when "
                        "--batch-size exceeds HBM even under --remat; "
                        "batch size must be divisible by it")
    p.add_argument("--output-dir", default="results")
    p.add_argument("--eval-batch-size", type=int, default=8)
    p.add_argument("--resume", default=None, metavar="PATH",
                   help="resume from a checkpoint.npz written by this CLI: "
                        "restores params, optimizer momentum, epoch counter, "
                        "and best-result tracking (arch comes from the "
                        "checkpoint; --arch is ignored)")
    return p.parse_args(argv)


def load_pretrained_encoder(path: str):
    """ImageNet MobileNet checkpoint -> encoder param tree
    (reference models.py:659-670 pretrained=True path)."""
    from fastdepth_tpu.checkpoint.convert import (
        convert_imagenet_mobilenet,
        load_torch_checkpoint,
    )
    from fastdepth_tpu.checkpoint.io import load_checkpoint

    if path.endswith(".npz"):
        params, _, _ = load_checkpoint(path)
        return params.get("encoder", params)
    sd, kind, _, _ = load_torch_checkpoint(path)
    enc, _, _ = convert_imagenet_mobilenet(sd)
    return enc


def main(argv=None):
    args = parse_args(argv)

    # multi-process wiring FIRST: jax.distributed.initialize must run
    # before the backend binds (device enumeration)
    from fastdepth_tpu.parallel.distributed import init_distributed, is_primary

    distributed = init_distributed(args)

    import jax
    import jax.numpy as jnp

    from fastdepth_tpu.engine.benchmark import setup_compile_cache

    setup_compile_cache()
    primary = is_primary()
    # one rank owns the side effects (prints, CSVs, checkpoints); every
    # rank runs the same compute + collectives
    log = print if primary else (lambda *a, **k: None)

    from fastdepth_tpu.checkpoint.io import (
        load_train_checkpoint,
        numpy_to_jax,
        save_checkpoint,
        save_train_checkpoint,
    )
    from fastdepth_tpu.config import TrainConfig
    from fastdepth_tpu.data import BatchLoader, NYUDataset
    from fastdepth_tpu.engine import Evaluator, validate
    from fastdepth_tpu.metrics import Result
    from fastdepth_tpu.models import build, from_name
    from fastdepth_tpu.parallel import mesh_from_cli
    from fastdepth_tpu.train import Trainer

    # mesh args validated (SystemExit) before checkpoint/data work
    from fastdepth_tpu.parallel.distributed import validate_distributed_batches

    validate_distributed_batches(
        distributed, args.mesh_devices,
        **{"--batch-size": args.batch_size,
           "--eval-batch-size": args.eval_batch_size})
    mesh = mesh_from_cli(args.mesh_devices, None, batch_size=args.batch_size)
    if mesh is not None and args.eval_batch_size % args.mesh_devices:
        raise SystemExit(
            f"--eval-batch-size {args.eval_batch_size} must divide by "
            f"--mesh-devices {args.mesh_devices}")
    if args.accum_steps < 1:
        raise SystemExit(f"--accum-steps must be >= 1, got {args.accum_steps}")
    if args.batch_size % args.accum_steps:
        raise SystemExit(
            f"--batch-size {args.batch_size} must divide by "
            f"--accum-steps {args.accum_steps} (equal microbatches)")
    if (mesh is not None
            and (args.batch_size // args.accum_steps) % args.mesh_devices):
        raise SystemExit(
            f"microbatch size {args.batch_size // args.accum_steps} "
            f"(--batch-size / --accum-steps) must divide by "
            f"--mesh-devices {args.mesh_devices}: each device scans its "
            f"own microbatch rows")

    tc = TrainConfig(
        lr=args.lr, momentum=args.momentum, weight_decay=args.weight_decay,
        epochs=args.epochs, batch_size=args.batch_size,
        lr_decay_step=args.lr_decay_step, lr_decay_gamma=args.lr_decay_gamma,
        seed=args.seed,
    )
    resume_tree = resume_meta = None
    if args.resume:
        if args.pretrained_encoder:
            raise SystemExit(
                "--resume and --pretrained-encoder conflict: resume restores "
                "the full checkpointed state, so the encoder load would be "
                "discarded. Drop one of the two flags.")
        if args.arch_json:
            raise SystemExit(
                "--resume and --arch-json conflict: resume rebuilds the "
                "model from the checkpoint's own config, so the JSON "
                "architecture would be silently ignored. Drop one of the "
                "two flags.")
        log(f"=> resuming from '{args.resume}'")
        resume_tree, ckpt_cfg, resume_meta = load_train_checkpoint(args.resume)
        model = build(ckpt_cfg)
        # numpy tree is fine here: Trainer.restore() below replaces the
        # whole state (params + momentum + step) in one placement, so
        # converting/placing params twice would be wasted transfers
        params = resume_tree["params"]
    else:
        if args.arch_json:
            from fastdepth_tpu.config import config_from_json

            model = build(config_from_json(args.arch_json))
        else:
            model = from_name(args.arch)
        # seeded init: every process derives identical params (the
        # jax.distributed single-program replication convention)
        params = model.init(jax.random.PRNGKey(args.seed))
        if args.pretrained_encoder:
            log(f"=> loading pretrained encoder '{args.pretrained_encoder}'")
            params = dict(params, encoder=numpy_to_jax(
                load_pretrained_encoder(args.pretrained_encoder)))

    log("=> creating data loaders...")
    from fastdepth_tpu.parallel.distributed import shard_kwargs

    root = os.path.join(args.data_root, args.data)
    train_ds = NYUDataset(os.path.join(root, "train"), split="train",
                          seed=args.seed, device_augment=args.device_augment)
    val_ds = NYUDataset(os.path.join(root, "val"), split="val")
    # each process loads only its contiguous rows of every global batch
    # (identity single-process); same seed -> same shuffles everywhere
    train_loader = BatchLoader(
        train_ds, batch_size=args.batch_size, shuffle=True,
        num_workers=args.workers, drop_last=True, pad_last=False,
        seed=args.seed, **shard_kwargs(),
    )
    val_loader = BatchLoader(val_ds, batch_size=args.eval_batch_size,
                             num_workers=args.workers, pad_last=True,
                             **shard_kwargs())
    log(f"=> {len(train_ds)} train / {len(val_ds)} val images")

    trainer = Trainer(model, params, tc, mesh=mesh, remat=args.remat,
                      compute_dtype=jnp.bfloat16 if args.bf16 else None,
                      accum_steps=args.accum_steps,
                      device_augment=args.device_augment)

    if primary:
        os.makedirs(args.output_dir, exist_ok=True)
    train_csv = os.path.join(args.output_dir, "train.csv")
    test_csv = os.path.join(args.output_dir, "test.csv")
    best = Result().set_to_worst()
    best_epoch = -1
    start_epoch = 0
    if resume_tree is not None:
        trainer.restore(resume_tree)  # momentum buffers + step counter
        start_epoch = resume_meta["epoch"] + 1
        for k, v in resume_meta.get("best_result", {}).items():
            setattr(best, k, v)
        best_epoch = resume_meta.get("extra", {}).get("best_epoch", -1)
        log(f"=> resumed at epoch {start_epoch} "
            f"(best RMSE={best.rmse:.3f} @ epoch {best_epoch})")

    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        train_loader.set_epoch(epoch)  # resume-deterministic shuffles
        loss = trainer.run_epoch(train_loader, epoch,
                                 print_freq=args.print_freq, log=log)
        log(f"=> epoch {epoch}: train loss {loss:.4f} ({time.time() - t0:.1f}s)")
        if primary:
            with open(train_csv, "a", newline="") as f:
                w = csv.writer(f)
                if f.tell() == 0:
                    w.writerow(["epoch", "loss"])
                w.writerow([epoch, loss])

        evaluator = Evaluator(model, trainer.state.params,
                              batch_size=args.eval_batch_size, mesh=mesh)
        # every rank runs validate (the metric fetch is a collective);
        # the primary writes CSV/PNGs.  Comparison strips stay off in
        # multi-process mode: each host holds only its rgb shard, so the
        # global-index strip rows aren't addressable from one rank.
        result = validate(
            val_loader, evaluator, epoch=epoch, print_freq=args.print_freq,
            output_dir=args.output_dir if primary else None,
            write_to_file=primary, csv_path=test_csv,
            make_images=not distributed, log=log,
        )
        # best-epoch tracking by RMSE (reference main.py:20-24 semantics);
        # `result` is the all-gathered global average — identical on
        # every rank, so best tracking stays in lockstep
        if result.rmse < best.rmse:
            best = result
            best_epoch = epoch
            if primary:
                save_checkpoint(
                    os.path.join(args.output_dir, "model_best.npz"),
                    trainer.state.params, model.config, epoch=epoch,
                    best_result={"rmse": best.rmse, "delta1": best.delta1,
                                 "mae": best.mae, "absrel": best.absrel},
                )
            log(f"=> new best (epoch {epoch}): RMSE={best.rmse:.3f}")
        # the resume file: full training state (momentum + step), plus
        # the best-so-far record so resume keeps best tracking intact
        if primary:
            save_train_checkpoint(
                os.path.join(args.output_dir, "checkpoint.npz"),
                trainer.state, model.config, epoch=epoch,
                best_result={"rmse": best.rmse, "delta1": best.delta1,
                             "mae": best.mae, "absrel": best.absrel}
                if best_epoch >= 0 else {},
                extra={"best_epoch": best_epoch},
            )
    log(f"=> done; best epoch {best_epoch}: RMSE={best.rmse:.3f} "
        f"Delta1={best.delta1:.3f}")
    return best


if __name__ == "__main__":
    main()
