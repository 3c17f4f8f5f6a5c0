"""Deploy runner — the XLA-AOT equivalent of the reference's TVM runner
(reference deploy/tx2_run_tvm.py:7-91).

Where the reference loads {deploy_lib.o, deploy_cuda.ptx,
deploy_graph.json, deploy_param.params} into the TVM graph runtime, this
loads a checkpoint, AOT-compiles the forward for the fixed input shape,
feeds a golden npy input, saves the prediction npy, and reports
warmup+repeat timings (including the randomized-input variant).

Usage:
    python -m fastdepth_tpu.cli.deploy --model CKPT --input-fp rgb.npy \
        [--output-fp pred.npy] [--warmup 10] [--run 100] [--bf16]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="FastDepth-TPU deploy runner")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--model",
                     help="checkpoint (.npz or torch pickle); replaces --model-dir")
    src.add_argument("--load-bundle", metavar="PREFIX",
                     help="run a prebuilt <PREFIX>.stablehlo + .npz deploy "
                          "bundle (from --save-bundle) instead of compiling "
                          "from a checkpoint — the reference runner's own "
                          "flow (tx2_run_tvm.py:13-26 loads its compiled "
                          "artifact set)")
    p.add_argument("--input-fp", required=True, help="input rgb .npy (HWC in [0,1] or CHW)")
    p.add_argument("--output-fp", default="pred.npy", help="prediction .npy out")
    p.add_argument("--warmup", type=int, default=10, help="warmup trials (tx2_run_tvm.py:43)")
    p.add_argument("--run", type=int, default=100, help="timed trials (tx2_run_tvm.py:48)")
    p.add_argument("--randomized-input-timing", action="store_true",
                   help="also time with fresh random inputs (tx2_run_tvm.py:56-65)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--impl", default="auto",
                   choices=["auto", "xla", "opt", "mixed"],
                   help="forward implementation (engine/aot._pick_apply); "
                        "'mixed' runs each decoder stage on its autotuned "
                        "winner from --tuning")
    p.add_argument("--tuning", default=None, metavar="JSON",
                   help="with --impl mixed: tuning record (tuning/*.json), "
                        "the analogue of the AutoTVM log the reference's "
                        "deploy artifact was compiled with")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler device trace to DIR")
    p.add_argument("--save-bundle", default=None, metavar="PREFIX",
                   help="also write the deploy artifact pair "
                        "<PREFIX>.stablehlo + <PREFIX>.npz (the analogue of "
                        "the reference's TVM deploy_lib/graph/params bundle)")
    return p.parse_args(argv)


def load_input(path: str) -> np.ndarray:
    """Accepts (H, W, 3), (3, H, W), or (1, 3, H, W) float arrays; returns
    (1, H, W, 3) float32 (the reference feeds 1x3x224x224 NCHW,
    tx2_run_tvm.py:28-33)."""
    arr = np.asarray(np.load(path), np.float32)
    if arr.ndim == 4:
        arr = arr[0]
    if arr.ndim != 3:
        raise ValueError(f"bad input shape {arr.shape}")
    if arr.shape[0] == 3 and arr.shape[-1] != 3:
        arr = np.transpose(arr, (1, 2, 0))
    return arr[None]


def main(argv=None):
    args = parse_args(argv)
    if args.model:
        assert os.path.isfile(args.model), f"=> no model found at '{args.model}'"
    else:
        assert os.path.isfile(args.load_bundle + ".stablehlo"), (
            f"=> no bundle found at '{args.load_bundle}.stablehlo'")

    import jax
    import jax.numpy as jnp

    from fastdepth_tpu.engine.aot import compile_forward, flops_estimate
    from fastdepth_tpu.engine.benchmark import (
        setup_compile_cache,
        time_fn,
        time_randomized,
    )

    setup_compile_cache()

    x = load_input(args.input_fp)
    h, w = x.shape[1], x.shape[2]

    if args.load_bundle:
        from fastdepth_tpu.engine.aot import load_bundle

        # flag conflicts fail BEFORE the (potentially large) deserialize
        if args.bf16:
            raise SystemExit("--bf16 has no effect on a prebuilt bundle "
                             "(precision was baked in at --save-bundle time)")
        if args.impl != "auto" or args.tuning:
            raise SystemExit("--impl/--tuning have no effect on a prebuilt "
                             "bundle (the kernel choice was baked in at "
                             "--save-bundle time)")
        if args.save_bundle:
            raise SystemExit("--save-bundle requires --model (a bundle is "
                             "already the saved artifact)")
        print(f"=> loading bundle '{args.load_bundle}'")
        call, prepared, config, spec = load_bundle(args.load_bundle)
        want = (spec.get("batch_size", 1), *spec.get("image_size", (h, w)), 3)
        if tuple(x.shape) != tuple(want):
            raise SystemExit(
                f"=> bundle expects input {tuple(want)} "
                f"({spec.get('dtype', 'float32')} compute), got {x.shape} "
                f"from '{args.input_fp}'")
        compiled = jax.jit(call)  # cache the deserialized executable
    else:
        dtype = jnp.bfloat16 if args.bf16 else jnp.float32
        from fastdepth_tpu.cli.evaluate import load_params_and_model

        print(f"=> loading model '{args.model}'")
        params, model, _ = load_params_and_model(args.model)
        print(f"=> compiling for {x.shape} ({dtype.__name__})")
        compiled, prepared = compile_forward(
            model, params, batch_size=1, image_size=(h, w), dtype=dtype,
            impl=args.impl, tuning=args.tuning,
        )
        fl = flops_estimate(compiled)
        if fl:
            print(f"=> compiled; {fl / 1e9:.3f} GFLOP/frame")

    pred = np.asarray(compiled(prepared, jnp.asarray(x)))
    np.save(args.output_fp, np.transpose(pred, (0, 3, 1, 2)))  # NCHW like the reference
    print(f"=> saved prediction to {args.output_fp}")

    if args.save_bundle:
        from fastdepth_tpu.engine.aot import save_bundle

        save_bundle(args.save_bundle, model, params, batch_size=1,
                    image_size=(h, w), dtype=dtype, impl=args.impl,
                    tuning=args.tuning)
        print(f"=> saved bundle {args.save_bundle}.stablehlo + .npz")

    from fastdepth_tpu.engine.profiler import trace

    with trace(args.profile):
        stats = time_fn(compiled, (prepared, jnp.asarray(x)),
                        warmup=args.warmup, repeats=args.run)
    print(f"=> [timed] mean={stats['mean_s'] * 1e3:.3f} ms  "
          f"median={stats['median_s'] * 1e3:.3f} ms  "
          f"({1.0 / stats['median_s']:.1f} fps)")

    if args.randomized_input_timing:
        rng = np.random.RandomState(0)

        def make_input(i):
            return jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)

        rstats = time_randomized(lambda v: compiled(prepared, v), make_input,
                                 warmup=args.warmup, repeats=args.run)
        print(f"=> [randomized] mean={rstats['mean_s'] * 1e3:.3f} ms  "
              f"median={rstats['median_s'] * 1e3:.3f} ms")
    return stats


if __name__ == "__main__":
    main()
