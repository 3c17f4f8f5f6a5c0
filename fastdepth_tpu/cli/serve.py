"""Serving CLI: a micro-batching depth-inference daemon on a unix socket.

The production-facing end of the deploy path (reference
deploy/tx2_run_tvm.py stops at a one-shot graph run + timing): load a
checkpoint (native .npz or TRUSTED reference .pth.tar pickle), compile
one fixed-batch forward, and answer length-prefixed .npy frames over a
unix socket — single frames in, (H, W, 1) depth maps out, transparently
packed into device batches (engine/server.py).

    python -m fastdepth_tpu.cli.serve --evaluate model_best.npz \
        --socket /tmp/fastdepth.sock --batch-size 32 [--bf16] [--impl auto]

Smoke a running server:

    python -m fastdepth_tpu.cli.serve --socket /tmp/fastdepth.sock \
        --ping path/to/rgb.npy
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="FastDepth-TPU serving daemon")
    p.add_argument("-e", "--evaluate", default=None, metavar="PATH",
                   help="checkpoint: native .npz or reference .pth[.tar] "
                        "(TRUSTED source only — full-module pickle)")
    p.add_argument("--socket", default="/tmp/fastdepth.sock")
    p.add_argument("--batch-size", type=int, default=32,
                   help="compiled device batch; requests are packed into it")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--impl", default="auto", choices=["auto", "xla", "opt"])
    p.add_argument("--image-size", type=int, nargs=2, default=(224, 224),
                   metavar=("H", "W"))
    p.add_argument("--ping", default=None, metavar="RGB_NPY",
                   help="client mode: send one frame to --socket and print "
                        "the prediction stats (no model load)")
    p.add_argument("--ping-out", default=None, metavar="PRED_NPY",
                   help="with --ping: also save the prediction (NCHW, like "
                        "the reference deploy runner)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import numpy as np

    from fastdepth_tpu.engine.server import request

    if args.ping:
        rgb = np.load(args.ping)
        if rgb.ndim == 3 and rgb.shape[0] == 3:  # CHW -> HWC
            rgb = np.transpose(rgb, (1, 2, 0))
        pred = request(args.socket, rgb.astype(np.float32))
        print(f"pred shape={pred.shape} min={pred.min():.4f} "
              f"max={pred.max():.4f} mean={pred.mean():.4f}")
        if args.ping_out:
            np.save(args.ping_out, np.transpose(pred[None], (0, 3, 1, 2)))
            print(f"=> saved {args.ping_out}")
        return 0

    if not args.evaluate:
        raise SystemExit("--evaluate is required (or use --ping for client mode)")

    import jax.numpy as jnp

    from fastdepth_tpu.cli.evaluate import load_params_and_model
    from fastdepth_tpu.engine.server import InferenceServer, serve_unix_socket

    print(f"=> loading model '{args.evaluate}'")
    params, model, meta = load_params_and_model(args.evaluate)
    server = InferenceServer(
        model, params,
        batch_size=args.batch_size,
        image_size=tuple(args.image_size),
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        impl=args.impl,
    )
    try:
        serve_unix_socket(server, args.socket)
    except KeyboardInterrupt:
        print("\n=> shutting down")
    finally:
        server.close()
        if os.path.exists(args.socket):
            os.unlink(args.socket)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
