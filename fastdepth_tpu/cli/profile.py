"""Per-layer time attribution + roofline for the FastDepth forward pass.

The reference's only "profile" is two wall-clock pairs with the device
syncs commented out (reference main.py:69-77).  This tool attributes
real device time per layer on the actual chip, two ways:

* ``--mode marginal`` (default): time the full production graph, then a
  variant per layer where THAT layer runs twice on an eps-perturbed
  input, blended in by a runtime scalar so XLA can't CSE/DCE it — the
  difference is the layer's marginal in-context cost with every layout
  and fusion decision preserved.  This is the honest method on this
  platform (prefix diffs go negative under dispatch pipelining;
  docs/kernel_notes.md round 2).
* ``--mode prefix``: jit the forward truncated after layer k for every
  k, time each pipelined, difference consecutive prefixes.
* ``--trace DIR``: additionally capture a ``jax.profiler`` device trace
  around the full forward for TensorBoard/Perfetto.

Timing is pipelined with scalar-fetch sync (engine/benchmark.py —
block_until_ready lies on some transports).

Each layer also gets a roofline bound (engine/roofline.py — the same
formulas behind docs/roofline.md: conv-boundary materialization,
lane-padded VPU MACs, max(MXU, VPU, HBM)), so "measured vs bound" says
which layers leave the chip idle.

The profiled graph is the STRAIGHT forward (model.apply).  The shipped
serving path (apply_fastdepth_opt) differs only in the head: it runs the
1x1 + ReLU before the final upsample, removing the dec.head@224^2 row's
traffic (docs/kernel_notes.md round 2) — read the dec.head/dec.stage5
rows with that in mind.

Usage:
    python -m fastdepth_tpu.cli.profile [--batch 128] [--bf16] [--json OUT]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from fastdepth_tpu.engine import roofline as RL


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="per-layer profile + roofline")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--calls", type=int, default=30)
    p.add_argument("--json", default=None, help="write the table to this JSON file")
    p.add_argument("--mode", default="marginal", choices=["marginal", "prefix"])
    p.add_argument("--trace", default=None, help="also write a jax.profiler trace here")
    p.add_argument("--model", default="pruned", choices=["pruned", "unpruned"])
    return p.parse_args(argv)


def prefix_points(cfg):
    """(label, kind) per attribution point: encoder stem + 13 blocks,
    5 decoder stages (conv+upsample+skip), final head."""
    pts = [("enc.conv0", "stem")]
    pts += [(f"enc.conv{i}", "enc_block") for i in range(1, 14)]
    pts += [(f"dec.stage{i}", "dec_stage") for i in range(1, 6)]
    pts += [("dec.head", "head")]
    return pts


def make_prefix_fn(model, cfg, upto: int):
    """Forward truncated after attribution point `upto` (1-based count of
    prefix_points), reduced to a scalar so the sync fetch is O(1)."""
    import jax.numpy as jnp

    from fastdepth_tpu.models import layers as L
    from fastdepth_tpu.ops import blocks as B
    from fastdepth_tpu.config import MOBILENET_STRIDES

    def fn(params, x):
        n = 0
        act = B.relu6 if cfg.encoder_relu6 else B.relu
        enc = params["encoder"]
        y = L.apply_conv_bn(x, enc["conv0"], stride=2, act=act)
        n += 1
        tapped = {}
        if n >= upto:
            return jnp.sum(y, dtype=jnp.float32)
        for i in range(1, 14):
            p = enc[f"conv{i}"]
            y = L.apply_conv_bn(y, p["dw"], stride=MOBILENET_STRIDES[i - 1],
                                act=act, depthwise=True)
            y = L.apply_conv_bn(y, p["pw"], act=act)
            if i in (1, 3, 5):
                tapped[i] = y
            n += 1
            if n >= upto:
                return jnp.sum(y, dtype=jnp.float32)
        dec = params["decoder"]
        for i in range(1, 6):
            p = dec[f"decode_conv{i}"]
            y = L.apply_conv_bn(y, p["dw"], depthwise=True)
            y = L.apply_conv_bn(y, p["pw"])
            y = B.upsample_nearest2x(y)
            if cfg.skip == "add":
                if i == 2:
                    y = y + tapped[5]
                elif i == 3:
                    y = y + tapped[3]
                elif i == 4:
                    y = y + tapped[1]
            n += 1
            if n >= upto:
                return jnp.sum(y, dtype=jnp.float32)
        y = L.apply_conv_bn(y, dec["decode_conv6"]["pw"])
        return jnp.sum(y, dtype=jnp.float32)

    return fn


def make_marginal_fn(model, cfg, dup):
    """Full forward with attribution point ``dup`` (1-based index into
    prefix_points, or None) executed twice — the second time on an
    eps-perturbed input, blended in by the runtime scalar ``eps`` so XLA
    cannot CSE or DCE the duplicate (exact at eps=0).  Timing difference
    vs the dup=None base = the layer's marginal in-context cost."""
    import jax.numpy as jnp

    from fastdepth_tpu.config import MOBILENET_STRIDES
    from fastdepth_tpu.models import layers as L
    from fastdepth_tpu.ops import blocks as B

    def fn(params, x, eps):
        n = [0]

        def point(f, xin):
            n[0] += 1
            y = f(xin)
            if dup == n[0]:
                y2 = f(xin * (1 + eps.astype(xin.dtype)))
                y = y + eps.astype(y.dtype) * (y2 - y)
            return y

        act = B.relu6 if cfg.encoder_relu6 else B.relu
        enc = params["encoder"]
        y = point(lambda t: L.apply_conv_bn(t, enc["conv0"], stride=2, act=act), x)
        tapped = {}
        for i in range(1, 14):
            p = enc[f"conv{i}"]

            def blk(t, p=p, s=MOBILENET_STRIDES[i - 1]):
                t = L.apply_conv_bn(t, p["dw"], stride=s, act=act, depthwise=True)
                return L.apply_conv_bn(t, p["pw"], act=act)

            y = point(blk, y)
            if i in (1, 3, 5):
                tapped[i] = y
        dec = params["decoder"]
        skips = {2: 5, 3: 3, 4: 1} if cfg.skip == "add" else {}
        for i in range(1, 6):
            p = dec[f"decode_conv{i}"]
            skip = tapped[skips[i]] if i in skips else None

            def stage(t, p=p, skip=skip):
                t = L.apply_conv_bn(t, p["dw"], depthwise=True)
                t = L.apply_conv_bn(t, p["pw"])
                t = B.upsample_nearest2x(t)
                return t + skip if skip is not None else t

            y = point(stage, y)
        y = point(lambda t: L.apply_conv_bn(t, dec["decode_conv6"]["pw"]), y)
        return jnp.sum(y, dtype=jnp.float32)

    return fn


def layer_roofline(cfg, batch: int, hw: int, dtype_bytes: int):
    """Per-attribution-point (name, macs, hbm_bytes, bound_s) — formulas
    shared with docs/roofline.md via engine/roofline.py (conv-boundary
    materialization, lane-padded VPU MACs)."""
    return [
        (key, batch * macs, batch * hbm_e * dtype_bytes,
         RL.bound_seconds(hbm_e, mxu, vpu, dtype_bytes, batch))
        for key, macs, hbm_e, mxu, vpu in RL.layer_bounds(cfg, hw)
    ]


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from fastdepth_tpu.engine.benchmark import setup_compile_cache, time_pipelined

    setup_compile_cache()
    from fastdepth_tpu.models import fastdepth_pruned, fastdepth_unpruned

    model = fastdepth_pruned() if args.model == "pruned" else fastdepth_unpruned()
    cfg = model.config
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    params = model.fold(model.init(jax.random.PRNGKey(0)))
    params = jax.tree.map(lambda a: a.astype(dtype), params)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(args.batch, args.image_size, args.image_size, 3), dtype)

    pts = prefix_points(cfg)
    roof = layer_roofline(cfg, args.batch, args.image_size,
                          2 if args.bf16 else 4)

    # full model first (the reference number)
    full = jax.jit(lambda p, a: jnp.sum(model.apply(p, a), dtype=jnp.float32))
    t_full = time_pipelined(full, (params, x), warmup=3, calls=args.calls)["mean_s"]
    print(f"full forward: {t_full * 1e6:.0f} us/call, "
          f"{args.batch / t_full:.0f} fps (b{args.batch}, "
          f"{'bf16' if args.bf16 else 'fp32'})")

    if args.trace:
        from fastdepth_tpu.engine.profiler import trace

        with trace(args.trace):
            for _ in range(3):
                out = full(params, x)
            float(out)
        print(f"trace written to {args.trace}")

    deltas = []
    if args.mode == "marginal":
        eps = jnp.float32(1e-6)
        base_fn = jax.jit(make_marginal_fn(model, cfg, None))
        t_base = time_pipelined(base_fn, (params, x, eps), warmup=3,
                                calls=args.calls)["mean_s"]
        print(f"  marginal base: {t_base * 1e6:8.1f} us")
        for k in range(1, len(pts) + 1):
            fn = jax.jit(make_marginal_fn(model, cfg, k))
            t = time_pipelined(fn, (params, x, eps), warmup=2,
                               calls=args.calls)["mean_s"]
            deltas.append(t - t_base)
            print(f"  marginal {k:2d} ({pts[k - 1][0]:<12}): "
                  f"+{(t - t_base) * 1e6:8.1f} us")
    else:
        cum = []
        for k in range(1, len(pts) + 1):
            fn = jax.jit(make_prefix_fn(model, cfg, k))
            t = time_pipelined(fn, (params, x), warmup=2, calls=args.calls)["mean_s"]
            cum.append(t)
            print(f"  prefix {k:2d} ({pts[k - 1][0]:<12}): cum {t * 1e6:8.1f} us")
        prev = 0.0
        for t in cum:
            deltas.append(t - prev)
            prev = t

    table = []
    print(f"\n{'layer':<12} {'meas us':>9} {'bound us':>9} {'x-bound':>8} "
          f"{'MACs(M)':>9} {'MB':>7}")
    for (name, _kind), dt, (rname, macs, byts, bound) in zip(pts, deltas, roof):
        ratio = dt / bound if bound > 0 else float("inf")
        table.append({
            "layer": name, "measured_us": dt * 1e6, "bound_us": bound * 1e6,
            "x_bound": ratio, "macs": macs, "hbm_bytes": byts,
        })
        print(f"{name:<12} {dt * 1e6:>9.1f} {bound * 1e6:>9.1f} {ratio:>8.2f} "
              f"{macs / 1e6:>9.1f} {byts / 1e6:>7.2f}")
    total_bound = sum(r[3] for r in roof)
    print(f"\nsum of bounds: {total_bound * 1e6:.0f} us; measured full: "
          f"{t_full * 1e6:.0f} us; layer-sum: {sum(deltas) * 1e6:.0f} us")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({
                "batch": args.batch, "dtype": "bf16" if args.bf16 else "fp32",
                "model": args.model, "mode": args.mode,
                "full_us": t_full * 1e6, "fps": args.batch / t_full,
                "layers": table,
                "peaks": {"mxu_macs": RL.MXU_MACS, "vpu_macs": RL.VPU_MACS,
                          "hbm_bps": RL.HBM_BPS},
            }, f, indent=1)
        print(f"json -> {args.json}")
    return table


if __name__ == "__main__":
    main()
