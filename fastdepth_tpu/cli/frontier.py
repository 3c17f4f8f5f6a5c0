"""Throughput-frontier sweep: the TPU analogue of the reference's
accuracy-vs-fps plots (reference img/acc_fps_{gpu,cpu}.png,
README.md:140-143).

Sweeps the model zoo x dtype x batch on the attached chip and writes a
JSON + markdown table of fps per configuration.  Accuracy columns carry
the published values where the reference publishes them (README.md:136 —
the pruned flagship row); measuring the rest needs the real checkpoints
+ NYU val set (docs/parity_runbook.md) — the table marks them pending.

    python -m fastdepth_tpu.cli.frontier [--out docs/frontier]
"""

from __future__ import annotations

import argparse
import json
import os
import time

# (zoo name, config factory key, published RMSE m / delta1 if any)
SWEEP_MODELS = [
    ("mobilenet-nnconv5dw-skipadd-pruned", "pruned", 0.604, 0.771),
    ("mobilenet-nnconv5dw-skipadd", "unpruned", None, None),
    ("mobilenet-nnconv5dw", "nnconv5dw", None, None),
    ("mobilenet-nnconv5", "nnconv5", None, None),
]


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="throughput frontier sweep")
    p.add_argument("--out", default=os.path.join("docs", "frontier"),
                   help="output stem: writes <out>.json and <out>.md")
    p.add_argument("--batches", default="1,32,128,256")
    p.add_argument("--dtypes", default="bfloat16,float32")
    p.add_argument("--models", default="all")
    p.add_argument("--calls", type=int, default=30)
    p.add_argument("--budget-s", type=float, default=3000.0,
                   help="stop adding configs past this wall-clock budget")
    return p.parse_args(argv)


def _build(key):
    from fastdepth_tpu.config import (
        FASTDEPTH_PRUNED,
        FASTDEPTH_UNPRUNED,
        ModelConfig,
    )
    from fastdepth_tpu.models import build

    cfg = {
        "pruned": FASTDEPTH_PRUNED,
        "unpruned": FASTDEPTH_UNPRUNED,
        "nnconv5dw": ModelConfig(decoder="nnconv5dw", skip=None),
        "nnconv5": ModelConfig(decoder="nnconv5", skip=None),
    }[key]
    return build(cfg)


def macs_g(model) -> float:
    """Analytic multiply-accumulates per frame at 224x224 (the README
    table's 'MACs [G]' column, reference README.md:136)."""
    cfg = model.config
    from fastdepth_tpu.config import MOBILENET_STRIDES

    enc = cfg.encoder_channels
    total = 112 * 112 * enc[0] * 9 * cfg.in_channels  # stem
    h, cin = 112, enc[0]
    for i in range(1, 14):
        s = MOBILENET_STRIDES[i - 1]
        h_out = h // s
        total += h_out * h_out * cin * 9          # dw3x3
        total += h_out * h_out * cin * enc[i]     # pw
        h, cin = h_out, enc[i]
    k = cfg.decoder_kernel
    for cout in cfg.decoder_channels:
        if cfg.decoder_depthwise:
            total += h * h * cin * k * k + h * h * cin * cout
        else:
            total += h * h * k * k * cin * cout
        h, cin = h * 2, cout
    total += h * h * cin  # 1x1 head
    return total / 1e9


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fastdepth_tpu.engine.benchmark import setup_compile_cache, time_pipelined

    setup_compile_cache()

    batches = [int(b) for b in args.batches.split(",")]
    dtypes = [d.strip() for d in args.dtypes.split(",")]
    for d in dtypes:
        if not hasattr(jnp, d):
            raise SystemExit(f"unknown dtype {d!r} (e.g. bfloat16, float32)")
    wanted = (None if args.models == "all"
              else {m.strip() for m in args.models.split(",")})
    if wanted is not None:
        known = {name for name, *_ in SWEEP_MODELS}
        unknown = wanted - known
        if unknown:
            raise SystemExit(
                f"unknown model(s) {sorted(unknown)}; valid: {sorted(known)}")

    rng = np.random.RandomState(0)
    t_start = time.time()
    rows = []
    over_budget = False
    for name, key, rmse, d1 in SWEEP_MODELS:
        if over_budget or (wanted is not None and name not in wanted):
            continue
        model = _build(key)
        params32 = model.fold(model.init(jax.random.PRNGKey(0)))
        impls = [("xla", jax.jit(lambda p, a: model.apply(p, a)))]
        from fastdepth_tpu.models.fused import supports_opt

        if supports_opt(model.config):
            from fastdepth_tpu.models.fused import apply_fastdepth_opt

            # exact head-commute rewrite (models/fused.py); the deployed
            # config per model is whichever impl wins below
            impls.append(("opt", jax.jit(
                lambda p, a, m=model: apply_fastdepth_opt(p, a, m.config))))
        # the tuned path (VERDICT r3 item 4): each decoder stage on its
        # autotuned winner — the analogue of the reference RUNNING its
        # AutoTVM log (deploy/tx2_run_tvm.py:13-26). Only on a real TPU
        # backend (pallas winners interpret elsewhere — the timing would
        # be a garbage row) and when a committed record for this model
        # exists on this chip family.
        tuning_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            "tuning", f"tpuv5lite.{name}.json")
        from fastdepth_tpu.models.fused import supports_fused

        if (jax.default_backend() in ("tpu", "axon")
                and supports_fused(model.config)  # fused-stage family only
                and os.path.exists(tuning_path)):
            from fastdepth_tpu.engine.aot import _pick_apply

            impls.append(("mixed", jax.jit(
                _pick_apply(model, params32, "mixed", tuning=tuning_path))))
        for dtype_name in dtypes:
            if over_budget:
                break
            dtype = getattr(jnp, dtype_name)
            params = jax.tree.map(lambda a: a.astype(dtype), params32)
            for b in batches:
                if over_budget:
                    break
                for impl_name, fwd in impls:
                    if time.time() - t_start > args.budget_s and rows:
                        if not over_budget:
                            print("! budget hit, skipping the rest of the "
                                  "sweep", flush=True)
                        over_budget = True
                    if over_budget:
                        break
                    x = jnp.asarray(rng.rand(b, 224, 224, 3), dtype)
                    t0 = time.time()
                    try:
                        stats = time_pipelined(fwd, (params, x), warmup=3,
                                               calls=args.calls)
                        fps = b / stats["mean_s"]
                    except Exception as e:
                        print(f"{name} {dtype_name} b{b} {impl_name}: "
                              f"FAILED {type(e).__name__}", flush=True)
                        continue
                    rows.append({
                        "model": name, "dtype": dtype_name, "batch": b,
                        "impl": impl_name,
                        "fps": round(fps, 1),
                        "us_per_frame": round(1e6 / fps, 2),
                        "macs_g": round(macs_g(model), 3),
                        "rmse_m_published": rmse, "delta1_published": d1,
                    })
                    print(f"{name} {dtype_name} b{b} {impl_name}: {fps:.0f} fps "
                          f"({time.time()-t0:.0f}s)", flush=True)

    device = jax.devices()[0].device_kind
    out = {"device": device, "image": "224x224", "rows": rows,
           "baseline_tx2_gpu_fps": 178.6}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out + ".json", "w") as f:
        json.dump(out, f, indent=1)

    lines = [
        "# Throughput frontier (one chip, 224x224)",
        "",
        "![frontier](frontier.png) (render: scripts/make_frontier_plot.py)",
        "",
        f"Device: {device}.  The reference's equivalent artifact is the "
        "acc-vs-fps plot pair (reference img/acc_fps_*.png, "
        "README.md:140-143); accuracy columns are published values "
        "(README.md:136) — 'pending' rows need the released checkpoints + "
        "NYU val set (docs/parity_runbook.md).",
        "",
        "| model | dtype | batch | impl | fps | us/frame | MACs [G] | RMSE [m] | delta1 | vs TX2-GPU |",
        "|---|---|---:|---|---:|---:|---:|---:|---:|---:|",
    ]
    for r in rows:
        lines.append(
            f"| {r['model']} | {r['dtype']} | {r['batch']} | {r.get('impl', 'xla')} "
            f"| {r['fps']:.0f} "
            f"| {r['us_per_frame']:.1f} | {r['macs_g']:.2f} "
            f"| {r['rmse_m_published'] if r['rmse_m_published'] else 'pending'} "
            f"| {r['delta1_published'] if r['delta1_published'] else 'pending'} "
            f"| {r['fps'] / 178.6:.1f}x |"
        )
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}.json and {args.out}.md ({len(rows)} rows)")
    return rows


if __name__ == "__main__":
    main()
