"""Benchmark: flagship FastDepth (pruned, BN-folded) 224x224 inference
throughput on one TPU chip.

Protocol mirrors the reference's TVM deploy benchmarking — warmup runs
then timed repeats (reference deploy/tx2_run_tvm.py:42-53).  Two numbers
per config: single-call latency (includes per-call transport round trip,
which on this tunneled dev chip is ~25-40 ms and NOT model time) and
pipelined steady-state throughput (back-to-back calls, FIFO device
queue, one sync at the end — the serving-loop number, used as headline).
Synchronization is scalar-fetch based because block_until_ready does not
block on this platform (see engine/benchmark.py).

Baseline: TX2 GPU 5.6 ms/frame = 178.6 fps (reference README.md:136).
Prints ONE JSON line.
"""

import json

import numpy as np


def main():
    import os

    results = {}
    best_fps = 0.0
    best_cfg = None

    # Emit-on-kill: an external `timeout` (SIGTERM) at ANY point — device
    # init, a long compile, the optional train row — must still flush the
    # rows measured so far as the one JSON line, otherwise the whole
    # artifact is lost and the "headline first" ordering below is moot.
    # Registered BEFORE any jax/device work so even an init-phase kill
    # emits (with zero rows).
    import signal
    import sys as _sys

    emitted = [False]

    def emit(note=None):
        if emitted[0]:
            return
        emitted[0] = True
        if note:
            results["aborted"] = note
        tx2_gpu_fps = 1000.0 / 5.6  # README.md:136
        if best_fps:
            results["best_us_per_frame"] = round(1e6 / best_fps, 2)
            # two denominators (docs/roofline.md): spec-peak conv-boundary
            # aggregate 37.7 us/frame, and the round-3 MEASURED-ceiling
            # composite (single-sourced from engine/roofline over the
            # committed probe payload) — only meaningful when the
            # head-commuted bf16 b128 config is the winner
            if best_cfg == "bf16_opt_b128":
                results["x_roofline_spec"] = round(1e6 / best_fps / 37.7, 2)
                try:
                    from fastdepth_tpu.config import FASTDEPTH_PRUNED
                    from fastdepth_tpu.engine.roofline import measured_composite_us

                    probe_path = os.path.join(os.path.dirname(
                        os.path.abspath(__file__)), "docs", "probe_r3_hbm.json")
                    with open(probe_path) as pf:
                        composite = measured_composite_us(
                            FASTDEPTH_PRUNED, json.load(pf))
                    results["x_roofline_measured"] = round(
                        1e6 / best_fps / composite, 2)
                except Exception:
                    # probe payload absent OR malformed (truncated JSON,
                    # missing/zero fields): the artifact line must still
                    # print — spec ratio alone is reported
                    pass
        print(json.dumps({
            "metric": "224x224 NYUv2 frames/sec/chip",
            "value": round(best_fps, 1),
            "unit": "fps",
            "vs_baseline": round(best_fps / tx2_gpu_fps, 2),
            "best_config": best_cfg,
            "detail": results,
        }), flush=True)

    def _on_sigterm(signum, frame):
        emit(note=f"killed by signal {signum} mid-run; partial rows")
        _sys.exit(124)

    signal.signal(signal.SIGTERM, _on_sigterm)

    import jax

    # persistent compile cache: first-compile on the tunnel is minutes
    from fastdepth_tpu.engine.benchmark import setup_compile_cache

    setup_compile_cache()

    import jax.numpy as jnp

    from fastdepth_tpu.engine.benchmark import time_fn, time_pipelined
    from fastdepth_tpu.models import fastdepth_pruned
    from fastdepth_tpu.models.fused import (
        apply_fastdepth_fused_hybrid,
        apply_fastdepth_opt,
    )

    model = fastdepth_pruned()
    params32 = model.fold(model.init(jax.random.PRNGKey(0)))
    rng = np.random.RandomState(0)

    def record(tag, batch, fn, params, x, latency_too):
        nonlocal best_fps, best_cfg
        import sys
        import time as _t

        print(f"# bench {tag}_b{batch} ...", file=sys.stderr, flush=True)
        t0 = _t.time()
        try:
            # calls=60: the 10-min serving soak (scripts/soak_serving.py)
            # sustains ~19.5k fps while 30-call bursts report ~18.2k — the
            # fixed submit/sync overhead needs >=~60 calls to amortize to
            # the steady-state number
            stats = time_pipelined(fn, (params, x), warmup=3, calls=60)
        except Exception as e:
            results[f"{tag}_b{batch}"] = f"error: {type(e).__name__}: {e}"[:120]
            return
        fps = batch / stats["mean_s"]
        print(f"#   {tag}_b{batch}: {fps:.1f} fps ({_t.time() - t0:.0f}s incl. compile)",
              file=sys.stderr, flush=True)
        results[f"{tag}_b{batch}_fps"] = round(fps, 1)
        if latency_too:
            lat = time_fn(fn, (params, x), warmup=2, repeats=10)
            results[f"{tag}_b{batch}_latency_ms"] = round(lat["median_s"] * 1e3, 3)
        if fps > best_fps:
            best_fps = fps
            best_cfg = f"{tag}_b{batch}"

    # REQUIRED rows always run (the driver artifact must carry >=3 fresh
    # measurements per round — headline + fp32 throughput + b1 latency);
    # OPTIONAL rows run only while the time budget holds.  Headline
    # first so an external kill still leaves the right `value`.
    # pallas configs run at b32: the remote compile helper crashes on the
    # fused kernels at b128 (grid-length-dependent; docs/kernel_notes.md)
    REQUIRED = [
        ("bf16_opt", jnp.bfloat16, "opt", 128),
        ("fp32", jnp.float32, "xla", 128),
        ("fp32", jnp.float32, "xla", 1),
        ("bf16", jnp.bfloat16, "xla", 1),
    ]
    OPTIONAL = [
        ("bf16", jnp.bfloat16, "xla", 128),
        ("bf16_pallas", jnp.bfloat16, "pallas", 32),
        ("bf16", jnp.bfloat16, "xla", 32),
    ]
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "420"))
    t_start = __import__("time").time()
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    # hybrid: full-batch encoder + stages 1-3, lax.map'd chunk-8 tail
    # (the grid-limited stages); measured faster than all-chunked
    fused = jax.jit(lambda p, x: apply_fastdepth_fused_hybrid(p, x, model.config))
    # head-commute rewrite: exact, measured fastest (docs/kernel_notes.md r2)
    opt = jax.jit(lambda p, x: apply_fastdepth_opt(p, x, model.config))
    impls = {"xla": fwd, "pallas": fused, "opt": opt}
    by_dtype = {}
    for required, (tag, dtype, impl, batch) in (
        [(True, c) for c in REQUIRED] + [(False, c) for c in OPTIONAL]
    ):
        if (not required and results
                and __import__("time").time() - t_start > budget_s):
            results[f"skipped_{tag}_b{batch}"] = "over time budget"
            continue
        if dtype not in by_dtype:
            by_dtype[dtype] = jax.tree.map(lambda a: a.astype(dtype), params32)
        params = by_dtype[dtype]
        x = jnp.asarray(rng.rand(batch, 224, 224, 3), dtype)
        record(tag, batch, impls[impl], params, x,
               latency_too=(batch == 1))

    # OPTIONAL training-throughput row (BASELINE config #5; the reference
    # release has no train loop at all): bf16 mixed-precision full train
    # step (fwd+bwd+SGD update+BN-stat merge) at b128 — compile rides the
    # persistent cache shared with scripts/bench_train.py.
    if __import__("time").time() - t_start <= budget_s:
        import sys
        import time as _t

        print("# bench train_bf16_b128 ...", file=sys.stderr, flush=True)
        try:
            from fastdepth_tpu.config import TrainConfig
            from fastdepth_tpu.engine.benchmark import sync
            from fastdepth_tpu.train import Trainer

            trainer = Trainer(model, model.init(jax.random.PRNGKey(0)),
                              TrainConfig(lr=0.01), compute_dtype=jnp.bfloat16)
            rgb_t = jnp.asarray(rng.rand(128, 224, 224, 3), jnp.float32)
            dep_t = jnp.asarray(rng.rand(128, 224, 224, 1) * 5 + 0.5,
                                jnp.float32)
            lr = jnp.float32(0.01)
            for _ in range(3):
                trainer.state, loss = trainer._step(trainer.state, rgb_t, dep_t, lr)
            sync(loss)
            t0 = _t.time()
            calls = 20
            for _ in range(calls):
                trainer.state, loss = trainer._step(trainer.state, rgb_t, dep_t, lr)
            sync(loss)
            tfps = 128 * calls / (_t.time() - t0)
            results["train_bf16_b128_fps"] = round(tfps, 1)
            print(f"#   train_bf16_b128: {tfps:.1f} train-fps",
                  file=sys.stderr, flush=True)
        except Exception as e:  # never let the train row sink the artifact
            results["train_bf16_b128"] = f"error: {type(e).__name__}: {e}"[:120]
    else:
        results["skipped_train_bf16_b128"] = "over time budget"

    emit()


if __name__ == "__main__":
    main()
