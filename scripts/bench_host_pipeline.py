"""Host-side train-pipeline throughput: items/s produced by the NYU
augmentation chain (h5 read -> composed rotate-gather -> ColorJitter ->
/255), WITHOUT any device work — the feeding side of the train balance
(VERDICT r3 weak #1: the chip trains at ~4.3k fps; how many host cores
does it take to keep it fed, and does the thread pool actually scale?).

Measures, per worker mode (thread / process) and worker count:
  * items/s through BatchLoader (the real production path),
plus a single-core breakdown of the per-item cost (index math, fused
native gather, jitter, /255) and the native-vs-numpy per-item delta.

Also measures the DEVICE-AUGMENT host cost (r5): with the pixel pipeline
inside the train jit (data/device_aug.py), the host keeps only the h5
read + index math + jitter-grid bake — items/s per core for both modes,
so the feed projection is measured at the new bound.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_host_pipeline.py \
       [--items 256] [--workers 1,2,4,8] [--modes thread,process] \
       [--out docs/bench_host_train_r5.json]

JAX is NOT imported (pure host measurement; also keeps the single
tenant TPU free).
"""

import argparse
import json
import os
import time

import numpy as np

def main(args):

    from fastdepth_tpu.cli.benchmark import make_synthetic_tree  # noqa: E402
    from fastdepth_tpu.data import BatchLoader, NYUDataset, native  # noqa: E402
    from fastdepth_tpu.data import transforms as T  # noqa: E402
    from fastdepth_tpu.data.pipeline import TrainSample  # noqa: E402

    root = make_synthetic_tree(args.items, "train")
    dataset = NYUDataset(os.path.join(root, "nyudepthv2", "train"), split="train")
    ncores = os.cpu_count()
    results = {"native_built": native.available(), "host_cores": ncores,
               "items": args.items, "loader": []}

    # ---- single-core per-item cost + breakdown -------------------------------
    rgb, depth = dataset.get_raw(0)
    pipe = dataset.train_pipeline
    jit = T.ColorJitter(0.4, 0.4, 0.4)


    def time_items(fn, n=64):
        fn()  # warm caches
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        return (time.perf_counter() - t0) / n


    r = np.random.RandomState(1)
    t_item = time_items(lambda: dataset[r.randint(len(dataset))])
    lib = native._LIB
    native._LIB = None
    t_item_numpy = time_items(lambda: dataset[r.randint(len(dataset))])
    native._LIB = lib

    samples = [TrainSample.draw(np.random.RandomState(i)) for i in range(8)]
    t_idx = time_items(lambda: [pipe.composed_indices(s) for s in samples]) / 8
    flat, mask = pipe.composed_indices(samples[0])
    t_gather = time_items(
        lambda: [native.train_gather(rgb, depth, flat, mask, s.scale)
                 for s in samples]) / 8
    ru8, _ = native.train_gather(rgb, depth, flat, mask, 1.2)
    t_jit = time_items(lambda: [jit(ru8, np.random.RandomState(3))
                                for _ in range(8)]) / 8
    t_norm = time_items(lambda: [native.u8_to_unit_f32(ru8) for _ in range(8)]) / 8

    results["per_item_ms"] = {
        "full_item_native": round(t_item * 1e3, 3),
        "full_item_numpy": round(t_item_numpy * 1e3, 3),
        "index_math": round(t_idx * 1e3, 3),
        "fused_gather": round(t_gather * 1e3, 3),
        "color_jitter": round(t_jit * 1e3, 3),
        "normalize": round(t_norm * 1e3, 3),
    }
    results["items_per_s_per_core"] = round(1.0 / t_item, 1)
    print(json.dumps(results["per_item_ms"]), flush=True)

    # ---- device-augment host cost (VERDICT r4 item 3) -------------------------
    # With the pixel pipeline on device (data/device_aug.py), the host's
    # per-item work is the h5 read + index math + jitter-grid bake only.
    ds_dev = NYUDataset(os.path.join(root, "nyudepthv2", "train"),
                        split="train", device_augment=True)
    t_item_dev = time_items(lambda: ds_dev[r.randint(len(ds_dev))])
    t_read = time_items(lambda: dataset.get_raw(r.randint(len(dataset))))
    t_grid = time_items(lambda: [T.blend_grid(f) for f in (0.7, 1.2, 0.93)],
                        n=32) / 3
    results["device_augment"] = {
        "per_item_ms": {
            "full_item": round(t_item_dev * 1e3, 3),
            "h5_read": round(t_read * 1e3, 3),
            "index_math": results["per_item_ms"]["index_math"],
            "jitter_grid_bake_x3": round(3 * t_grid * 1e3, 3),
        },
        "items_per_s_per_core": round(1.0 / t_item_dev, 1),
        "host_speedup_vs_full_chain": round(t_item / t_item_dev, 2),
        "note": ("pixel work (gather, pad, depth/=s, enhance, /255) moved "
                 "into the train jit; host ships raw frames + i32 gather "
                 "map + 3x(256,256) u8 grids per item"),
    }
    print(json.dumps(results["device_augment"]), flush=True)

    # ---- loader throughput by mode x workers ----------------------------------
    for mode in args.modes.split(","):
        for nw in (int(w) for w in args.workers.split(",")):
            for dev_aug, ds in (("host", dataset), ("device", ds_dev)):
                loader = BatchLoader(ds, batch_size=args.batch_size,
                                     shuffle=True, num_workers=nw,
                                     drop_last=True, pad_last=False,
                                     worker_mode=mode)
                n = 0
                # one throwaway batch spins up the pool (spawn is lazy)
                it = iter(loader)
                next(it)
                t0 = time.perf_counter()
                for item in it:
                    n += item[-1]
                dt = time.perf_counter() - t0
                row = {"mode": mode, "workers": nw, "augment": dev_aug,
                       "items_per_s": round(n / dt, 1), "items": n,
                       "elapsed_s": round(dt, 2)}
                results["loader"].append(row)
                print(json.dumps(row), flush=True)

    # cores needed to feed the measured device train rate (docs/bench_train_*)
    DEVICE_TRAIN_FPS = 4348.0
    best = max(results["loader"], key=lambda r: r["items_per_s"])
    results["feed_projection"] = {
        "device_train_fps": DEVICE_TRAIN_FPS,
        "best_measured": best,
        # ARITHMETIC from the 1-core per-item measurement, not a
        # multi-core measurement (this sandbox exposes one core); the
        # device-augment row shrinks the HOST bound, but the chip-side
        # cost of absorbing the augmentation was measured prohibitive
        # on this platform (docs/bench_train_device_aug_r5.json,
        # kernel_notes r5) — host augmentation stays the default
        "cores_at_linear_scaling_host_chain": round(
            DEVICE_TRAIN_FPS / results["items_per_s_per_core"], 1),
        "cores_at_linear_scaling_device_augment": round(
            DEVICE_TRAIN_FPS
            / results["device_augment"]["items_per_s_per_core"], 1),
        "note": (f"this host exposes {ncores} core(s); multi-worker rows "
                 "measure overhead, not scaling, when cores == 1; the "
                 "cores_at_linear_scaling_* values are division, not "
                 "measurement"),
    }
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    print(json.dumps(results["feed_projection"]))


if __name__ == "__main__":  # spawn workers re-import this module: keep
    # argv parsing and all work behind the guard
    p = argparse.ArgumentParser()
    p.add_argument("--items", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--workers", default="1,2,4,8")
    p.add_argument("--modes", default="thread,process")
    p.add_argument("--out", default="/tmp/bench_host_pipeline.json")
    main(p.parse_args())
