"""Batched, mesh-aware evaluation engine.

Reproduces ``validate()`` semantics (reference main.py:63-126): per-image
metrics averaged with AverageMeter, progress prints every ``print_freq``
images, a comparison PNG built from every 50th of the first 400 images,
and the final report/CSV — but TPU-native:

* model + metrics run in ONE jitted NHWC batch step; only 10 metric
  scalars per image leave the device (the reference syncs full preds per
  item, main.py:80-82),
* batches are padded to a static shape and sharded over a data-parallel
  mesh; the pad tail is masked out of the metric sums on device,
* timing via ``block_until_ready`` (the reference's CUDA timing is
  async-skewed, SURVEY.md §5 'Tracing').
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fastdepth_tpu import metrics as M
from fastdepth_tpu import viz
from fastdepth_tpu.models.registry import Model
from fastdepth_tpu.parallel import mesh as mesh_lib

CSV_FIELDNAMES = [
    "rmse", "mae", "delta1", "absrel", "lg10", "mse", "delta2", "delta3",
    "data_time", "gpu_time",
]  # reference main.py:20-21


class Evaluator:
    def __init__(
        self,
        model: Model,
        params,
        *,
        batch_size: int = 1,
        dtype=jnp.float32,
        mesh=None,
        fold_bn: bool = True,
        impl: str = "auto",
        tuning=None,
        val_pipeline=None,
    ):
        """``impl``: 'auto' picks the head-commute fast path
        (models/fused.apply_fastdepth_opt — bit-exact, measured +9% on
        v5e) whenever the architecture supports it and BN is folded;
        'xla' forces the straight forward; 'opt' forces the fast path;
        'mixed' runs each decoder stage on its autotuned winner from a
        ``tuning`` record path / winner map (engine/autotune.py).

        ``val_pipeline``: a ``data.pipeline.ValPipeline`` — the whole val
        resize/crop chain is one (rows, cols) gather, so with raw
        (480, 640) batches (``NYUDataset(raw_items=True)``) it runs ON
        DEVICE inside the jitted step, identical values to the host
        gather; host preprocessing drops to the h5 read."""
        self.model = model
        self.batch_size = batch_size
        self.dtype = dtype
        self.mesh = mesh
        if fold_bn:
            params = model.fold(params)
        if dtype != jnp.float32:
            params = jax.tree.map(
                lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
                params,
            )
        if mesh is not None:
            params = mesh_lib.put_replicated(params, mesh)
        self.params = params

        from fastdepth_tpu.engine.aot import _pick_apply

        # one policy source with the AOT/serving paths (impl='opt'
        # folded-params check, b1-stays-straight rule; aot.py:21-41)
        apply_fn = _pick_apply(model, params, impl, batch_size, tuning)

        gather = None
        want_raw = None
        if val_pipeline is not None:
            gather = (jnp.asarray(val_pipeline.rows), jnp.asarray(val_pipeline.cols))
            # the EXACT raw dims the gather indices were computed for:
            # under jit, out-of-range indices CLAMP instead of raising,
            # so a smaller (preprocessed) frame would silently produce
            # garbage; a LARGER frame passes any max-index bound yet
            # gathers with the wrong resize ratio — also silently wrong.
            # ValPipeline.create records raw_size; fall back to the
            # max-index bound for hand-built pipelines without it.
            want_raw = getattr(val_pipeline, "raw_size", None) or (
                int(np.max(val_pipeline.rows)) + 1,
                int(np.max(val_pipeline.cols)) + 1)
            exact = getattr(val_pipeline, "raw_size", None) is not None

        def step(params, rgb, depth):
            if gather is not None:
                # BOTH tensors are gathered below; a preprocessed depth
                # next to a raw rgb would clamp-gather silently otherwise
                for name, t in (("rgb", rgb), ("depth", depth)):
                    bad = (tuple(t.shape[1:3]) != tuple(want_raw) if exact
                           else (t.shape[1] < want_raw[0]
                                 or t.shape[2] < want_raw[1]))
                    if bad:
                        raise ValueError(
                            f"val_pipeline gather was built for "
                            f"{'exactly ' if exact else 'at least '}"
                            f"{want_raw[0]}x{want_raw[1]} raw frames, "
                            f"got {t.shape[1]}x{t.shape[2]} for {name} "
                            f"— use NYUDataset(raw_items=True) with "
                            f"matching frames, build the pipeline with "
                            f"raw_size=({t.shape[1]}, {t.shape[2]}), or "
                            f"drop val_pipeline for preprocessed items")
                rows, cols = gather
                rgb = rgb[:, rows][:, :, cols]
                depth = depth[:, rows][:, :, cols]
            if rgb.dtype == jnp.uint8:
                # device-side /255 (identical math to the host path;
                # uint8 transfer is 4x smaller)
                rgb = rgb.astype(dtype) / 255.0
            else:
                rgb = rgb.astype(dtype)
            pred = apply_fn(params, rgb)
            pred = pred.astype(jnp.float32)
            metrics = M.evaluate_batch(pred, depth)
            # ONE stacked (num_fields, N) array: a single device->host
            # fetch instead of 10 round trips (matters on high-latency
            # transports)
            stacked = jnp.stack([metrics[f] for f in M.METRIC_FIELDS])
            return pred, stacked

        if mesh is not None:
            from jax.sharding import NamedSharding

            # policy-driven: batch over 'data', image height over 'space'
            # (spatial partitioning — XLA inserts the conv halo
            # exchanges); metric sums close over 'space' automatically
            data = mesh_lib.shard_activations(mesh)
            repl = mesh_lib.replicate(mesh)
            metrics_sh = NamedSharding(mesh, mesh_lib.metrics_spec(mesh))
            self._step = jax.jit(
                step,
                in_shardings=(repl, data, data),
                out_shardings=(data, metrics_sh),
            )
        else:
            self._step = jax.jit(step)

    def put(self, arr):
        if self.mesh is not None:
            return mesh_lib.put_sharded(arr, self.mesh)
        return jax.device_put(arr)

    def __call__(self, rgb, depth):
        return self._step(self.params, rgb, depth)


def validate(
    loader,
    evaluator: Evaluator,
    *,
    epoch: int = 0,
    print_freq: int = 50,
    output_dir: Optional[str] = None,
    write_to_file: bool = False,
    csv_path: Optional[str] = None,
    make_images: bool = True,
    viz_transform=None,
    log=print,
) -> M.Result:
    """Full-dataset evaluation with reference-format reporting
    (main.py:63-126).  ``viz_transform``: applied to the raw rgb/depth of
    the few comparison-strip images when the loader yields RAW frames
    (device-preprocess mode) — pass the host ValPipeline gather."""
    meter = M.AverageMeter()
    img_merge = None
    img_saved = False
    seen = 0

    def submitted():
        """Enqueue each batch's device work (JAX dispatch is async) and
        yield the in-flight futures.  data_time = this thread's real
        blocking wait on the loader (under the one-ahead pipeline that
        wait overlaps the previous batch's sync — measuring it directly
        is the only attribution that stays honest there)."""
        first = True
        it = iter(loader)
        while True:
            t_wait = time.time()
            item = next(it, None)
            if item is None:
                return
            data_time = time.time() - t_wait
            rgb, depth, count = item
            rgb_d = evaluator.put(rgb)
            depth_d = evaluator.put(depth)
            if first:
                # compile outside the timed region: the first call pays
                # jit trace+compile (minutes on this platform's cold
                # cache), which would poison avg.gpu_time by orders of
                # magnitude; one duplicated batch of real compute is the
                # cheap price of honest timing.  fetch_global, not
                # np.asarray: on a multi-process mesh the metrics array
                # spans non-addressable devices (same as the main fetch)
                mesh_lib.fetch_global(evaluator(rgb_d, depth_d)[1])
                first = False
            t0 = time.time()
            pred, batch_metrics = evaluator(rgb_d, depth_d)
            yield rgb, depth, count, pred, batch_metrics, t0, data_time

    def one_ahead(gen):
        """Keep one batch in flight: batch k+1's transfer+compute is
        enqueued before batch k is synced, so the device never idles on
        host-side metric handling (streaming inference, BASELINE.json
        config #4)."""
        prev = next(gen, None)
        while prev is not None:
            nxt = next(gen, None)
            yield prev
            prev = nxt

    for rgb, depth, count, pred, batch_metrics, t0, data_time in one_ahead(submitted()):
        # host materialization doubles as the device sync: on some PJRT
        # transports block_until_ready returns early (engine/benchmark.py).
        # fetch_global == np.asarray single-process; on a multi-process
        # mesh it all-gathers the cross-host shards (parallel/mesh.py)
        stacked = mesh_lib.fetch_global(batch_metrics)  # (num_fields, N)
        valid = {f: stacked[i, :count] for i, f in enumerate(M.METRIC_FIELDS)}
        gpu_time = time.time() - t0
        meter.update_batch(valid, gpu_time=gpu_time / count, data_time=data_time / count)

        # comparison strip: every 50th of the first 8*50 images
        # (main.py:85-98)
        if make_images and output_dir is not None:
            # fetch the pred batch ONCE and only when a strip row is due:
            # pred is device-sharded, and np.asarray on a per-image slice
            # crashes on a multi-process mesh (non-addressable shards)
            pred_np = None
            if any((seen + i) % 50 == 0 and (seen + i) < 8 * 50
                   for i in range(count)):
                pred_np = mesh_lib.fetch_global(pred)
            for i in range(count):
                gi = seen + i
                if gi % 50 == 0 and gi < 8 * 50:
                    r_i, d_i = np.asarray(rgb[i]), np.asarray(depth[i])
                    if viz_transform is not None:
                        r_i, d_i = viz_transform(r_i), viz_transform(d_i)
                    row = viz.merge_into_row(r_i, d_i, pred_np[i])
                    img_merge = row if img_merge is None else viz.add_row(img_merge, row)
                elif gi == 8 * 50 and img_merge is not None and not img_saved:
                    viz.save_image(img_merge, os.path.join(output_dir, f"comparison_{epoch}.png"))
                    img_saved = True
        seen += count

        # print every `print_freq` images (reference main.py:100-108)
        if print_freq and (seen % print_freq) < count:
            avg = meter.average()
            last = {k: float(v[-1]) for k, v in valid.items()}
            log(
                f"Test: [{seen}/{len(loader.dataset)}]\t"
                # per-image in both positions, like the reference's b1 log
                f"t_GPU={gpu_time / count:.3f}({avg.gpu_time:.3f})\n\t"
                f"RMSE={last['rmse']:.2f}({avg.rmse:.2f}) "
                f"MAE={last['mae']:.2f}({avg.mae:.2f}) "
                f"Delta1={last['delta1']:.3f}({avg.delta1:.3f}) "
                f"REL={last['absrel']:.3f}({avg.absrel:.3f}) "
                f"Lg10={last['lg10']:.3f}({avg.lg10:.3f}) "
            )
    if seen == 0:
        raise ValueError(
            "validate(): the loader yielded no batches (empty split or "
            "dataset) — nothing to average")
    if make_images and output_dir is not None and img_merge is not None \
            and not img_saved:
        # datasets shorter than the reference's 8*50-image window would
        # otherwise build the strip and silently never write it
        viz.save_image(img_merge, os.path.join(output_dir, f"comparison_{epoch}.png"))
    avg = meter.average()
    log(
        "\n*\n"
        f"RMSE={avg.rmse:.3f}\n"
        f"MAE={avg.mae:.3f}\n"
        f"Delta1={avg.delta1:.3f}\n"
        f"REL={avg.absrel:.3f}\n"
        f"Lg10={avg.lg10:.3f}\n"
        f"t_GPU={avg.gpu_time:.3f}\n"
    )
    if write_to_file and csv_path:
        new = not os.path.exists(csv_path)
        with open(csv_path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=CSV_FIELDNAMES)
            if new:
                w.writeheader()
            w.writerow({
                "mse": avg.mse, "rmse": avg.rmse, "absrel": avg.absrel,
                "lg10": avg.lg10, "mae": avg.mae, "delta1": avg.delta1,
                "delta2": avg.delta2, "delta3": avg.delta3,
                "data_time": avg.data_time, "gpu_time": avg.gpu_time,
            })
    return avg
