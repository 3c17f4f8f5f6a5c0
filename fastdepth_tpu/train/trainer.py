"""Training: SGD+momentum+weight-decay, BN batch stats, data parallelism.

The reference release has no train loop (main.py implements only
--evaluate, main.py:45-60); this subsystem rebuilds the FastDepth
training recipe (BASELINE.json config #5): masked L1 loss, SGD with
momentum from the converted pretrained MobileNet, step LR decay, and the
{epoch, best_result, model} checkpoint cycle with best-epoch tracking
(reference main.py:20-24).

TPU design: the whole step — forward (train-mode BN), backward, optimizer
update, BN running-stat merge — is ONE jitted function.  Data parallelism
comes from batch-dim input shardings on a 1-D mesh: XLA inserts the psum
for gradients automatically from the sharding propagation; nothing in the
step function mentions devices.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from fastdepth_tpu.config import TrainConfig
from fastdepth_tpu.models import layers as L
from fastdepth_tpu.models.registry import Model
from fastdepth_tpu.train.loss import masked_l1_loss

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    momentum: Any
    step: Array


def sgd_init(params) -> TrainState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return TrainState(params=params, momentum=zeros, step=jnp.zeros((), jnp.int32))


def _is_decayed(path: Tuple) -> bool:
    """Weight decay covers every TRAINABLE parameter — conv/fc weights
    AND biases AND BatchNorm scale/bias — because the reference-era
    recipe is ``torch.optim.SGD(model.parameters(), weight_decay=wd)``,
    which decays all parameters.  BN running mean/var are torch BUFFERS,
    not parameters: never decayed (they are overwritten by the stats
    merge each train step anyway, and decaying them on eval-only BNs
    would corrupt inference statistics)."""
    leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    parent = path[-2].key if len(path) > 1 and hasattr(path[-2], "key") else ""
    if parent == "bn":
        return leaf in ("scale", "bias")
    return leaf in ("w", "b")


def _cast_compute(params, dtype):
    """Cast conv/fc weights and biases to the compute dtype, leaving every
    ``bn`` subtree in fp32 — BatchNorm statistics, scale and bias stay in
    master precision (batch_norm_train computes its moments in fp32 and
    the running-stat merge must not quantize the master copies)."""

    def rec(node):
        if isinstance(node, dict):
            return {k: (v if k == "bn" else rec(v)) for k, v in node.items()}
        if jnp.issubdtype(node.dtype, jnp.floating):
            return node.astype(dtype)
        return node

    return rec(params)


def _guard_unsharded(rgb) -> None:
    """Refuse a multi-device-sharded batch on an accum_steps>1 step built
    without a mesh: the microbatch reshape must be pinned to the data
    axis, or the partitioner may re-shard it spatially and silently
    diverge dw-conv grads (docs/probe_r3_sp_grad.json).  Only concrete
    arrays carry a sharding — jit tracers pass through unchecked, so
    call this on the HOST side of a jit boundary."""
    try:
        devs = getattr(rgb.sharding, "device_set", ())
    except Exception:
        devs = ()
    if len(devs) > 1:
        raise ValueError(
            "accum_steps > 1 with a batch sharded over "
            f"{len(devs)} devices requires make_train_step(mesh=...): "
            "the microbatch reshape must be pinned to the data axis "
            "(spatial re-sharding diverges dw-conv grads, "
            "docs/probe_r3_sp_grad.json)")


def make_train_step(
    model: Model,
    cfg: TrainConfig,
    loss_fn: Callable[[Array, Array], Array] = masked_l1_loss,
    *,
    remat: bool = False,
    skip_nonfinite: bool = True,
    compute_dtype=None,
    accum_steps: int = 1,
    mesh=None,
    device_augment: bool = False,
):
    """Returns step(state, rgb, depth, lr) -> (state, loss); with
    ``device_augment`` the signature becomes step(state, rgb_raw,
    depth_raw, flat, scale, tables, kinds, lr) and the whole train-item
    pixel pipeline (gather/pad/depth-scale/jitter//255 —
    data/device_aug.py) runs first, inside this same jit.

    ``remat``: rematerialize the forward during backprop
    (``jax.checkpoint``) — trades FLOPs for activation memory, the lever
    for large batches/resolutions on HBM-bound chips.
    ``accum_steps``: gradient accumulation.  The batch is split into
    ``accum_steps`` equal microbatches, scanned sequentially
    (``lax.scan`` — one microbatch's activations live at a time, the
    *other* large-batch memory lever, composable with ``remat``), and
    ONE optimizer update applies the mean of the microbatch gradients.
    BatchNorm semantics match k sequential torch forwards: train-mode BN
    normalizes by each MICROBATCH's moments (so the gradient is not
    bit-equal to an unaccumulated batch — the standard grad-accum
    contract) and running stats merge sequentially microbatch after
    microbatch.  The mean loss over microbatches equals the full-batch
    masked-L1 only when mask counts per microbatch are equal; the
    returned loss is the microbatch mean either way.
    ``mesh``: REQUIRED when accumulating over a data-parallel mesh.  The
    (B, ...) -> (accum, B/accum, ...) reshape of a batch-sharded tensor
    otherwise leaves the SPMD partitioner free to re-shard along any
    dim — including H, the regime where this platform's dw-conv
    gradients are measurably wrong (docs/probe_r3_sp_grad.json; the f64
    harness reproduced 1e-2-level divergence through exactly this
    reshape).  With ``mesh`` the microbatch tensors are pinned to
    P(None, 'data') — every device scans its own local rows, pure DP —
    which requires the MICROBATCH size to divide by the data-axis size.
    ``skip_nonfinite``: if the loss or any gradient is NaN/Inf (bad batch,
    overflow), the whole update is skipped — the failure-isolation story
    for long unattended runs (the reference has no failure handling,
    SURVEY.md §5).
    ``compute_dtype``: mixed-precision training.  ``jnp.bfloat16`` runs
    the forward and backward conv work in bf16 (MXU-native) while the
    master weights, momentum buffers, optimizer math, BatchNorm moments
    and running stats all stay fp32.  bf16 shares fp32's exponent range,
    so no loss scaling is needed (unlike fp16 on GPUs).  The cast sits
    inside the (possibly rematerialized) forward so recomputation under
    ``remat`` also happens in bf16.
    """

    def _forward(params, rgb):
        if compute_dtype is not None:
            params = _cast_compute(params, compute_dtype)
            rgb = rgb.astype(compute_dtype)
        stats: Dict = {}
        pred = model.apply(params, rgb, train=True, stats=stats)
        # stats leaves must flow OUT of the (possibly rematerialized)
        # trace as outputs, not escape via closure
        return pred, stats

    fwd = jax.checkpoint(_forward) if remat else _forward

    def loss_and_stats(params, rgb, depth):
        pred, stats = fwd(params, rgb)
        # the loss itself is always fp32: depth targets are fp32 and the
        # masked reduction must not accumulate in bf16
        return loss_fn(pred.astype(jnp.float32), depth), stats

    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")
    grad_fn = jax.value_and_grad(loss_and_stats, has_aux=True)

    def step(state: TrainState, rgb: Array, depth: Array, lr: Array):
        if accum_steps == 1:
            (loss, stats), grads = grad_fn(state.params, rgb, depth)
        else:
            n = rgb.shape[0]
            if n % accum_steps:
                raise ValueError(
                    f"batch size {n} is not divisible by "
                    f"accum_steps={accum_steps}: microbatches must be "
                    f"equal-sized (unequal BN moments and loss weights "
                    f"would silently skew the accumulated gradient)")
            mb = n // accum_steps
            if mesh is None:
                # mesh=None with a multi-device-sharded batch: without
                # the pin below, the partitioner may re-shard the
                # microbatch reshape spatially, silently reproducing the
                # documented dw-conv grad divergence
                # (docs/probe_r3_sp_grad.json).  Shardings are only
                # visible on CONCRETE arrays, so this check fires only
                # when the step runs un-jitted (a jit tracer has no
                # .sharding); Trainer guards its jitted mesh=None path
                # host-side with the same check (_guard_unsharded).
                _guard_unsharded(rgb)
            rgb_m = rgb.reshape(accum_steps, mb, *rgb.shape[1:])
            depth_m = depth.reshape(accum_steps, mb, *depth.shape[1:])
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from fastdepth_tpu.parallel.mesh import DATA_AXIS

                d = mesh.shape[DATA_AXIS]
                if mb % d:
                    raise ValueError(
                        f"microbatch size {mb} (batch {n} / accum_steps "
                        f"{accum_steps}) must divide by the data-axis "
                        f"size {d}: each device scans its own rows")
                ms = NamedSharding(mesh, P(None, DATA_AXIS))
                rgb_m = jax.lax.with_sharding_constraint(rgb_m, ms)
                depth_m = jax.lax.with_sharding_constraint(depth_m, ms)

            def body(carry, xs):
                params_c, gsum, lsum = carry
                r, d = xs
                (loss_i, stats_i), grads_i = grad_fn(params_c, r, d)
                # thread the merged running stats into the next
                # microbatch's forward: exactly k sequential train-mode
                # forwards (running stats never enter train-mode
                # normalization, so this cannot change any gradient)
                params_c = L.merge_stats(params_c, stats_i)
                gsum = jax.tree.map(jnp.add, gsum, grads_i)
                return (params_c, gsum, lsum + loss_i), stats_i

            gzero = jax.tree.map(jnp.zeros_like, state.params)
            # loss dtype = promote(fp32 pred cast, target dtype) — f64
            # under x64 (mesh_equiv_f64.py), f32 otherwise; the scan
            # carry init must match or the carry types diverge
            loss_dt = jnp.promote_types(jnp.float32, depth.dtype)
            (_, gsum, lsum), stats_seq = jax.lax.scan(
                body,
                (state.params, gzero, jnp.zeros((), loss_dt)),
                (rgb_m, depth_m),
            )
            grads = jax.tree.map(lambda g: g / accum_steps, gsum)
            loss = lsum / accum_steps
            # the LAST microbatch's stats entries already fold in every
            # earlier merge (each new_bn is computed from the carried,
            # previously-merged running stats) — they ARE the final
            # sequential running stats
            stats = jax.tree.map(lambda s: s[-1], stats_seq)
        if skip_nonfinite:
            finite = jnp.isfinite(loss)
            for g in jax.tree.leaves(grads):
                finite = finite & jnp.all(jnp.isfinite(g))
            lr = jnp.where(finite, lr, 0.0)
            # BN running stats from a non-finite forward must not be
            # merged — replace each stats leaf with its current value
            # so the skipped step leaves params bit-identical.
            def _current(path_tuple):
                node = state.params
                for k in path_tuple:
                    node = node[k]
                return node

            stats = {
                pt: {
                    k: jnp.where(finite, v, _current(pt)[k])
                    for k, v in entry.items()
                }
                for pt, entry in stats.items()
            }
        else:
            finite = jnp.ones((), jnp.bool_)

        def update(path, p, g, m):
            # weight decay BEFORE the finite gate: on a skipped step the
            # effective grad (incl. decay) must be exactly zero so the
            # momentum buffer doesn't absorb wd*p.
            if cfg.weight_decay and _is_decayed(path):
                g = g + cfg.weight_decay * p
            if skip_nonfinite:
                g = jnp.where(finite, g, jnp.zeros_like(g))
                m_new = jnp.where(finite, cfg.momentum * m + g, m)
            else:
                m_new = cfg.momentum * m + g
            return p - lr * m_new, m_new

        flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
        treedef = jax.tree.structure(state.params)
        g_leaves = jax.tree.leaves(grads)
        m_leaves = jax.tree.leaves(state.momentum)
        new_p, new_m = [], []
        for (path, p), g, m in zip(flat, g_leaves, m_leaves):
            pn, mn = update(path, p, g, m)
            new_p.append(pn)
            new_m.append(mn)
        params = jax.tree.unflatten(treedef, new_p)
        momentum = jax.tree.unflatten(treedef, new_m)
        # merge fresh BN running stats (stop-gradient state, not optimized)
        params = L.merge_stats(params, stats)
        return TrainState(params=params, momentum=momentum, step=state.step + 1), loss

    if not device_augment:
        return step

    from fastdepth_tpu.data.device_aug import apply_train_augment

    out_size = tuple(model.config.output_size)

    def aug_step(state, rgb_raw, depth_raw, flat, scale, tables, kinds, lr):
        rgb, depth = apply_train_augment(
            rgb_raw, depth_raw, flat, scale, tables, kinds,
            out_size=out_size)
        return step(state, rgb, depth, lr)

    return aug_step


def train_step(model: Model, cfg: TrainConfig):
    """Back-compat alias returning the raw step function."""
    return make_train_step(model, cfg)


def step_lr(cfg: TrainConfig, epoch: int) -> float:
    """Step decay: lr * gamma^(epoch // step) (FastDepth recipe).  A
    non-positive ``lr_decay_step`` means "no decay"."""
    if cfg.lr_decay_step <= 0:
        return cfg.lr
    return cfg.lr * (cfg.lr_decay_gamma ** (epoch // cfg.lr_decay_step))


class Trainer:
    """Full training loop driver with mesh data-parallelism and the
    reference's best-result checkpoint cycle."""

    def __init__(
        self,
        model: Model,
        params,
        cfg: TrainConfig,
        mesh=None,
        loss_fn: Callable = masked_l1_loss,
        remat: bool = False,
        compute_dtype=None,
        accum_steps: int = 1,
        device_augment: bool = False,
    ):
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.device_augment = device_augment
        self.state = sgd_init(params)
        step = make_train_step(model, cfg, loss_fn, remat=remat,
                               compute_dtype=compute_dtype,
                               accum_steps=accum_steps, mesh=mesh,
                               device_augment=device_augment)
        # data-arg count: (rgb, depth) or the 6 device-augment arrays
        n_data = 6 if device_augment else 2
        if mesh is not None:
            from fastdepth_tpu.parallel.mesh import (
                SPACE_AXIS,
                replicate,
                shard_activations,
            )

            if SPACE_AXIS in mesh.axis_names:
                # grad-of-dw-conv is WRONG under SPMD spatial partitioning
                # at degenerate extents, and the trigger depends on
                # partitioner strategy choices (measured in f64:
                # docs/probe_r3_sp_grad.json, up to 2.2 abs divergence).
                # 'space' is an inference/eval axis; training scales over
                # the batch.
                raise ValueError(
                    "training does not support a 'space' mesh axis: "
                    "depthwise-conv weight gradients diverge under SPMD "
                    "spatial partitioning (docs/probe_r3_sp_grad.json). "
                    "Use a 1-D 'data' mesh for training; 'space' is for "
                    "inference/eval (Evaluator, serving).")
            repl = replicate(mesh)
            data = shard_activations(mesh)
            if device_augment:
                # batch-only spec: the device-augment extras include
                # rank-1 (B,) arrays that the rank-2+ activation spec
                # would over-rank; the train mesh is 1-D 'data' anyway
                # (space is rejected above), so the placements coincide
                from fastdepth_tpu.parallel.mesh import shard_batch

                data = shard_batch(mesh)
            state_sh = jax.tree.map(lambda _: repl, self.state,
                                    is_leaf=lambda x: isinstance(x, jax.Array))
            self._step = jax.jit(
                step,
                in_shardings=(state_sh,) + (data,) * n_data + (None,),
                out_shardings=(state_sh, repl),
                donate_argnums=(0,),
            )
            # put_replicated (not bare device_put): in multi-process mode
            # the replicated state must assemble from per-process copies
            # (parallel/mesh.py; every host inits/loads identical state)
            from fastdepth_tpu.parallel.mesh import put_replicated

            self.state = put_replicated(self.state, mesh)
        else:
            jitted = jax.jit(step, donate_argnums=(0,))
            if accum_steps > 1:
                # the in-step sharded-batch guard cannot fire through a
                # jit tracer (no .sharding on tracers) — check the
                # concrete batch on the host side of the jit boundary
                def guarded(state, *args):
                    _guard_unsharded(args[0])
                    return jitted(state, *args)

                self._step = guarded
            else:
                self._step = jitted

    def restore(self, tree) -> None:
        """Resume from a saved training state
        (``checkpoint.io.load_train_checkpoint`` tree): replaces params,
        momentum buffers, and the step counter, re-placed under the
        trainer's mesh sharding."""
        from fastdepth_tpu.checkpoint.io import numpy_to_jax

        state = TrainState(
            params=numpy_to_jax(tree["params"]),
            momentum=numpy_to_jax(tree["momentum"]),
            step=jnp.asarray(tree["step"], jnp.int32),
        )
        if self.mesh is not None:
            from fastdepth_tpu.parallel.mesh import put_replicated

            state = put_replicated(state, self.mesh)
        self.state = state

    def run_epoch(self, loader, epoch: int, log=print, print_freq: int = 50):
        import jax

        from fastdepth_tpu.parallel.mesh import fetch_global

        lr = step_lr(self.cfg, epoch)
        # accumulate the loss ON DEVICE — a float(loss) each step would
        # serialize host and device and bound mesh scaling; the scalar is
        # fetched only at print_freq boundaries and at epoch end
        # (fetch_global, not float(): on a multi-process mesh the loss
        # spans non-addressable devices)
        total = None
        n = 0
        # under multi-process SPMD each process feeds its shard of the
        # global batch: the loader's `count` is GLOBAL, local rows are
        # count / process_count
        n_proc = jax.process_count()
        for i, item in enumerate(loader):
            *arrays, count = item  # (rgb, depth) or the 6 device-augment arrays
            if count != arrays[0].shape[0] * n_proc:
                raise ValueError(
                    f"run_epoch got a padded batch ({count} real rows in a "
                    f"global batch of {arrays[0].shape[0] * n_proc}): the "
                    f"zero rows would enter the BN batch statistics and "
                    f"couple real-row gradients to padding. Build the "
                    f"train loader with drop_last=True, pad_last=False "
                    f"(cli.train does).")
            if self.mesh is not None:
                from fastdepth_tpu.parallel.mesh import DATA_AXIS, put_sharded

                # batch-axis placement for every array (the train mesh is
                # 1-D 'data'; rank-1 extras need the batch-only spec)
                arrays = [put_sharded(a, self.mesh, axis_name=DATA_AXIS)
                          for a in arrays]
            self.state, loss = self._step(
                self.state, *[jnp.asarray(a) for a in arrays], lr)
            total = loss if total is None else total + loss
            n += 1
            if print_freq and (i + 1) % print_freq == 0:
                log(f"Epoch {epoch} [{i + 1}/{len(loader)}] "
                    f"loss={float(fetch_global(total)) / n:.4f} lr={lr:.4g}")
        return float(fetch_global(total)) / n if n else 0.0
