"""Pallas TPU kernel: fused FastDepth decoder stage.

One kernel invocation fuses the whole NNConv5(dw) decoder level
(reference models.py:683-698 + the interleaved F.interpolate at
models.py:720-729, BASELINE.json north star):

    dw5x5 conv (+folded-BN bias) -> ReLU -> pw1x1 (+bias) -> ReLU
        -> nearest x2 upsample -> [+ skip]

Rationale (pallas_guide.md): the 5x5 depthwise conv has no contraction
dimension, so it is VPU work and MXU-starved; run it as 25 shifted
multiply-adds out of a VMEM-resident halo-padded copy of the activation,
feed the result straight into the pointwise matmul on the MXU, and do
the upsample broadcast + skip-add in-register — the intermediate
(H, W, C) tensors never round-trip to HBM.  Grid = batch; one batch
element's full stage fits VMEM for every FastDepth level at 224x224
(largest: stage 5, ~6 MB of operands).

BatchNorm must be pre-folded (ops.fold_bn) — kernels take conv+bias.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_PAD = 2  # (5 - 1) // 2


def _stage_kernel(x_ref, dww_ref, dwb_ref, pww_ref, pwb_ref, skip_ref,
                  out_ref, pad_ref, *, B, H, W, C, Cout, has_skip):
    # the stage math (dw5x5 -> pw1x1 -> upsample, W-shift hoisting) is
    # shared with the v3 manual-DMA kernel via _compute_stage
    up = _compute_stage(
        x_ref[:].astype(jnp.float32), pad_ref,
        dww_ref[:], dwb_ref[:], pww_ref[:], pwb_ref[:], H, W, C, Cout,
    )
    if has_skip:
        up = up + skip_ref[:].astype(jnp.float32)
    out_ref[:] = up.astype(out_ref.dtype)


def fused_decoder_stage(
    x: Array,
    dw_w: Array,     # (5, 5, 1, C) HWIO or (5, 5, C)
    dw_b: Array,     # (C,)
    pw_w: Array,     # (1, 1, C, Cout) HWIO or (C, Cout)
    pw_b: Array,     # (Cout,)
    skip: Optional[Array] = None,   # (N, 2H, 2W, Cout)
    *,
    block_batch: int = 1,
    interpret: bool = False,
) -> Array:
    """Fused dw5x5+ReLU+pw1x1+ReLU+up2x(+skip) for one decoder level.

    ``block_batch``: images per grid step.  >1 shrinks the grid and widens
    the pointwise matmul (better MXU occupancy for the small-spatial
    stages); VMEM budget caps it for the large-spatial ones.
    """
    N, H, W, C = x.shape
    if dw_w.ndim == 4:
        dw_w = dw_w.reshape(5, 5, C)
    if pw_w.ndim == 4:
        pw_w = pw_w.reshape(pw_w.shape[2], pw_w.shape[3])
    Cout = pw_w.shape[1]
    has_skip = skip is not None
    B = block_batch if N % block_batch == 0 else 1

    kernel = functools.partial(
        _stage_kernel, B=B, H=H, W=W, C=C, Cout=Cout, has_skip=has_skip,
    )

    in_specs = [
        pl.BlockSpec((B, H, W, C), lambda n: (n, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # dw_w
        pl.BlockSpec(memory_space=pltpu.VMEM),  # dw_b
        pl.BlockSpec(memory_space=pltpu.VMEM),  # pw_w
        pl.BlockSpec(memory_space=pltpu.VMEM),  # pw_b
    ]
    args = [x, dw_w, dw_b, pw_w, pw_b]
    if has_skip:
        in_specs.append(
            pl.BlockSpec((B, 2 * H, 2 * W, Cout), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(skip)
    else:
        # dummy operand keeps the kernel signature uniform
        in_specs.append(pl.BlockSpec((1, 1, 1, 1), lambda n: (0, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.zeros((1, 1, 1, 1), x.dtype))

    flops = N * (H * W * C * 25 * 2 + H * W * C * Cout * 2)
    return pl.pallas_call(
        kernel,
        grid=(N // B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, 2 * H, 2 * W, Cout), lambda n: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 2 * H, 2 * W, Cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((B, H + 2 * _PAD, W + 2 * _PAD, C), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            # input + upsampled output (+ same-sized skip read)
            bytes_accessed=x.dtype.itemsize * (
                x.size + N * 4 * H * W * Cout * (2 if has_skip else 1)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def _stage_kernel_v2(x_ref, dww_ref, dwb_ref, pww_ref, pwb_ref, skip_ref,
                     out_ref, pad_ref, *, B, H, W, C, Cout, has_skip):
    """HWBC-layout stage kernel over a (1, H, W, B, C) block.

    The 5x5 tap shifts walk the two *leading* (untiled) dims, so each
    shifted read is pure address arithmetic — the NHWC variant's +-1
    slices along the sublane dim forced a Mosaic relayout copy per tap
    (25 copies per step, ~100x off roofline).  Trailing (B, C) =
    (sublanes, lanes) stays fixed for every op.
    """
    pad_ref[:] = jnp.zeros_like(pad_ref)
    pad_ref[_PAD:H + _PAD, _PAD:W + _PAD] = x_ref[0].astype(jnp.float32)

    acc = jnp.zeros((H, W, B, C), jnp.float32)
    for dh in range(5):
        for dw in range(5):
            acc += pad_ref[dh:dh + H, dw:dw + W] * dww_ref[dh, dw, :].astype(jnp.float32)
    acc = jnp.maximum(acc + dwb_ref[:].astype(jnp.float32), 0.0)

    y = jnp.dot(
        acc.reshape(H * W * B, C), pww_ref[:].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    y = jnp.maximum(y + pwb_ref[:].astype(jnp.float32), 0.0).reshape(H, W, B, Cout)

    up = jnp.broadcast_to(y[:, None, :, None], (H, 2, W, 2, B, Cout))
    up = up.reshape(2 * H, 2 * W, B, Cout)
    if has_skip:
        up = up + skip_ref[0].astype(jnp.float32)
    out_ref[0] = up.astype(out_ref.dtype)


def fused_decoder_stage_hwbc(
    x: Array,        # NHWC (N, H, W, C)
    dw_w: Array,
    dw_b: Array,
    pw_w: Array,
    pw_b: Array,
    skip: Optional[Array] = None,   # NHWC (N, 2H, 2W, Cout)
    *,
    block_batch: int = 8,
    interpret: bool = False,
) -> Array:
    """Shift-friendly fused stage.  NHWC in/out; internally activations
    are viewed as (N/B, H, W, B, C) — Pallas TPU blocks may only
    partition leading dims, so the grid walks dim 0 and each block keeps
    its full trailing (sublane=B, lane=C) tile."""
    N, H, W, C = x.shape
    if dw_w.ndim == 4:
        dw_w = dw_w.reshape(5, 5, C)
    if pw_w.ndim == 4:
        pw_w = pw_w.reshape(pw_w.shape[2], pw_w.shape[3])
    Cout = pw_w.shape[1]
    has_skip = skip is not None
    B = block_batch if N % block_batch == 0 else (N if N < block_batch else 1)
    G = N // B

    def to5(a, h, w, c):  # (N, h, w, c) -> (G, h, w, B, c)
        return jnp.transpose(a.reshape(G, B, h, w, c), (0, 2, 3, 1, 4))

    x5 = to5(x, H, W, C)
    kernel = functools.partial(
        _stage_kernel_v2, B=B, H=H, W=W, C=C, Cout=Cout, has_skip=has_skip,
    )
    in_specs = [
        pl.BlockSpec((1, H, W, B, C), lambda n: (n, 0, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [x5, dw_w, dw_b, pw_w, pw_b]
    if has_skip:
        in_specs.append(
            pl.BlockSpec((1, 2 * H, 2 * W, B, Cout), lambda n: (n, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(to5(skip, 2 * H, 2 * W, Cout))
    else:
        in_specs.append(pl.BlockSpec((1, 1, 1, 1, 1), lambda n: (0, 0, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.zeros((1, 1, 1, 1, 1), x.dtype))

    out5 = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 2 * H, 2 * W, B, Cout),
                               lambda n: (n, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 2 * H, 2 * W, B, Cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((H + 2 * _PAD, W + 2 * _PAD, B, C), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=N * (H * W * C * 25 * 2 + H * W * C * Cout * 2),
            # input + upsampled output (+ same-sized skip read)
            bytes_accessed=x.dtype.itemsize * (
                x.size + N * 4 * H * W * Cout * (2 if has_skip else 1)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    # (G, 2H, 2W, B, Cout) -> NHWC
    return jnp.transpose(out5, (0, 3, 1, 2, 4)).reshape(N, 2 * H, 2 * W, Cout)


def _compute_stage(x_f32, pad_ref, dww, dwb, pww, pwb, H, W, C, Cout):
    """Shared stage math on a VMEM-resident (B, H, W, C) f32 block:
    dw5x5 -> ReLU -> pw1x1 -> ReLU -> nearest-x2 upsample.
    ``pad_ref`` is a (B, H+4, W+4, C) f32 halo scratch."""
    B = x_f32.shape[0]
    pad_ref[:] = jnp.zeros_like(pad_ref)
    pad_ref[:, _PAD:H + _PAD, _PAD:W + _PAD, :] = x_f32

    acc = jnp.zeros((B, H, W, C), jnp.float32)
    for dw in range(5):
        # one relayout per W-shift (sublane dim), H-shifts are free
        shifted = pad_ref[:, :, dw:dw + W, :]
        for dh in range(5):
            acc += shifted[:, dh:dh + H] * dww[dh, dw, :].astype(jnp.float32)
    acc = jnp.maximum(acc + dwb.astype(jnp.float32), 0.0)

    y = jnp.dot(acc.reshape(B * H * W, C), pww.astype(jnp.float32),
                preferred_element_type=jnp.float32)
    y = jnp.maximum(y + pwb.astype(jnp.float32), 0.0).reshape(B, H, W, Cout)

    up = jnp.broadcast_to(y[:, :, None, :, None, :], (B, H, 2, W, 2, Cout))
    return up.reshape(B, 2 * H, 2 * W, Cout)


def fused_decoder_stage_v3(
    x: Array,
    dw_w: Array,
    dw_b: Array,
    pw_w: Array,
    pw_b: Array,
    skip: Optional[Array] = None,
    *,
    block_batch: int = 1,
    interpret: bool = False,
) -> Array:
    """Fused stage with a SINGLE grid step + manual double-buffered DMA.

    Round-1 triage (docs/kernel_notes.md) measured a ~120 us fixed cost
    per *automatic-pipeline grid step* on this platform (a trivial
    out=in+in kernel paid it too), and grid shapes that would amortize it
    crashed the remote compile helper.  This variant sidesteps the
    machinery entirely: grid=(), operands stay in HBM (memory_space=ANY),
    and the kernel walks the batch in a fori_loop with its own
    two-slot in/skip/out DMA pipeline (pallas_guide.md 'Double
    Buffering') — DMA for image i+1 overlaps compute for image i, and
    nothing synchronizes per step.
    """
    N, H, W, C = x.shape
    if dw_w.ndim == 4:
        dw_w = dw_w.reshape(5, 5, C)
    if pw_w.ndim == 4:
        pw_w = pw_w.reshape(pw_w.shape[2], pw_w.shape[3])
    Cout = pw_w.shape[1]
    has_skip = skip is not None
    B = block_batch if N % block_batch == 0 else 1
    nsteps = N // B

    def kernel(x_hbm, dww_ref, dwb_ref, pww_ref, pwb_ref, skip_hbm, out_hbm,
               in_scr, skip_scr, out_scr, pad_scr,
               in_sem, skip_sem, out_sem):
        def in_dma(slot, i):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * B, B)], in_scr.at[slot], in_sem.at[slot])

        def skip_dma(slot, i):
            return pltpu.make_async_copy(
                skip_hbm.at[pl.ds(i * B, B)], skip_scr.at[slot],
                skip_sem.at[slot])

        def out_dma(slot, i):
            return pltpu.make_async_copy(
                out_scr.at[slot], out_hbm.at[pl.ds(i * B, B)],
                out_sem.at[slot])

        in_dma(0, 0).start()
        if has_skip:
            skip_dma(0, 0).start()

        def body(i, _):
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < nsteps)
            def _():
                in_dma(nxt, i + 1).start()
                if has_skip:
                    skip_dma(nxt, i + 1).start()

            in_dma(slot, i).wait()
            if has_skip:
                skip_dma(slot, i).wait()
            # out slot is reused every 2 steps: drain step i-2's store
            @pl.when(i >= 2)
            def _():
                out_dma(slot, i - 2).wait()

            up = _compute_stage(
                in_scr[slot].astype(jnp.float32), pad_scr,
                dww_ref[:], dwb_ref[:], pww_ref[:], pwb_ref[:],
                H, W, C, Cout,
            )
            if has_skip:
                up = up + skip_scr[slot].astype(jnp.float32)
            out_scr[slot] = up.astype(out_scr.dtype)
            out_dma(slot, i).start()
            return _

        jax.lax.fori_loop(0, nsteps, body, None)

        @pl.when(nsteps >= 2)
        def _():
            out_dma(jax.lax.rem(nsteps - 2, 2), nsteps - 2).wait()

        out_dma(jax.lax.rem(nsteps - 1, 2), nsteps - 1).wait()

    args = [x, dw_w, dw_b, pw_w, pw_b]
    # dummy operand keeps the kernel signature uniform when skip is absent
    args.append(skip if has_skip else jnp.zeros((1, 1, 1, Cout), x.dtype))

    flops = N * (H * W * C * 25 * 2 + H * W * C * Cout * 2)
    return pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dw_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dw_b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pw_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pw_b
            pl.BlockSpec(memory_space=pl.ANY),   # skip (or dummy)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((N, 2 * H, 2 * W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, B, H, W, C), x.dtype),                    # in
            pltpu.VMEM((2, B, 2 * H, 2 * W, Cout) if has_skip
                       else (2, 1, 1, Cout), x.dtype),               # skip
            pltpu.VMEM((2, B, 2 * H, 2 * W, Cout), x.dtype),         # out
            pltpu.VMEM((B, H + 2 * _PAD, W + 2 * _PAD, C), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            # input + upsampled output (+ same-sized skip read)
            bytes_accessed=x.dtype.itemsize * (
                x.size + N * 4 * H * W * Cout * (2 if has_skip else 1)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def fused_pointwise_head(
    x: Array,
    pw_w: Array,   # (1, 1, C, 1) or (C, 1)
    pw_b: Array,   # (1,)
    *,
    interpret: bool = False,
) -> Array:
    """Final pointwise(C -> 1)+ReLU head (reference models.py:698,731)."""
    N, H, W, C = x.shape
    if pw_w.ndim == 4:
        pw_w = pw_w.reshape(C, 1)

    def kernel(x_ref, w_ref, b_ref, out_ref):
        y = jnp.dot(
            x_ref[0].reshape(H * W, C).astype(jnp.float32),
            w_ref[:].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        y = jnp.maximum(y + b_ref[:].astype(jnp.float32), 0.0)
        out_ref[0] = y.reshape(H, W, 1).astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda n: (n, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, 1), lambda n: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W, 1), x.dtype),
        interpret=interpret,
    )(x, pw_w, pw_b)
