"""FastDepth forward with the Pallas-fused decoder.

Inference fast path: encoder runs through XLA's conv stack (MXU-friendly
already); each decoder level — the part XLA leaves as separate dw-conv /
pw-conv / broadcast / add HLOs — runs as ONE Pallas kernel
(ops/pallas/fused_decoder.py).  Requires BN-folded params
(Model.fold / layers.tree_fold).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from fastdepth_tpu.config import ModelConfig
from fastdepth_tpu.models import mobilenet as MN
from fastdepth_tpu.ops.pallas.fused_decoder import fused_decoder_stage

Array = jax.Array

_SKIP_TAPS = (1, 3, 5)

def _fused_preamble(params, x, cfg):
    """Shared guard + encoder pass for the fused nnconv5dw-skip-add
    forwards: returns (decoder_params, features, {stage: skip_tensor})."""
    if (cfg.encoder != "mobilenet" or cfg.skip != "add"
            or not cfg.decoder_depthwise or cfg.decoder_kernel != 5):
        raise ValueError(
            "fused path supports the MobileNet nnconv5dw skip-add family; "
            f"got encoder={cfg.encoder!r} decoder={cfg.decoder!r} "
            f"skip={cfg.skip!r}"
        )
    feats, tapped = MN.apply_encoder(
        params["encoder"], x, relu6=cfg.encoder_relu6, taps=_SKIP_TAPS,
    )
    return params["decoder"], feats, {2: tapped[5], 3: tapped[3], 4: tapped[1]}


def apply_fastdepth_fused(
    params: Dict,
    x: Array,
    cfg: ModelConfig,
    *,
    interpret: bool = False,
) -> Array:
    """Fused-decoder forward for skip='add' (the flagship).  Params must
    be folded ({'w','b'} leaves).  Matches apply_fastdepth numerics
    (tested per-pixel in tests/test_pallas.py)."""
    dec, y, skips = _fused_preamble(params, x, cfg)
    for i in range(1, 6):
        p = dec[f"decode_conv{i}"]
        y = fused_decoder_stage(
            y,
            p["dw"]["w"], p["dw"]["b"],
            p["pw"]["w"], p["pw"]["b"],
            skip=skips.get(i),
            interpret=interpret,
        )
    # the 1x1 head runs through XLA: a (H*W, 16) x (16, 1) matmul with a
    # single-lane output is pathological for Mosaic (this sandbox's
    # compile helper crashes on it at grid >= 8) and XLA fuses it anyway
    from fastdepth_tpu.ops import blocks as B

    head = dec["decode_conv6"]["pw"]
    return B.relu(B.conv2d(y, head["w"], bias=head["b"]))


def apply_fastdepth_fused_v2(
    params: Dict,
    x: Array,
    cfg: ModelConfig,
    *,
    interpret: bool = False,
) -> Array:
    """Fused decoder in HWBC layout — the shift-friendly kernel variant.

    The encoder runs in NHWC through XLA; activations transpose once to
    (H, W, B, C) at the decoder boundary, every decoder level runs as one
    HWBC Pallas kernel (tap shifts on untiled leading dims — no Mosaic
    relayouts), and the result transposes back for the XLA 1x1 head.
    Per-stage images-per-grid-step sized to VMEM.
    """
    import jax.numpy as jnp

    from fastdepth_tpu.ops import blocks as B
    from fastdepth_tpu.ops.pallas.fused_decoder import fused_decoder_stage_hwbc

    dec, y, skips = _fused_preamble(params, x, cfg)
    block_batches = {1: 8, 2: 8, 3: 4, 4: 2, 5: 1}
    for i in range(1, 6):
        p = dec[f"decode_conv{i}"]
        y = fused_decoder_stage_hwbc(
            y, p["dw"]["w"], p["dw"]["b"], p["pw"]["w"], p["pw"]["b"],
            skip=skips.get(i), block_batch=block_batches[i],
            interpret=interpret,
        )
    head = dec["decode_conv6"]["pw"]
    return B.relu(B.conv2d(y, head["w"], bias=head["b"]))


def apply_fastdepth_fused_v3(
    params: Dict,
    x: Array,
    cfg: ModelConfig,
    *,
    block_batches: Dict[int, int] | None = None,
    interpret: bool = False,
) -> Array:
    """Fused decoder via the single-grid-step manual-DMA kernels.

    Each stage is ONE pallas_call with grid=() that walks the whole batch
    with a private double-buffered DMA pipeline — no automatic-pipeline
    grid steps, hence none of the ~120 us/step floor measured in round 1
    (docs/kernel_notes.md), and no grid-length-dependent compile crashes
    (the grid is empty).
    """
    from fastdepth_tpu.ops import blocks as B
    from fastdepth_tpu.ops.pallas.fused_decoder import fused_decoder_stage_v3

    dec, y, skips = _fused_preamble(params, x, cfg)
    # images per inner-pipeline step: larger B widens the pw matmul for
    # the small-spatial stages; VMEM (~16 MB) caps the big ones
    bbs = block_batches or {1: 8, 2: 4, 3: 2, 4: 1, 5: 1}
    for i in range(1, 6):
        p = dec[f"decode_conv{i}"]
        y = fused_decoder_stage_v3(
            y, p["dw"]["w"], p["dw"]["b"], p["pw"]["w"], p["pw"]["b"],
            skip=skips.get(i), block_batch=bbs[i], interpret=interpret,
        )
    head = dec["decode_conv6"]["pw"]
    return B.relu(B.conv2d(y, head["w"], bias=head["b"]))


def apply_fastdepth_opt(
    params: Dict,
    x: Array,
    cfg: ModelConfig,
) -> Array:
    """XLA fast path: exact graph rewrite of the inference forward.

    Head-commute: the 1x1 head is a per-pixel affine + ReLU, which
    commutes with nearest-neighbor duplication — so it runs BEFORE the
    final x2 upsample, at 112^2 instead of 224^2.  That drops the
    224^2 x C5 intermediate's HBM round trip plus 3/4 of the head's
    input traffic; the model output upsamples a 1-channel map instead.
    Measured 61.4 -> 56.5 us/frame at bf16 b128 on v5e
    (docs/kernel_notes.md round 2).  Mathematically exact: bit-equal vs
    apply_fastdepth on CPU (tests/test_models.py::test_opt_forward_exact);
    on TPU the rescheduled convs may round differently at the float-ulp
    level (observed ~1e-10 relative on f32 224^2 batches).

    Valid for the NNConv family only (nearest upsample; the reference's
    flagship `nnconv5dw` decoder, reference models.py:253-270) — bilinear
    interpolation does not commute with the head's ReLU.  Params must be
    BN-folded ({'w','b'} leaves, Model.fold).
    """
    from fastdepth_tpu.ops import blocks as B

    if not supports_opt(cfg):
        raise ValueError(
            "opt path supports MobileNet encoders with nnconv decoders; "
            f"got encoder={cfg.encoder!r} decoder={cfg.decoder!r}")
    taps = _SKIP_TAPS if cfg.skip else ()
    feats, tapped = MN.apply_encoder(
        params["encoder"], x, relu6=cfg.encoder_relu6, taps=taps,
    )
    import jax.numpy as jnp

    dec = params["decoder"]
    # skip models name stages decode_conv1..6 (reference models.py:683-698),
    # plain models use the registry decoder's stage1..5 + final
    skip_naming = "decode_conv1" in dec
    y = feats
    skips = {2: 5, 3: 3, 4: 1} if cfg.skip else {}
    for i in range(1, 6):
        p = dec[f"decode_conv{i}" if skip_naming else f"stage{i}"]
        if cfg.decoder_depthwise:
            y = B.relu(B.depthwise_conv2d(y, p["dw"]["w"], bias=p["dw"]["b"]))
            y = B.relu(B.conv2d(y, p["pw"]["w"], bias=p["pw"]["b"]))
        else:
            y = B.relu(B.conv2d(y, p["conv"]["w"], bias=p["conv"]["b"]))
        if i == 5:
            break  # head commutes with the final upsample
        y = B.upsample_nearest2x(y)
        if i in skips:
            t = tapped[skips[i]]
            y = y + t if cfg.skip == "add" else jnp.concatenate([y, t], axis=-1)
    head = dec["decode_conv6"]["pw"] if skip_naming else dec["final"]["pw"]
    y = B.relu(B.conv2d(y, head["w"], bias=head["b"]))
    return B.upsample_nearest2x(y)


_NNCONV_NAMES = frozenset(
    f"nnconv{k}{dw}" for k in (3, 5, 7, 9) for dw in ("", "dw")
)


def supports_opt(cfg: ModelConfig) -> bool:
    """True when :func:`apply_fastdepth_opt` covers this architecture
    (MobileNet encoder + nearest-upsample NNConv decoder family)."""
    return cfg.encoder == "mobilenet" and cfg.decoder in _NNCONV_NAMES


def supports_fused(cfg: ModelConfig) -> bool:
    """True when the fused/mixed Pallas paths (:func:`_fused_preamble`
    family) cover this architecture: MobileNet nnconv5dw with additive
    skips — the kernels bake in the 5×5 dw + 1×1 pw + skip-add stage
    shape.  The nnconv-name membership check matters for UNvalidated
    configs: without it a decoder='deconv5dw' + skip='add' config
    (rejected by ModelConfig.validate, but constructible around it)
    would run nearest-upsample nnconv semantics under a wrong label."""
    return (cfg.encoder == "mobilenet" and cfg.skip == "add"
            and cfg.decoder in _NNCONV_NAMES
            and cfg.decoder_depthwise and cfg.decoder_kernel == 5)


def tree_has_bn(params) -> bool:
    """True if any unfolded ``{'w','bn'}`` block remains — the opt/fused
    paths need folded ``{'w','b'}`` leaves.  Inspecting the tree (rather
    than a fold_bn flag) keeps pre-folded checkpoints first-class."""
    if isinstance(params, dict):
        return any(k == "bn" or tree_has_bn(v) for k, v in params.items())
    return False


def apply_fastdepth_mixed(
    params: Dict,
    x: Array,
    cfg: ModelConfig,
    winners: Dict[int, str],
    *,
    interpret: bool = False,
) -> Array:
    """Per-stage impl selection from an autotune record
    (engine/autotune.py): each decoder level runs whichever of {'xla',
    'pallas'} won on this chip — the deployment analogue of the
    reference's AutoTVM-tuned per-layer kernels (SURVEY.md C12).

    Pallas-winner stages respect the same per-stage grid limits the
    hybrid path measured on this platform (small-spatial stages 1-3 take
    a VMEM-sized ``block_batch``; large-spatial stages 4-5 run in
    grid-8 ``lax.map`` slices above batch 8 — the Mosaic helper 500s on
    their kernels at larger grids), so the tuned path compiles at any
    serving batch."""
    import jax.lax as lax

    from fastdepth_tpu.ops import blocks as B

    dec, y, skips = _fused_preamble(params, x, cfg)
    # per-stage images-per-grid-step, VMEM-sized for bf16 (==
    # apply_fastdepth_fused_hybrid); fp32 doubles every block's bytes, so
    # halve the blocks — at the bf16 sizes the unpruned fp32 widths fail
    # the remote Mosaic helper (measured: frontier_mixed_r4 sweep)
    if x.dtype == jnp.float32:
        block_batches = {1: 4, 2: 2, 3: 1}
    else:
        block_batches = {1: 8, 2: 4, 3: 2}
    tail_chunk = 8
    for i in range(1, 6):
        p = dec[f"decode_conv{i}"]
        skip = skips.get(i)
        if winners.get(i, "xla") == "pallas":
            def stage(yc, skipc, p=p, i=i):
                return fused_decoder_stage(
                    yc, p["dw"]["w"], p["dw"]["b"], p["pw"]["w"], p["pw"]["b"],
                    skip=skipc, block_batch=block_batches.get(i, 1),
                    interpret=interpret,
                )

            n = y.shape[0]
            if i >= 4 and n > tail_chunk:
                # Pad the batch to a tail_chunk multiple: convs are
                # batch-independent, so zero rows are exact no-ops that
                # get sliced off after the map.  Without this, a batch
                # like 12 would dispatch a grid-12 large-spatial kernel,
                # which this platform's Mosaic helper 500s on.
                pad = (-n) % tail_chunk
                yp = (jnp.concatenate(
                        [y, jnp.zeros((pad, *y.shape[1:]), y.dtype)], 0)
                      if pad else y)
                k = yp.shape[0] // tail_chunk
                ys = yp.reshape(k, tail_chunk, *y.shape[1:])
                if skip is not None:
                    sp = (jnp.concatenate(
                            [skip,
                             jnp.zeros((pad, *skip.shape[1:]), skip.dtype)],
                            0) if pad else skip)
                    ss = sp.reshape(k, tail_chunk, *skip.shape[1:])
                    y = lax.map(lambda a: stage(a[0], a[1]), (ys, ss))
                else:
                    y = lax.map(lambda v: stage(v, None), ys)
                y = y.reshape(k * tail_chunk, *y.shape[2:])[:n]
            else:
                y = stage(y, skip)
        else:
            y = B.relu(B.depthwise_conv2d(y, p["dw"]["w"], bias=p["dw"]["b"]))
            y = B.relu(B.conv2d(y, p["pw"]["w"], bias=p["pw"]["b"]))
            y = B.upsample_nearest2x(y)
            if skip is not None:
                y = y + skip
    head = dec["decode_conv6"]["pw"]
    return B.relu(B.conv2d(y, head["w"], bias=head["b"]))


def apply_fastdepth_fused_hybrid(
    params: Dict,
    x: Array,
    cfg: ModelConfig,
    *,
    tail_chunk: int = 8,
    interpret: bool = False,
) -> Array:
    """Fused forward with per-stage grid limits respected.

    Empirically on this sandbox's Mosaic compile helper, the small-spatial
    stage kernels (1-3) compile at grid >= 128 while the large-spatial
    stages (4-5) fail above grid ~8.  So: encoder + stages 1-3 run on the
    full batch; stages 4-5 + head run under ``lax.map`` in
    ``tail_chunk``-sized slices, all inside one jit.
    """
    import jax.lax as lax

    from fastdepth_tpu.ops import blocks as B

    n = x.shape[0]
    dec, y, all_skips = _fused_preamble(params, x, cfg)

    # per-stage images-per-grid-step, sized to VMEM (f32 halo scratch +
    # double-buffered in/out/skip blocks)
    block_batches = {1: 8, 2: 4, 3: 2}
    for i in (1, 2, 3):
        p = dec[f"decode_conv{i}"]
        skip = all_skips.get(i) if i in (2, 3) else None
        y = fused_decoder_stage(
            y, p["dw"]["w"], p["dw"]["b"], p["pw"]["w"], p["pw"]["b"],
            skip=skip, block_batch=block_batches[i], interpret=interpret,
        )

    def tail(args):
        yc, x1c = args
        p4 = dec["decode_conv4"]
        yc = fused_decoder_stage(
            yc, p4["dw"]["w"], p4["dw"]["b"], p4["pw"]["w"], p4["pw"]["b"],
            skip=x1c, interpret=interpret,
        )
        p5 = dec["decode_conv5"]
        yc = fused_decoder_stage(
            yc, p5["dw"]["w"], p5["dw"]["b"], p5["pw"]["w"], p5["pw"]["b"],
            interpret=interpret,
        )
        head = dec["decode_conv6"]["pw"]
        return B.relu(B.conv2d(yc, head["w"], bias=head["b"]))

    x1 = all_skips[4]  # the encoder conv1 tap, added after stage 4
    if n <= tail_chunk:
        return tail((y, x1))
    if n % tail_chunk != 0:
        raise ValueError(f"batch {n} not divisible by tail_chunk {tail_chunk}")
    k = n // tail_chunk
    ys = y.reshape(k, tail_chunk, *y.shape[1:])
    x1s = x1.reshape(k, tail_chunk, *x1.shape[1:])
    outs = lax.map(tail, (ys, x1s))
    return outs.reshape(n, *outs.shape[2:])


def apply_fastdepth_fused_chunked(
    params: Dict,
    x: Array,
    cfg: ModelConfig,
    *,
    chunk: int = 4,
    interpret: bool = False,
) -> Array:
    """Fused forward for large batches, processed in grid-`chunk` slices
    via ``lax.map``.

    This sandbox's remote Mosaic compile helper crashes on the fused
    kernels when the pallas grid exceeds ~4 (b<=4 compiles, b>=8 500s);
    chunking keeps each kernel launch at a compilable grid while the
    whole batch stays inside one jit.
    """
    import jax.lax as lax

    n = x.shape[0]
    if n <= chunk:
        return apply_fastdepth_fused(params, x, cfg, interpret=interpret)
    if n % chunk != 0:
        raise ValueError(f"batch {n} not divisible by chunk {chunk}")
    xs = x.reshape(n // chunk, chunk, *x.shape[1:])
    ys = lax.map(lambda v: apply_fastdepth_fused(params, v, cfg, interpret=interpret), xs)
    return ys.reshape(n, *ys.shape[2:])
