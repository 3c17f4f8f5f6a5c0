"""AOT compilation — the XLA-native replacement for the reference's TVM
deploy bundle (deploy_lib.o / deploy_graph.json / deploy_param.params,
reference deploy/tx2_run_tvm.py:13-26).

``jax.jit(...).lower(...).compile()`` plays the role of TVM's graph
compiler; the serialized executable + the .npz checkpoint are the deploy
artifact pair.  First-class both for latency (no retrace/compile at
serve time) and as the unit the benchmark CLI times.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastdepth_tpu.models.registry import Model


def _pick_apply(model: Model, params, impl: str, batch_size: int = 2,
                tuning=None):
    """'auto' -> head-commute fast path when supported + params folded
    (bit-exact: tests/test_models.py::test_opt_forward_exact); batch 1
    stays on the straight graph (measured slower, docs/frontier.md).
    Folded-ness is read off the params tree, so pre-folded checkpoints
    (fold_bn=False callers) still get the fast path.

    'mixed' consumes a tuning record (engine/autotune.py, the analogue of
    the reference's AutoTVM logs that tx2_run_tvm.py runs): each decoder
    stage uses whichever of {'xla', 'pallas'} won on this chip.
    ``tuning`` is a path to a tuning/*.json record or an already-loaded
    ``{stage: impl}`` winner map."""
    from fastdepth_tpu.models import fused as F

    if impl not in ("auto", "opt", "xla", "mixed"):
        # a typo'd impl would otherwise silently time the straight graph
        # while the operator believes they measured the opt path
        raise ValueError(
            f"impl must be 'auto', 'opt', 'xla' or 'mixed', got {impl!r}")
    folded = not F.tree_has_bn(params)
    if impl in ("opt", "mixed") and not folded:
        raise ValueError(
            f"impl={impl!r} requires BN-folded params ({{'w','b'}} leaves): "
            "fold via Model.fold (or pass fold_bn=True)"
        )
    if impl == "mixed":
        if not F.supports_fused(model.config):
            raise ValueError(
                "impl='mixed' runs the fused-stage kernels, which cover "
                "the MobileNet nnconv5dw skip-add family only; got "
                f"decoder={model.config.decoder!r} "
                f"skip={model.config.skip!r}")
        if tuning is None:
            raise ValueError(
                "impl='mixed' needs a tuning record: pass tuning=<path to "
                "tuning/*.json> (or a {stage: 'xla'|'pallas'} dict)")
        # Pallas kernels only compile on real TPU backends; everywhere
        # else (CPU test mesh) they run in interpreter mode — same math.
        interpret = jax.default_backend() not in ("tpu", "axon")
        if isinstance(tuning, (str, bytes)):
            # winners are measured PER DTYPE (the committed pruned record
            # flips stages 2/5 between fp32 and bf16) — load both maps and
            # pick by the compute dtype seen at trace time, so one
            # _pick_apply serves fp32 and bf16 callers with their own
            # tuned configuration
            from fastdepth_tpu.engine.autotune import load_tuning

            maps = {d: load_tuning(tuning, dtype=d)
                    for d in ("bfloat16", "float32")}

            def mixed(p, x):
                winners = maps.get(jnp.dtype(x.dtype).name,
                                   maps["bfloat16"])
                return F.apply_fastdepth_mixed(
                    p, x, model.config, winners, interpret=interpret)

            return mixed
        return lambda p, x: F.apply_fastdepth_mixed(
            p, x, model.config, tuning, interpret=interpret)
    use_opt = impl == "opt" or (
        impl == "auto" and folded and batch_size > 1
        and F.supports_opt(model.config)
    )
    if use_opt:
        return lambda p, x: F.apply_fastdepth_opt(p, x, model.config)
    return model.apply


def _prepare(model, params, *, batch_size, image_size, dtype, fold_bn, impl,
             tuning=None):
    """Shared fold/cast/forward preamble for :func:`compile_forward` and
    :func:`save_bundle` — ONE source, so the serialized bundle can never
    drift from the executable the benchmark CLI times.  Returns
    (params_prepared, forward, p_spec, x_spec)."""
    if fold_bn:
        params = model.fold(params)
    if dtype != jnp.float32:
        params = jax.tree.map(
            lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
            params,
        )

    apply_fn = _pick_apply(model, params, impl, batch_size, tuning)

    def forward(p, x):
        return apply_fn(p, x.astype(dtype)).astype(jnp.float32)

    h, w = image_size
    x_spec = jax.ShapeDtypeStruct((batch_size, h, w, 3), jnp.float32)
    p_spec = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
    return params, forward, p_spec, x_spec


def compile_forward(
    model: Model,
    params,
    *,
    batch_size: int = 1,
    image_size: Tuple[int, int] = (224, 224),
    dtype=jnp.float32,
    fold_bn: bool = True,
    donate: bool = False,
    impl: str = "auto",
    tuning=None,
):
    """Returns (compiled_fn, params_prepared).  compiled_fn(params, rgb)
    is an AOT-compiled executable for the fixed shape.  ``impl='auto'``
    bakes in the head-commute fast path (bit-exact; models/fused.py)
    when the architecture supports it."""
    params, forward, p_spec, x_spec = _prepare(
        model, params, batch_size=batch_size, image_size=image_size,
        dtype=dtype, fold_bn=fold_bn, impl=impl, tuning=tuning)
    # donate the INPUT frame buffer only (arg 1); params are reused
    # across calls.  Measured effect on this platform: docs/b1_latency.md
    # (the fp32-in/bf16-compute path never aliases, so XLA may ignore it)
    jit_kwargs = {"donate_argnums": (1,)} if donate else {}
    compiled = jax.jit(forward, **jit_kwargs).lower(p_spec, x_spec).compile()
    return compiled, params


def save_bundle(
    path_prefix: str,
    model: Model,
    params,
    *,
    batch_size: int = 1,
    image_size: Tuple[int, int] = (224, 224),
    dtype=jnp.float32,
    fold_bn: bool = True,
    impl: str = "auto",
    tuning=None,
) -> None:
    """Write a deploy bundle: ``<prefix>.stablehlo`` (serialized exported
    function) + ``<prefix>.npz`` (folded params + config).

    The XLA-native analogue of the reference's TVM artifact set
    {deploy_lib.o, deploy_graph.json, deploy_param.params}
    (deploy/tx2_run_tvm.py:13-20): the StableHLO blob is the portable
    compiled-graph artifact, the npz carries weights + architecture.
    """
    from jax import export as jexport

    from fastdepth_tpu.checkpoint.io import save_checkpoint

    params, forward, p_spec, x_spec = _prepare(
        model, params, batch_size=batch_size, image_size=image_size,
        dtype=dtype, fold_bn=fold_bn, impl=impl, tuning=tuning)
    exported = jexport.export(jax.jit(forward))(p_spec, x_spec)
    with open(path_prefix + ".stablehlo", "wb") as f:
        f.write(exported.serialize())
    save_checkpoint(path_prefix + ".npz", params, model.config,
                    extra={"bundle": True, "batch_size": batch_size,
                           "image_size": list(image_size),
                           # np.dtype instances / strings lack __name__
                           "dtype": np.dtype(dtype).name})


def load_bundle(path_prefix: str):
    """Load a deploy bundle; returns (callable(params, rgb), params,
    config, spec) where ``spec`` is what save_bundle baked in —
    {'batch_size', 'image_size', 'dtype'} — so callers can validate an
    input against the fixed-shape executable up front instead of dying
    inside jax.export with a shape-mismatch trace."""
    from jax import export as jexport

    from fastdepth_tpu.checkpoint.io import load_checkpoint, numpy_to_jax

    with open(path_prefix + ".stablehlo", "rb") as f:
        exported = jexport.deserialize(f.read())
    params, config, meta = load_checkpoint(path_prefix + ".npz")
    return exported.call, numpy_to_jax(params), config, meta.get("extra", {})


def flops_estimate(compiled) -> Optional[float]:
    try:
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0))
    except Exception:
        return None
