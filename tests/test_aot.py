"""AOT compile + deploy-bundle round trip (the XLA replacement for the
reference's TVM artifact flow, deploy/tx2_run_tvm.py:13-26)."""

import numpy as np

import jax
import jax.numpy as jnp

from fastdepth_tpu.config import ModelConfig
from fastdepth_tpu.engine.aot import compile_forward, load_bundle, save_bundle
from fastdepth_tpu.models import build

TINY_ENC = (4, 6, 8, 10, 12, 14, 16, 16, 16, 16, 16, 16, 20, 24)
TINY_DEC = (18, 14, 10, 6, 4)
CFG = ModelConfig(encoder_channels=TINY_ENC, decoder_channels=TINY_DEC)


def test_compile_forward_matches_eager(rng):
    model = build(CFG)
    params = model.init(jax.random.PRNGKey(0))
    compiled, prepared = compile_forward(model, params, batch_size=2, image_size=(64, 64))
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    got = compiled(prepared, x)
    ref = model.apply(model.fold(params), x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)


def test_bundle_roundtrip(tmp_path, rng):
    model = build(CFG)
    params = model.init(jax.random.PRNGKey(1))
    prefix = str(tmp_path / "bundle")
    save_bundle(prefix, model, params, batch_size=1, image_size=(64, 64))

    call, loaded_params, config, spec = load_bundle(prefix)
    assert config == CFG
    assert spec["batch_size"] == 1 and tuple(spec["image_size"]) == (64, 64)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    got = call(loaded_params, x)
    ref = model.apply(model.fold(params), x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)


def test_bundle_roundtrip_bf16(tmp_path, rng):
    """bf16 bundles survive the npz round trip (numpy stores ml_dtypes
    as raw void without the checkpoint/io dtype tagging — caught by the
    on-chip bf16-bundle drive in round 2)."""
    model = build(CFG)
    params = model.init(jax.random.PRNGKey(1))
    prefix = str(tmp_path / "bundle16")
    save_bundle(prefix, model, params, batch_size=1, image_size=(64, 64),
                dtype=jnp.bfloat16)

    call, loaded_params, config, spec = load_bundle(prefix)
    assert config == CFG
    assert spec["dtype"] == "bfloat16"
    leaves = jax.tree.leaves(loaded_params)
    assert any(l.dtype == jnp.bfloat16 for l in leaves)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    got = call(loaded_params, x)
    folded16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), model.fold(params))
    ref = model.apply(folded16, x.astype(jnp.bfloat16)).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-2)


def test_opt_impl_requires_folded_params():
    """impl='opt' on unfolded params must fail loudly up front, not with
    a KeyError deep in the conv stack."""
    import pytest

    from fastdepth_tpu.engine.aot import compile_forward
    from fastdepth_tpu.engine.evaluator import Evaluator

    model = build(CFG)
    params = model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="folded"):
        compile_forward(model, params, fold_bn=False, impl="opt")
    with pytest.raises(ValueError, match="folded"):
        Evaluator(model, params, fold_bn=False, impl="opt")


def test_mixed_impl_consumes_tuning_record(rng, tmp_path):
    """impl='mixed' (VERDICT r3 item 4): the per-stage winner map from a
    tuning record drives the compiled forward end-to-end — the analogue
    of the reference running its AutoTVM-tuned artifact
    (deploy/tx2_run_tvm.py:13-26)."""
    import json

    import pytest

    model = build(CFG)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    ref = np.asarray(jax.jit(model.apply)(model.fold(params), x))

    # winner-map dict (both kernel families exercised; pallas interprets
    # on the CPU test mesh)
    compiled, prepared = compile_forward(
        model, params, batch_size=2, image_size=(64, 64), impl="mixed",
        tuning={1: "pallas", 2: "xla", 3: "xla", 4: "xla", 5: "pallas"})
    got = np.asarray(compiled(prepared, x))
    np.testing.assert_allclose(ref, got, atol=1e-4)

    # tuning-record *path*, engine/autotune.py schema (what tuning/*.json
    # commits): stage winners parsed via load_tuning
    rec = {"records": [
        {"stage": i, "dtype": "float32", "winner": "xla"} for i in range(1, 6)
    ]}
    tf = tmp_path / "tune.json"
    tf.write_text(json.dumps(rec))
    compiled2, prepared2 = compile_forward(
        model, params, batch_size=2, image_size=(64, 64), impl="mixed",
        tuning=str(tf))
    np.testing.assert_allclose(ref, np.asarray(compiled2(prepared2, x)), atol=1e-4)

    with pytest.raises(ValueError, match="tuning"):
        compile_forward(model, params, batch_size=2, image_size=(64, 64),
                        impl="mixed")
