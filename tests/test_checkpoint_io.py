"""Native .npz checkpoint save/restore round-trip (SURVEY.md §5
'Checkpoint / resume': the rebuild adds the save path the reference
release lacks)."""

import numpy as np

import jax

from fastdepth_tpu.checkpoint.io import (
    flatten_tree,
    load_checkpoint,
    numpy_to_jax,
    save_checkpoint,
    unflatten_tree,
)
from fastdepth_tpu.config import ModelConfig
from fastdepth_tpu.models import build

TINY_ENC = (4, 6, 8, 10, 12, 14, 16, 16, 16, 16, 16, 16, 20, 24)
TINY_DEC = (18, 14, 10, 6, 4)


def test_flatten_unflatten_roundtrip(rng):
    tree = {"a": {"b": rng.randn(3), "c": {"d": rng.randn(2, 2)}}, "e": rng.randn(1)}
    flat = flatten_tree(tree)
    assert set(flat) == {"a/b", "a/c/d", "e"}
    back = unflatten_tree(flat)
    np.testing.assert_array_equal(tree["a"]["c"]["d"], back["a"]["c"]["d"])


def test_save_load_checkpoint_roundtrip(tmp_path):
    cfg = ModelConfig(encoder_channels=TINY_ENC, decoder_channels=TINY_DEC)
    model = build(cfg)
    params = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(
        path, params, cfg, epoch=3,
        best_result={"rmse": 0.6, "delta1": 0.77},
        extra={"note": "test"},
    )
    params2, cfg2, meta = load_checkpoint(path)
    assert cfg2 == cfg
    assert meta["epoch"] == 3
    assert meta["best_result"]["delta1"] == 0.77
    w1 = np.asarray(params["encoder"]["conv0"]["w"])
    np.testing.assert_array_equal(w1, params2["encoder"]["conv0"]["w"])


def test_save_is_atomic(tmp_path, monkeypatch):
    """A crash mid-save must leave an existing checkpoint intact: the
    write goes to a temp sibling and lands via os.replace."""
    import fastdepth_tpu.checkpoint.io as io

    cfg = ModelConfig(encoder_channels=TINY_ENC, decoder_channels=TINY_DEC)
    model = build(cfg)
    params = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, params, cfg, epoch=1)

    real_savez = np.savez

    def crashing_savez(f, **kw):
        real_savez(f, **kw)  # bytes hit the temp file...
        raise RuntimeError("simulated crash before rename")

    monkeypatch.setattr(np, "savez", crashing_savez)
    try:
        save_checkpoint(path, params, cfg, epoch=2)
    except RuntimeError:
        pass
    monkeypatch.undo()
    # the original file is untouched and loadable; no temp junk survives a
    # retry (the .tmp sibling may exist after the crash — that's fine)
    _, _, meta = load_checkpoint(path)
    assert meta["epoch"] == 1

    # suffixless path gets .npz appended (np.savez-compatible behavior)
    save_checkpoint(str(tmp_path / "bare"), params, cfg, epoch=5)
    _, _, meta = load_checkpoint(str(tmp_path / "bare.npz"))
    assert meta["epoch"] == 5


def test_loaded_checkpoint_runs(tmp_path, rng):
    import jax.numpy as jnp

    from fastdepth_tpu.checkpoint.io import numpy_to_jax

    cfg = ModelConfig(encoder_channels=TINY_ENC, decoder_channels=TINY_DEC)
    model = build(cfg)
    params = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, params, cfg)
    params2, cfg2, _ = load_checkpoint(path)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    y1 = model.apply(params, x)
    y2 = build(cfg2).apply(numpy_to_jax(params2), x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_save_load_bfloat16_params(tmp_path):
    """bfloat16 leaves survive the npz round trip: numpy serializes
    ml_dtypes as raw void ('|V2'), so save tags them in meta and load
    restores the dtype (caught by the on-chip AOT bf16-bundle drive)."""
    import jax
    import jax.numpy as jnp

    from fastdepth_tpu.config import ModelConfig

    params = {
        "a": jnp.arange(6, dtype=jnp.bfloat16).reshape(2, 3) / 7,
        "n": {"b": jnp.ones((3,), jnp.float32)},
    }
    path = str(tmp_path / "bf16.npz")
    save_checkpoint(path, params, ModelConfig(), epoch=1)
    loaded, cfg, meta = load_checkpoint(path)
    assert loaded["a"].dtype == jnp.bfloat16
    assert loaded["n"]["b"].dtype == np.float32
    np.testing.assert_array_equal(
        np.asarray(loaded["a"].astype(np.float32)),
        np.asarray(params["a"].astype(jnp.float32)),
    )
    back = numpy_to_jax(loaded)
    assert back["a"].dtype == jnp.bfloat16


def test_numpy_to_jax_casts_mldtypes_floats():
    """dtype= must cast bfloat16/float8 leaves too: numpy classes
    ml_dtypes as kind 'V', not np.floating (regression: bf16 leaves
    silently survived a requested fp32 cast)."""
    import jax.numpy as jnp
    import ml_dtypes

    tree = {"a": np.arange(4).astype(ml_dtypes.bfloat16),
            "b": np.ones(2, np.float32), "i": np.ones(2, np.int32)}
    out = numpy_to_jax(tree, dtype=jnp.float32)
    assert out["a"].dtype == jnp.float32
    assert out["b"].dtype == jnp.float32
    assert out["i"].dtype == jnp.int32  # ints never cast


def test_save_load_suffixless_path_roundtrip(tmp_path):
    """save appends .npz when missing; load must apply the same
    normalization so the exact string the caller saved with loads."""
    from fastdepth_tpu.config import ModelConfig

    prefix = str(tmp_path / "ckpt")
    save_checkpoint(prefix, {"a": np.ones((2,), np.float32)}, ModelConfig())
    loaded, _, _ = load_checkpoint(prefix)
    np.testing.assert_array_equal(loaded["a"], np.ones((2,), np.float32))


def test_flatten_rejects_separator_in_key():
    """A '/' inside a tree key would silently restructure the tree on
    round-trip; flatten must fail loudly instead."""
    import pytest

    from fastdepth_tpu.checkpoint.io import flatten_tree

    with pytest.raises(ValueError, match="separator"):
        flatten_tree({"bad/key": np.ones(1)})
