"""Top-level API surface: the flat imports documented in docs/api.md."""

import importlib


def test_flat_exports_resolve():
    import fastdepth_tpu as fd

    for name in sorted(fd._EXPORTS):
        obj = getattr(fd, name)
        assert obj is not None, name

    # the lazy exports resolve to the same objects as their home modules
    from fastdepth_tpu.engine.evaluator import Evaluator
    from fastdepth_tpu.train.trainer import Trainer

    assert fd.Evaluator is Evaluator
    assert fd.Trainer is Trainer


def test_unknown_attribute_raises():
    import pytest

    import fastdepth_tpu as fd

    with pytest.raises(AttributeError):
        fd.does_not_exist


def test_dir_lists_lazy_exports():
    import fastdepth_tpu as fd

    names = dir(fd)
    for expected in ("Evaluator", "Trainer", "NYUDataset", "ModelConfig"):
        assert expected in names


def test_config_importable_standalone():
    # the converter's torch-only context imports config without the
    # model/engine stack; keep that path working
    mod = importlib.import_module("fastdepth_tpu.config")
    assert hasattr(mod, "FASTDEPTH_PRUNED")
