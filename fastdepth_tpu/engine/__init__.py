from fastdepth_tpu.engine.evaluator import Evaluator, validate  # noqa: F401
