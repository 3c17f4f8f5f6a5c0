from fastdepth_tpu.checkpoint.io import save_checkpoint, load_checkpoint  # noqa: F401
