from fastdepth_tpu.data.nyu import NYUDataset  # noqa: F401
from fastdepth_tpu.data.loader import BatchLoader  # noqa: F401
