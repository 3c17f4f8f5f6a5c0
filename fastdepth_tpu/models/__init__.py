from fastdepth_tpu.models.registry import (  # noqa: F401
    Model,
    build,
    from_name,
    fastdepth_pruned,
    fastdepth_unpruned,
)
