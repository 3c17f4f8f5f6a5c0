from fastdepth_tpu.parallel.distributed import (  # noqa: F401
    add_distributed_args,
    init_distributed,
    is_primary,
    shard_kwargs,
)
from fastdepth_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    make_mesh_2d,
    mesh_from_cli,
    replicate,
    shard_activations,
    shard_batch,
)
