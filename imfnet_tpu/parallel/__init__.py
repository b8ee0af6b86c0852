from imfnet_tpu.parallel.mesh import make_mesh  # noqa: F401
from imfnet_tpu.parallel.dp import (  # noqa: F401
    make_parallel_train_step,
    replicate,
    shard_pair_batches,
)
