from imfnet_tpu.parallel.mesh import initialize_distributed, make_mesh  # noqa: F401
from imfnet_tpu.parallel.dp import (  # noqa: F401
    make_emulated_dp_step,
    make_parallel_eval_forward,
    make_parallel_registration,
    make_parallel_train_step,
    put_stacked,
    replicate,
    shard_pair_batches,
    stack_batches,
)
