from d3feat_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated_sharding,
    stack_shard_batch,
)
from d3feat_tpu.parallel.data_parallel import (  # noqa: F401
    make_dp_eval_step,
    make_dp_extract_step,
    make_dp_train_step,
)
