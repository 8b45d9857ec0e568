from isdf_tpu.parallel.batch import (  # noqa: F401
    ScenarioBatch,
    batched_cost_and_grad,
    batched_solve,
    make_mesh,
    shard_batch,
)
