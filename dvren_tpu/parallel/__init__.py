from dvren_tpu.parallel.mesh import batch_sharded, make_mesh, replicated
from dvren_tpu.parallel.shard import (
    fit_dense_grid_dp,
    make_dp_train_step,
    render_sharded,
)

__all__ = [
    "make_mesh",
    "replicated",
    "batch_sharded",
    "render_sharded",
    "make_dp_train_step",
    "fit_dense_grid_dp",
]
