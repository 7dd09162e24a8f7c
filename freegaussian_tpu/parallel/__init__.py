from .sharding import (
    make_mesh,
    make_parallel_train_step,
    replicate_state,
    stack_cameras,
)
