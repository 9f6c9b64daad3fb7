from ever_tpu.parallel import mesh, spmd
from ever_tpu.parallel.mesh import batch_sharding, host_to_global, make_mesh, replicated
from ever_tpu.parallel.spmd import (
    TrainState,
    build_eval_step,
    build_train_step,
    create_train_state,
)
