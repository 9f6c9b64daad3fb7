from ever_tpu.parallel import mesh, sharded, spatial, spmd, tp, zero
from ever_tpu.parallel.mesh import batch_sharding, host_to_global, make_mesh, replicated
from ever_tpu.parallel.sharded import (
    abstract_train_state,
    create_train_state_sharded,
    sharded_state_shardings,
)
from ever_tpu.parallel.spmd import (
    TrainState,
    build_eval_step,
    build_train_step,
    create_train_state,
)
from ever_tpu.parallel.spatial import (
    build_halo_train_step,
    build_spatial_train_step,
    halo_exchange,
    spatial_partition_apply,
)
from ever_tpu.parallel.tp import apply_tp, vit_tp_shardings
from ever_tpu.parallel.zero import zero_init, zero_shardings
