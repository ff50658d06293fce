from oovrec_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    mesh_from_config,
    param_sharding,
    shard_params,
)
from oovrec_tpu.parallel.train_step import make_sharded_train_step
from oovrec_tpu.parallel.sharded_embedding import (
    make_alltoall_lookup,
    make_lookup,
    make_sharded_lookup,
    place_sharded_table,
)

__all__ = [
    "make_mesh", "mesh_from_config", "param_sharding", "batch_sharding",
    "shard_params", "make_sharded_train_step", "make_sharded_lookup",
    "make_alltoall_lookup", "make_lookup",
    "place_sharded_table",
]
