"""Multi-chip parallelism: meshes, PartitionSpec layouts (XLA-SPMD path),
shard_map-wrapped fused kernels, and the fused multi-chip model
(shard_model — mega-kernels per shard, Megatron tp)."""

from .mesh import make_hybrid_mesh, make_mesh  # noqa: F401
from .shard_model import (  # noqa: F401
    from_tp_layout, init_sharded_train_state, make_sharded_forward,
    make_sharded_train_step, to_tp_layout, vit_tp_param_sharding)
