"""Mesh/sharding utilities for multi-chip scale-out."""
from p3achygo_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    param_partition_spec,
    replicate,
    shard_batch,
    shard_params,
)
