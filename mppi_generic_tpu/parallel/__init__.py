from mppi_generic_tpu.parallel.mesh import (
    make_sample_mesh,
    sample_sharding,
    shard_controller,
)

__all__ = ["make_sample_mesh", "sample_sharding", "shard_controller"]
