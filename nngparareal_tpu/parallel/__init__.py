from nngparareal_tpu.parallel.mesh import (
    make_mesh,
    shard_fine_fanout,
    slice_sharding,
)

__all__ = ["make_mesh", "shard_fine_fanout", "slice_sharding"]
