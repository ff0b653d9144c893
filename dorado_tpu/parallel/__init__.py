from dorado_tpu.parallel.sharding import (
    make_mesh,
    make_sharded_basecall_step,
    shard_params,
)

__all__ = ["make_mesh", "make_sharded_basecall_step", "shard_params"]
