from proteingym_tpu.parallel.mesh import (
    make_mesh,
    esm_param_sharding,
    replicate,
    shard_params,
)

__all__ = ["esm_param_sharding", "make_mesh", "replicate", "shard_params"]
