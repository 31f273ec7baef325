from .mesh import (
    ParallelConfig,
    kv_cache_spec,
    make_mesh,
    param_specs,
    shard_params,
    validate_divisibility,
)

__all__ = [
    "ParallelConfig",
    "kv_cache_spec",
    "make_mesh",
    "param_specs",
    "shard_params",
    "validate_divisibility",
]
