from .disaggregated import (
    DecodeWorker,
    DisaggregatedCoordinator,
    KVTransfer,
    PrefillWorker,
    setup_disaggregated,
)
from .launcher import init_distributed, is_serving_host
from .mesh import (
    ParallelConfig,
    kv_cache_spec,
    make_mesh,
    param_specs,
    shard_params,
    validate_divisibility,
)
from .pipeline import PipelinedModel, get_pp_indices, slice_stage_params

__all__ = [
    "ParallelConfig",
    "kv_cache_spec",
    "make_mesh",
    "param_specs",
    "shard_params",
    "validate_divisibility",
    "PipelinedModel",
    "get_pp_indices",
    "slice_stage_params",
    "PrefillWorker",
    "DecodeWorker",
    "DisaggregatedCoordinator",
    "KVTransfer",
    "setup_disaggregated",
    "init_distributed",
    "is_serving_host",
]
