from f_lite_tpu.parallel.mesh import LOGICAL_RULES, SP_RULES, create_mesh
from f_lite_tpu.parallel.pipeline import (
    pipeline_to_scan_params,
    scan_to_pipeline_params,
)
from f_lite_tpu.parallel.sharding import (
    batch_sharding,
    infer_param_shardings,
    process_replica_info,
    put_global_batch,
    shard_params,
)

__all__ = [
    "LOGICAL_RULES",
    "SP_RULES",
    "create_mesh",
    "batch_sharding",
    "infer_param_shardings",
    "pipeline_to_scan_params",
    "process_replica_info",
    "put_global_batch",
    "scan_to_pipeline_params",
    "shard_params",
]
