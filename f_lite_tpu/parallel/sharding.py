"""Parameter/batch sharding derivation from the model's logical axes.

Flow: `jax.eval_shape` over `model.init` keeps the flax
`LogicallyPartitioned` metadata; `nn.get_partition_spec` extracts logical
PartitionSpecs; `nn.logical_to_mesh_sharding` resolves them against
LOGICAL_RULES into NamedShardings. Equivalent in role to the reference's
`parallelize_model` + FSDP2 grouping plan (`distributed.py:83-100`,
`train.py:618-620`) — but declarative: XLA SPMD derives the all-gather /
reduce-scatter schedule.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import flax.linen as nn
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from f_lite_tpu.parallel.mesh import LOGICAL_RULES


def infer_param_shardings(
    init_fn: Callable[[], Any],
    mesh: Mesh,
    rules=LOGICAL_RULES,
):
    """NamedSharding pytree for the params produced by `init_fn`.

    `init_fn` must be a zero-arg closure calling `module.init(...)`
    WITHOUT unboxing (keep the partitioning metadata).
    """
    abstract = jax.eval_shape(init_fn)
    logical_specs = nn.get_partition_spec(abstract)
    return nn.logical_to_mesh_sharding(logical_specs, mesh, rules)


def shard_params(params, shardings):
    """Place (possibly replicated) params onto the mesh per `shardings`."""
    return jax.device_put(params, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Input batch sharding: leading dim over (dp, fsdp)."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def process_replica_info() -> tuple[int, int]:
    """(num_replicas, rank) for data-parallel input striding across hosts.

    Mirrors the reference's rank-strided samplers (`sampler.py:96-97`,
    wired at `train.py:782-836`): each process loads a disjoint slice of
    the dataset. Single-process returns (1, 0).
    """
    return jax.process_count(), jax.process_index()


def put_global_batch(x, sharding: NamedSharding):
    """Host-local batch -> global array on the mesh under `sharding`.

    Single-process: plain device_put. Multi-process: `device_put` of a
    host-local array is WRONG when the sharding spans processes (each host
    would place the same values, silently training on duplicated data) —
    instead every host contributes its local slice of the global batch
    (global batch = local batch * process_count along dim 0) via
    `jax.make_array_from_process_local_data`. The TPU analog of the
    reference's per-rank DataLoader feeding NCCL-sharded FSDP2
    (`distributed.py:46-68`).

    CONTRACT (multi-process): along dims whose shards partition across
    processes, each host passes only its local slice (global = local *
    process span); along dims this process fully addresses — e.g. the
    batch axis when a pipeline/tensor axis spans hosts and the batch is
    replicated over it — the local data IS the global data and EVERY HOST
    MUST SUPPLY AN IDENTICAL FULL BATCH (use a process-independent data
    stream or seed for those axes; `process_replica_info` in
    train/trainer.py derives which case applies). Nothing at the jax
    level validates cross-host equality — divergent per-host data would
    silently create inconsistent replicas. Set F_LITE_VALIDATE_BATCH=1 to
    all-gather a per-host checksum and assert equality (debug/test mode;
    one tiny collective per call).
    """
    import numpy as np

    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    local = np.asarray(x)
    out = jax.make_array_from_process_local_data(sharding, local)
    if os.environ.get("F_LITE_VALIDATE_BATCH") and (
        out.shape == local.shape
    ):
        # out.shape == local.shape means no dim partitioned across
        # processes: every host claimed to supply the SAME global array
        _validate_replicated_batch(local)
    return out


def _validate_replicated_batch(local):
    """Debug check for the put_global_batch contract: when the local
    array IS the global array (nothing partitioned across processes), the
    bytes must be identical on all hosts — exchange crc32s and compare."""
    import zlib

    import numpy as np
    from jax.experimental import multihost_utils

    crc = zlib.crc32(np.ascontiguousarray(local).tobytes()) & 0xFFFFFFFF
    all_crcs = np.asarray(multihost_utils.process_allgather(
        np.asarray([crc], np.int64)
    )).ravel()
    if not np.all(all_crcs == all_crcs[0]):
        raise ValueError(
            "put_global_batch: hosts supplied DIFFERENT data for a batch "
            "that is replicated across processes under this sharding — "
            "each host must pass an identical full batch (see docstring); "
            f"per-host crc32s: {all_crcs.tolist()}"
        )
