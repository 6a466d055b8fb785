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
