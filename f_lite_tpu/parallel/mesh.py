"""Device mesh + logical-axis rules — the framework's parallelism substrate.

Replaces the reference's NCCL/FSDP2 stack (`/root/reference/f_lite/
distributed.py`) with jax.sharding over a 3-axis mesh:

- "dp"   — pure replication (the reference's inter-node `replicate` axis,
           `distributed.py:47-59`); maps to DCN on multi-slice.
- "fsdp" — parameter sharding, ZeRO-3-like (the reference's intra-node
           `shard` axis with FSDP2 `fully_shard`, `distributed.py:83-100`);
           XLA SPMD inserts the same all-gather / reduce-scatter pattern
           when weights are fsdp-sharded and the batch spans (dp, fsdp).
- "tp"   — tensor parallel over ICI (north-star addition, BASELINE.json):
           qkv / context_kv / gate / up sharded on the output dim,
           proj / down on the input dim (Megatron-style column+row).

HSDP == dp > 1 and fsdp > 1 (`get_device_mesh_hybrid_sharding`,
`distributed.py:46-68`). Mesh axis order (dp, fsdp, tp) puts tp innermost
so its collectives ride the fastest ICI links.

The DiT annotates weights with logical axes (models/dit.py: EMBED / MLP /
QKV_OUT / CTX); LOGICAL_RULES maps them onto mesh axes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

# logical axis -> mesh axis (flax.linen.logical_to_mesh_sharding rules)
LOGICAL_RULES = (
    ("layers", None),      # scan_layers stacking axis: replicated
    ("embed", "fsdp"),     # dim-0 of most kernels: ZeRO-style shard
    ("qkv_out", "tp"),     # fused qkv / context_kv / q output dim
    ("mlp", "tp"),         # gate/up output, down input
    ("ctx", None),         # context input dim: replicated
    ("batch", ("dp", "fsdp")),  # data-parallel batch sharding
    ("act_embed", None),
)


def create_mesh(
    dp: int = 1, fsdp: int = 1, tp: int = 1, *, devices=None
) -> Mesh:
    """Build a (dp, fsdp, tp) mesh. Total must equal len(devices)."""
    devices = devices if devices is not None else jax.devices()
    n = dp * fsdp * tp
    if n != len(devices):
        raise ValueError(
            f"mesh {dp}x{fsdp}x{tp}={n} != {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(dp, fsdp, tp)
    return Mesh(arr, ("dp", "fsdp", "tp"))


def auto_mesh(n_devices: int | None = None) -> Mesh:
    """Default single-axis fsdp mesh over all local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return create_mesh(dp=1, fsdp=len(devices), tp=1, devices=devices)
