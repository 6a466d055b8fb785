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

import contextvars

import jax
import numpy as np
from jax.sharding import Mesh

# logical axis -> mesh axis (flax.linen.logical_to_mesh_sharding rules)
LOGICAL_RULES = (
    ("layers", None),      # scan_layers stacking axis: replicated
    ("stage", "pp"),       # pipeline-parallel stage axis (models/dit.py
    ("act_stage", "pp"),   # PipelineTrunk): params + rotating activations
    ("act_mb", None),      # microbatch axis of pipelined activations
    ("embed", "fsdp"),     # dim-0 of most kernels: ZeRO-style shard
    ("qkv_out", "tp"),     # fused qkv / context_kv / q output dim
    ("mlp", "tp"),         # gate/up output, down input
    ("ctx", None),         # context input dim: replicated
    ("batch", ("dp", "fsdp")),  # data-parallel batch sharding
    ("act_embed", None),
    # activation axes (see models/dit.py _constrain): explicit
    # Megatron-style intermediate shardings so XLA SPMD doesn't invent
    # its own activation decomposition (which produced resharding
    # collective-permutes + involuntary rematerialization on tp meshes)
    ("act_batch", ("dp", "fsdp")),
    ("act_heads", "tp"),   # per-head activations (attention local per tp)
    ("act_mlp", "tp"),     # gate/up intermediate
    ("act_seq", None),     # residual-stream sequence axis: replicated
)

# Megatron-style sequence parallelism (opt-in): the residual stream is
# sharded over tp along the sequence axis, so RMSNorms / AdaLN modulation /
# residual adds run on L/tp shards and each block's two tp all-reduces
# become reduce-scatter (after the row-parallel proj/down matmuls) +
# all-gather (before the column-parallel qkv/gate/up matmuls) — identical
# communication volume, 1/tp residual-stream activation memory. Activate
# with `mesh_rules(mesh, SP_RULES)` / trainer `--sequence_parallel`.
SP_RULES = tuple(
    (name, "tp") if name == "act_seq" else (name, spec)
    for name, spec in LOGICAL_RULES
)


_ACTIVE_MESH_RULES: contextvars.ContextVar = contextvars.ContextVar(
    "f_lite_tpu_mesh_rules", default=None
)


def mesh_rules(mesh: Mesh, rules=LOGICAL_RULES):
    """Context manager activating `mesh` + logical-axis rules for tracing.

    Wrap jit *tracing/lowering* call sites (train-step build, TP serving,
    AOT compile checks) so the model's activation sharding annotations
    (models/dit.py `_constrain`) resolve against this mesh. Outside this
    context the annotations are inert (identity), which keeps single-chip
    paths unchanged. jax 0.9 dropped the implicit thread-resources mesh
    flax used to read, so the mesh is threaded explicitly via a
    contextvar and passed to `nn.with_logical_constraint(mesh=...)`.
    """
    import contextlib

    @contextlib.contextmanager
    def _ctx():
        token = _ACTIVE_MESH_RULES.set((mesh, tuple(rules)))
        try:
            yield
        finally:
            _ACTIVE_MESH_RULES.reset(token)

    return _ctx()


def active_mesh_rules():
    """(mesh, rules) from the innermost `mesh_rules`, or None."""
    return _ACTIVE_MESH_RULES.get()


def use_mesh_rules(mesh: Mesh, rules=LOGICAL_RULES) -> None:
    """Sticky (non-context) variant of `mesh_rules` for long-lived loops
    (trainer, serving): activates the mesh for every later trace in this
    context until replaced."""
    _ACTIVE_MESH_RULES.set((mesh, tuple(rules)))


def clear_mesh_rules() -> None:
    """Undo `use_mesh_rules` (tests that A/B sharded vs unsharded paths
    in one process must not let a sticky mesh leak into the baseline)."""
    _ACTIVE_MESH_RULES.set(None)


def create_mesh(
    dp: int = 1, fsdp: int = 1, tp: int = 1, pp: int = 1, *, devices=None
) -> Mesh:
    """Build a (dp, pp, fsdp, tp) mesh. Total must equal len(devices).

    Axis order: dp outermost (maps to DCN on multi-slice), then pp (stage
    neighbors are ICI neighbors), then fsdp, then tp innermost (its
    collectives are per-layer and ride the fastest links).
    """
    devices = devices if devices is not None else jax.devices()
    n = dp * fsdp * tp * pp
    if n != len(devices):
        raise ValueError(
            f"mesh {dp}x{pp}x{fsdp}x{tp}={n} != {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(dp, pp, fsdp, tp)
    return Mesh(arr, ("dp", "pp", "fsdp", "tp"))


def auto_mesh(n_devices: int | None = None) -> Mesh:
    """Default single-axis fsdp mesh over all local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return create_mesh(dp=1, fsdp=len(devices), tp=1, devices=devices)
