"""F-Lite DiT — latent flow-matching diffusion transformer, TPU-native.

One configurable class covers every reference variant (SURVEY.md §0.1):
- v1 (`/root/reference/f_lite/model.py:417-591`): shared whole-model AdaLN,
  cross-attention in blocks `idx % 4 == 0 or idx < 8`;
- v2 (`/root/reference/f_lite/model_v2.py:425`): per-block AdaLN heads,
  cross-attention in every block (without v2's double-repeat timestep bug,
  SURVEY.md §0.1.4);
- released 10B (`/root/reference/f_lite/pt.py:85-95`): `residual_v` value
  residual (tech report p.4; in-repo code never defines it — we implement
  value-residual learning a la arXiv:2410.17897: per-block learnable mix of
  each block's V with the first block's V).

Design departures from the CUDA reference, deliberate and TPU-first:
- static padded text + key-padding mask instead of flash-attn varlen packing
  (`model.py:31-89`): image/register tokens are dense, so only cross-attn
  needs a mask; attention runs through a Pallas flash kernel on TPU.
- NHWC layout; the Conv2d patch embed (`model.py:318-331`) becomes
  patchify + matmul (identical math, MXU-shaped).
- RoPE tables built at trace time for the static (h, w) grid instead of a
  512x512 HBM buffer (`model.py:334-354`).
- AdaLN modulation stays (B, D) and broadcasts over tokens; no
  repeat_interleave materialization (`model.py:553-556`).
- fp32 islands match the reference exactly: RMS norms, QK-norm, RoPE,
  timestep embedding; everything else in `dtype` (bf16 on TPU).
- parallelism beyond the reference's FSDP: Megatron TP via logical-axis
  annotations (`_constrain`), opt-in sequence parallelism (ACT_SEQ +
  parallel/mesh.py SP_RULES), and GPipe pipeline parallelism over the
  block stack (`PipelineTrunk`, `pipeline_stages`/`pipeline_microbatches`
  config) — all bit-exact vs the single-device program.

Parameter tree is named to mirror the torch state dict one-to-one for
checkpoint conversion (see `f_lite_tpu/convert/torch_to_jax.py`).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from f_lite_tpu.ops.attention import attention, compact_context
from f_lite_tpu.ops.norms import rms_norm
from f_lite_tpu.ops.patching import patchify, unpatchify
from f_lite_tpu.ops.rope import apply_rotary, rope_2d_freqs
from f_lite_tpu.ops.timesteps import timestep_embedding

# Logical axis names for pjit sharding (resolved by parallel/mesh.py rules).
EMBED = "embed"
MLP = "mlp"
HEADS_QKV = "qkv_out"
CTX = "ctx"
# activation logical axes
ACT_BATCH = "act_batch"
ACT_HEADS = "act_heads"
ACT_MLP = "act_mlp"
# residual-stream sequence axis: maps to None (replicated) under the
# default rules = plain Megatron TP; maps to "tp" under
# parallel.mesh.SP_RULES = Megatron sequence parallelism (norms/residual
# adds run on L/tp shards, XLA turns each block's all-reduce into
# reduce-scatter + all-gather — same bytes, 1/tp activation memory)
ACT_SEQ = "act_seq"


_DROPPED_HINTS: set = set()


def _constrain(x, *axes):
    """Megatron-style activation sharding hint. Inert (identity) unless the
    caller traces inside `parallel.mesh.mesh_rules(mesh)` — single-chip and
    rule-less paths are untouched; on a tp mesh it pins per-head/MLP
    intermediates to the tp axis so XLA SPMD doesn't invent resharding
    permutes (observed on unconstrained tp compiles)."""
    import logging

    from f_lite_tpu.parallel.mesh import active_mesh_rules

    active = active_mesh_rules()
    if active is None:
        return x
    mesh, rules = active
    # Drop any axis whose (static) dimension isn't divisible by the mesh
    # extent it maps to — e.g. a batch-1 init/debug forward on a dp*fsdp=4
    # mesh must not demand 4-way batch sharding. Shapes are static under
    # trace, so this check costs nothing and keeps the hint best-effort.
    # Each dropped (axis, size, extent) is logged once: a silent fallback
    # to replicated under SP_RULES (e.g. seq % tp != 0) would otherwise
    # produce mixed layouts and resharding churn with no signal.
    rule_map = dict(rules)
    safe = []
    for i, name in enumerate(axes):
        mesh_axes = rule_map.get(name) if name is not None else None
        if mesh_axes is None:
            safe.append(None)
            continue
        if isinstance(mesh_axes, str):
            mesh_axes = (mesh_axes,)
        extent = math.prod(mesh.shape[a] for a in mesh_axes)
        if x.shape[i] % extent == 0:
            safe.append(name)
            continue
        safe.append(None)
        key = (name, int(x.shape[i]), extent)
        if key not in _DROPPED_HINTS:
            _DROPPED_HINTS.add(key)
            log = logging.getLogger("f_lite_tpu.models.dit")
            # batch-axis drops are routine (batch-1 init/debug traces);
            # everything else (notably act_seq under SP_RULES) is a real
            # layout fallback the user should know about
            (log.debug if name == ACT_BATCH else log.warning)(
                "sharding hint dropped: logical axis %r (dim %d) is not "
                "divisible by mesh extent %d -> tensor falls back to "
                "replicated on that axis",
                name, x.shape[i], extent,
            )
    return nn.with_logical_constraint(x, tuple(safe), rules=rules, mesh=mesh)


class QuantDense(nn.Module):
    """Int8 W8A8 Dense (see f_lite_tpu/quant.py): per-column int8
    weights + fp32 scales, dynamic per-token activation quant, int32 MXU
    accumulation — ~1.74x over bf16 on v5e. Params come from
    `quantize_dit_params`; the zero init here is a placeholder."""

    features: int
    use_bias: bool
    kernel_axes: tuple
    dtype: Any
    param_dtype: Any

    @nn.compact
    def __call__(self, x):
        from f_lite_tpu.quant import quant_matmul

        in_features = x.shape[-1]
        w8 = self.param(
            "w8",
            nn.with_logical_partitioning(
                lambda key, shape, dtype=jnp.int8: jnp.zeros(shape, dtype),
                self.kernel_axes,
            ),
            (in_features, self.features), jnp.int8,
        )
        scale = self.param(
            "scale",
            nn.with_logical_partitioning(
                nn.initializers.ones, (self.kernel_axes[-1],)
            ),
            (self.features,), jnp.float32,
        )
        y = quant_matmul(x, w8, scale)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                self.param_dtype,
            )
            y = y + bias.astype(y.dtype)
        return y


class HeadProj(nn.Module):
    """Head-aligned q/kv projection: kernel (in, *split, H, D).

    The flat fused-qkv layout (in, 3*H*D) cannot shard heads with a plain
    PartitionSpec — its output dim is (which, head, dim)-major, so an
    8-way slice of the flat dim puts e.g. q-of-heads-0..2 on device 0 and
    XLA must re-gather the whole activation to split heads (observed: one
    (B, L, 3*hidden) all-gather per block on tp meshes). Keeping the
    kernel in (in, *split, H, D) form and sharding the H axis ("qkv_out"
    -> tp) makes the projection column-parallel per head: attention stays
    local to each tp shard, zero collectives until the out-proj.
    Weight conversion is a pure reshape of the torch fused weight
    (convert/torch_to_jax.py), so checkpoint compatibility is unchanged.
    """

    config: DiTConfig
    split: tuple  # () for q, (3,) for fused qkv, (2,) for context_kv
    use_bias: bool

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h, d = cfg.compute_heads, cfg.head_dim
        shape = (x.shape[-1], *self.split, h, d)
        axes = ("embed", *(None,) * len(self.split), "qkv_out", None)
        out_dims = tuple(range(1, len(shape)))
        dims = (((x.ndim - 1,), (0,)), ((), ()))
        if cfg.quantized:
            from f_lite_tpu.quant import quant_matmul

            w8 = self.param(
                "w8",
                nn.with_logical_partitioning(
                    lambda key, s, dtype=jnp.int8: jnp.zeros(s, dtype),
                    axes,
                ),
                shape, jnp.int8,
            )
            scale = self.param(
                "scale",
                nn.with_logical_partitioning(
                    nn.initializers.ones, axes[1:]
                ),
                shape[1:], jnp.float32,
            )
            y = quant_matmul(x, w8, scale)
        else:
            kernel = self.param(
                "kernel",
                nn.with_logical_partitioning(
                    nn.initializers.variance_scaling(
                        1.0, "fan_in", "truncated_normal",
                        in_axis=0, out_axis=out_dims,
                    ),
                    axes,
                ),
                shape, cfg.param_dtype,
            )
            y = jax.lax.dot_general(
                x, kernel.astype(cfg.dtype), dims,
                preferred_element_type=cfg.dtype,
            )
        if self.use_bias:
            bias = self.param(
                "bias",
                nn.with_logical_partitioning(
                    nn.initializers.zeros, axes[1:]
                ),
                shape[1:], cfg.param_dtype,
            )
            y = y + bias.astype(y.dtype)
        return y  # (B, L, *split, H, D)


def _dense(features, *, use_bias, name, kernel_axes, dtype, param_dtype,
           quant=False):
    if quant:
        return QuantDense(
            features, use_bias=use_bias, name=name,
            kernel_axes=kernel_axes, dtype=dtype, param_dtype=param_dtype,
        )
    return nn.Dense(
        features,
        use_bias=use_bias,
        name=name,
        dtype=dtype,
        param_dtype=param_dtype,
        kernel_init=nn.with_logical_partitioning(
            nn.initializers.lecun_normal(), kernel_axes
        ),
        bias_init=nn.initializers.zeros,
    )


def _zeros_dense(features, *, use_bias, name, kernel_axes, dtype, param_dtype):
    return nn.Dense(
        features,
        use_bias=use_bias,
        name=name,
        dtype=dtype,
        param_dtype=param_dtype,
        kernel_init=nn.with_logical_partitioning(
            nn.initializers.zeros, kernel_axes
        ),
        bias_init=nn.initializers.zeros,
    )


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    """Covers v1 / v2 / released variants via flags (SURVEY.md §0.1)."""

    in_channels: int = 16
    patch_size: int = 2
    hidden_size: int = 3072
    depth: int = 40
    num_heads: int = 12  # width // 256 per `pt.py:89` (not the report's 16)
    mlp_ratio: float = 4.0
    cross_attn_input_size: int = 4096
    train_bias_and_rms: bool = False  # qkv bias + trainable final RMS weight
    use_rope: bool = True
    rope_base: float = 10000.0
    dynamic_softmax_temperature: bool = False
    residual_v: bool = False
    adaln_mode: str = "shared"  # "shared" (v1) | "per_block" (v2)
    cross_attn_period: int = 4  # cross-attn when idx % period == 0 ...
    cross_attn_first_n: int = 8  # ... or idx < first_n  (`model.py:464`)
    cross_attn_all: bool = False  # v2: every block (`model_v2.py:468`)
    n_register_tokens: int = 16
    pos_embed_max_len: int = 2048  # only when use_rope=False
    # Serving-time head padding: compute attention with this many heads
    # (>= num_heads) so tensor-parallel degrees that don't divide
    # num_heads (7B: 10 heads, 10B: 12 — neither divides a v5e-8) still
    # shard evenly. EXACT for converted checkpoints: padded q/k/v heads
    # are all-zero, a zero head's attention output is zero (uniform
    # softmax over zero values), and its out-proj rows are zero — see
    # convert/torch_to_jax.py. head_dim stays hidden_size // num_heads.
    padded_heads: int | None = None
    scan_layers: bool = False  # lax.scan over layer stacks (see __call__)
    # GPipe-style pipeline parallelism over the periodic block region
    # (PipelineTrunk): >1 shards consecutive block groups over the mesh's
    # "pp" axis and streams `pipeline_microbatches` microbatches through
    # the stages. Requires scan_layers. Bubble fraction is
    # (pp-1)/(microbatches+pp-1).
    pipeline_stages: int = 1
    pipeline_microbatches: int = 1
    quantized: bool = False  # int8 W8A8 projections (inference)
    gradient_checkpoint: bool = False
    gradient_checkpoint_from: int = 8  # remat blocks >= this (`model.py:559`)
    # what remat saves: "full" saves only block inputs (max recompute,
    # min memory — the reference's torch.utils.checkpoint semantics);
    # "dots" saves weight-matmul outputs (jax
    # dots_with_no_batch_dims_saveable — recomputes only attention/
    # elementwise, ~2/3 of the bwd recompute FLOPs avoided for ~L*D
    # extra bytes/block)
    remat_policy: str = "full"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    use_pallas_attention: bool | None = None  # None = auto (TPU yes)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def compute_heads(self) -> int:
        """Heads the kernels/attention actually compute with (see
        `padded_heads`)."""
        if self.padded_heads is not None:
            if self.padded_heads < self.num_heads:
                raise ValueError("padded_heads must be >= num_heads")
            return self.padded_heads
        return self.num_heads

    def block_has_cross_attn(self, idx: int) -> bool:
        if self.cross_attn_all:
            return True
        return idx % self.cross_attn_period == 0 or idx < self.cross_attn_first_n

    @classmethod
    def f_lite_7b(cls, **overrides) -> "DiTConfig":
        """F-Lite-7B released config (README.md:42; width/depth per HF repo)."""
        kw = dict(hidden_size=2560, depth=40, num_heads=10, residual_v=True)
        kw.update(overrides)
        return cls(**kw)

    @classmethod
    def f_lite_10b(cls, **overrides) -> "DiTConfig":
        """F-Lite 10B released config (`pt.py:85-95`, tech report p.6)."""
        kw = dict(hidden_size=3072, depth=40, num_heads=12, residual_v=True)
        kw.update(overrides)
        return cls(**kw)


class Attention(nn.Module):
    """Self- or cross-attention (reference `model.py:133-223`).

    Fused qkv projection for self-attn; q + fused context_kv for cross-attn.
    Order of ops preserved exactly: rope -> dynamic temperature (k scale) ->
    QK-norm -> SDPA -> bias-free out proj. (The temperature scale before an
    RMS norm is a mathematical no-op; replicated for parity — SURVEY.md §7.3.)
    """

    config: DiTConfig
    is_self_attn: bool = True

    @nn.compact
    def __call__(self, x, *, context=None, context_mask=None, rope=None,
                 v_first=None, mix=None):
        cfg = self.config
        h, d = cfg.compute_heads, cfg.head_dim
        qkv_bias = cfg.train_bias_and_rms

        if self.is_self_attn:
            qkv = HeadProj(cfg, split=(3,), use_bias=qkv_bias,
                           name="qkv")(x)  # (B, L, 3, H, D)
            b, l = qkv.shape[:2]
            qkv = qkv.transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]  # (B, H, L, D)
            q = _constrain(q, ACT_BATCH, ACT_HEADS, None, None)
            k = _constrain(k, ACT_BATCH, ACT_HEADS, None, None)
            v = _constrain(v, ACT_BATCH, ACT_HEADS, None, None)
            if rope is not None:
                cos, sin = rope
                q = apply_rotary(q, cos, sin)
                k = apply_rotary(k, cos, sin)
                if cfg.dynamic_softmax_temperature:
                    # k *= sqrt(log L / log 1040) (`model.py:176-179`)
                    ratio = math.sqrt(math.log(l) / math.log(1040.0))
                    k = k * jnp.asarray(ratio, k.dtype)
            kv_mask = None
        else:
            q = HeadProj(cfg, split=(), use_bias=qkv_bias,
                         name="q")(x)  # (B, Lq, H, D)
            kv = HeadProj(cfg, split=(2,), use_bias=qkv_bias,
                          name="context_kv")(context)  # (B, Lk, 2, H, D)
            b, lq = q.shape[:2]
            lk = kv.shape[1]
            q = q.transpose(0, 2, 1, 3)
            kv = kv.transpose(2, 0, 3, 1, 4)
            k, v = kv[0], kv[1]
            q = _constrain(q, ACT_BATCH, ACT_HEADS, None, None)
            k = _constrain(k, ACT_BATCH, ACT_HEADS, None, None)
            v = _constrain(v, ACT_BATCH, ACT_HEADS, None, None)
            kv_mask = context_mask

        # Value residual (released models): mix this block's V with block 0's
        # V through a learnable per-block gate (arXiv:2410.17897; the in-repo
        # reference never defines it — see module docstring). `mix` is the
        # scan-mode selector (traced "am I past block 0" flag): under
        # lax.scan every block owns a lambda_v (block 0's is inert) and the
        # first-block case is selected at runtime instead of by structure.
        if cfg.residual_v and self.is_self_attn:
            if mix is None:
                if v_first is None:
                    v_first_out = v
                else:
                    lamb = self.param(
                        "lambda_v",
                        nn.with_logical_partitioning(
                            nn.initializers.constant(0.5), (None,)
                        ),
                        (1,), cfg.param_dtype,
                    )
                    lamb = lamb.astype(v.dtype)
                    v = lamb * v + (1.0 - lamb) * v_first
                    v_first_out = v_first
            else:
                lamb = self.param(
                    "lambda_v",
                    nn.with_logical_partitioning(
                        nn.initializers.constant(0.5), (None,)
                    ),
                    (1,), cfg.param_dtype,
                ).astype(v.dtype)
                mixed = lamb * v + (1.0 - lamb) * v_first
                v_first_out = jnp.where(mix, v_first, v)
                v = jnp.where(mix, mixed, v)
        else:
            v_first_out = v_first

        # Non-trainable QK-RMSNorm on head_dim (`model.py:115-131,158`).
        q = rms_norm(q)
        k = rms_norm(k)

        out = attention(
            q, k, v, kv_mask=kv_mask, scale=d**-0.5,
            use_pallas=cfg.use_pallas_attention,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, h * d)
        out = _constrain(out, ACT_BATCH, None, ACT_HEADS)
        out = _dense(
            cfg.hidden_size, use_bias=False, name="proj",
            kernel_axes=(HEADS_QKV, EMBED),
            dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            quant=cfg.quantized,
        )(out)
        out = _constrain(out, ACT_BATCH, ACT_SEQ, None)
        if self.is_self_attn and cfg.residual_v:
            return out, v_first_out
        return out


class SwiGLUMLP(nn.Module):
    """SwiGLU MLP: down(silu(gate(x)) * up(x)); names match liger's
    gate_proj/up_proj/down_proj for weight conversion (`model.py:260-267`)."""

    config: DiTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        inter = int(cfg.hidden_size * cfg.mlp_ratio)
        gate = _dense(
            inter, use_bias=False, name="gate_proj",
            kernel_axes=(EMBED, MLP), dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, quant=cfg.quantized,
        )(x)
        up = _dense(
            inter, use_bias=False, name="up_proj",
            kernel_axes=(EMBED, MLP), dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, quant=cfg.quantized,
        )(x)
        inter_act = _constrain(
            nn.silu(gate) * up, ACT_BATCH, None, ACT_MLP
        )
        out = _dense(
            cfg.hidden_size, use_bias=False, name="down_proj",
            kernel_axes=(MLP, EMBED), dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, quant=cfg.quantized,
        )(inter_act)
        return _constrain(out, ACT_BATCH, ACT_SEQ, None)


class RMSNormModule(nn.Module):
    """Learnable RMSNorm (liger-equivalent, fp32 accumulation)."""

    dim: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            nn.with_logical_partitioning(nn.initializers.ones, (None,)),
            (self.dim,), self.param_dtype,
        )
        return rms_norm(x, w)


class DiTBlock(nn.Module):
    """Pre-RMSNorm AdaLN block: self-attn, optional cross-attn, SwiGLU MLP.

    Reference `model.py:226-314`. `modulation` is a (B, 9, D) tensor of
    (shift, scale, gate) x (sa, ca, mlp), broadcast over tokens.
    """

    config: DiTConfig
    do_cross_attn: bool = False

    @nn.compact
    def __call__(self, x, context, context_mask, modulation, rope,
                 v_first=None, mix=None):
        cfg = self.config

        def mod(i):
            return modulation[:, i][:, None, :].astype(x.dtype)

        (shift_sa, scale_sa, gate_sa, shift_ca, scale_ca, gate_ca,
         shift_mlp, scale_mlp, gate_mlp) = (mod(i) for i in range(9))

        # residual stream: replicated over tp under the default rules
        # (Megatron layout — norms local, column-parallel inputs need no
        # gather); sequence-sharded over tp under SP_RULES
        x = _constrain(x, ACT_BATCH, ACT_SEQ, None)

        norm_x = RMSNormModule(cfg.hidden_size, cfg.param_dtype, name="norm1")(x)
        norm_x = norm_x * (1 + scale_sa) + shift_sa
        sa = Attention(cfg, is_self_attn=True, name="self_attn")(
            norm_x, rope=rope, v_first=v_first, mix=mix
        )
        if cfg.residual_v:
            attn_out, v_first = sa
        else:
            attn_out = sa
        x = x + attn_out * gate_sa

        if self.do_cross_attn:
            norm_x = RMSNormModule(
                cfg.hidden_size, cfg.param_dtype, name="norm2"
            )(x)
            norm_x = norm_x * (1 + scale_ca) + shift_ca
            ca = Attention(cfg, is_self_attn=False, name="cross_attn")(
                norm_x, context=context, context_mask=context_mask
            )
            x = x + ca * gate_ca

        norm_x = RMSNormModule(cfg.hidden_size, cfg.param_dtype, name="norm3")(x)
        norm_x = norm_x * (1 + scale_mlp) + shift_mlp
        x = x + SwiGLUMLP(cfg, name="mlp")(norm_x) * gate_mlp

        # pin the scan carry's layout too (the residual adds above are
        # outside the branch constraints; an unconstrained carry lets XLA
        # shard the loop state and re-gather every iteration)
        return _constrain(x, ACT_BATCH, ACT_SEQ, None), v_first


class ScanUnit(nn.Module):
    """One scan step over the layer stack: a tuple of DiTBlocks (a single
    cross block, or a (cross, plain, ..., plain) macro group).

    `scan_layers` trades the unrolled 40-block HLO for a `lax.scan` with
    stacked parameters — ~depth/unit-size smaller programs, much faster
    XLA compiles, identical math (verified against the unrolled layout).
    v1's heterogeneous pattern decomposes into two scans: first_n single
    cross blocks, then (depth-first_n)/period groups of period blocks.
    residual_v works under scan via the traced `mix` selector: every block
    owns a lambda_v (block 0's is inert) and Attention picks the
    first-block behavior at runtime (see Attention.__call__).
    """

    config: DiTConfig
    cross_pattern: tuple  # per-inner-block do_cross flags
    own_adaln: bool = False  # per_block mode: AdaLN head inside the unit
    idx_offset: int = 0  # global index of this scan's first block

    @nn.compact
    def __call__(self, carry, unit_idx, context, context_mask, mod_or_temb,
                 rope):
        cfg = self.config
        tokens, v_first = carry
        for j, dc in enumerate(self.cross_pattern):
            if self.own_adaln:
                modulation = AdaLNHead(cfg, 9, name=f"blk_{j}_adaLN")(
                    mod_or_temb
                )
            else:
                modulation = mod_or_temb
            if cfg.residual_v:
                global_idx = (
                    self.idx_offset + unit_idx * len(self.cross_pattern) + j
                )
                mix = global_idx > 0  # traced: mix V with block-0 V
            else:
                mix = None
            tokens, v_first = DiTBlock(
                cfg, do_cross_attn=dc, name=f"blk_{j}"
            )(tokens, context, context_mask, modulation, rope, v_first, mix)
        return (tokens, v_first), None


def _remat_policy(cfg):
    try:
        return {
            "full": None,
            "dots": jax.checkpoint_policies
            .dots_with_no_batch_dims_saveable,
        }[cfg.remat_policy]
    except KeyError:
        raise ValueError(
            f"remat_policy must be 'full' or 'dots', got "
            f"{cfg.remat_policy!r}"
        ) from None


def _make_scan(unit_cls, cfg, pattern, n_units, own_adaln, remat, name,
               idx_offset=0):
    if remat:
        unit_cls = nn.remat(
            unit_cls, prevent_cse=False, policy=_remat_policy(cfg)
        )
    scanned = nn.scan(
        unit_cls,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
        length=n_units,
        metadata_params={nn.meta.PARTITION_NAME: "layers"},
    )
    return scanned(cfg, cross_pattern=pattern, own_adaln=own_adaln,
                   idx_offset=idx_offset, name=name)


ACT_STAGE = "act_stage"


class PipelineStage(nn.Module):
    """One pipeline stage: `units` consecutive ScanUnits.

    `stage_id` is traced (the stages are vmapped, see PipelineTrunk), so
    the residual_v `mix` selector keeps working: the global block index is
    idx_offset + (stage_id*units + u)*len(pattern) + j.
    `mb_idx` selects this stage's current microbatch from the broadcast
    (num_mb, Bmb, ...) buffers — a local gather, the buffers are
    replicated over pp.
    """

    config: DiTConfig
    cross_pattern: tuple
    units: int
    own_adaln: bool
    idx_offset: int

    @nn.compact
    def __call__(self, carry, stage_id, mb_idx, ctx_buf, mask_buf, mod_buf,
                 rope):
        cfg = self.config
        take = lambda buf: jax.lax.dynamic_index_in_dim(
            buf, mb_idx, 0, keepdims=False
        )
        context = take(ctx_buf)
        context_mask = None if mask_buf is None else take(mask_buf)
        mod_or_temb = take(mod_buf)
        unit_idx = stage_id * self.units + jnp.arange(self.units)
        carry, _ = _make_scan(
            ScanUnit, cfg, self.cross_pattern, self.units, self.own_adaln,
            cfg.gradient_checkpoint, "blocks", idx_offset=self.idx_offset,
        )(carry, unit_idx, context, context_mask, mod_or_temb, rope)
        return carry


class _PipeStep(nn.Module):
    """One clock tick of the GPipe schedule: inject a fresh microbatch into
    stage 0, shift every stage's state to its right neighbor (XLA lowers
    the concat-of-shifted-shards on the pp-sharded axis to a
    collective-permute), run all stages in parallel (vmapped; each device
    computes its own stage), and collect the last stage's finished
    microbatch."""

    config: DiTConfig
    cross_pattern: tuple
    units: int
    own_adaln: bool
    idx_offset: int
    num_mb: int

    @nn.compact
    def __call__(self, carry, t, tokens_mb, v_mb, ctx_mb, mask_mb, mod_mb,
                 rope):
        cfg = self.config
        pp, num_mb = cfg.pipeline_stages, self.num_mb
        s_x, s_v, outputs = carry
        stage_ids = jnp.arange(pp)
        mb_idx = jnp.clip(t - stage_ids, 0, num_mb - 1)

        inj = jax.lax.dynamic_index_in_dim(
            tokens_mb, jnp.clip(t, 0, num_mb - 1), 0, keepdims=True
        )
        x_in = jnp.concatenate([inj, s_x[:-1]], axis=0)
        x_in = _constrain(x_in, ACT_STAGE, ACT_BATCH, ACT_SEQ, None)
        if s_v is not None:
            inj_v = jax.lax.dynamic_index_in_dim(
                v_mb, jnp.clip(t, 0, num_mb - 1), 0, keepdims=True
            )
            v_in = jnp.concatenate([inj_v, s_v[:-1]], axis=0)
            v_in = _constrain(
                v_in, ACT_STAGE, ACT_BATCH, ACT_HEADS, None, None
            )
        else:
            v_in = None

        stages = nn.vmap(
            PipelineStage,
            in_axes=(0, 0, 0, None, None, None, None),
            out_axes=0,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            metadata_params={nn.meta.PARTITION_NAME: "stage"},
        )(self.config, cross_pattern=self.cross_pattern, units=self.units,
          own_adaln=self.own_adaln, idx_offset=self.idx_offset,
          name="stages")
        s_x2, s_v2 = stages(
            (x_in, v_in), stage_ids, mb_idx, ctx_mb, mask_mb, mod_mb, rope
        )
        s_x2 = _constrain(s_x2, ACT_STAGE, ACT_BATCH, ACT_SEQ, None)

        # drain: store the last stage's output for microbatch t-(pp-1);
        # before the pipe is full (t < pp-1) rewrite slot 0 with itself
        o_idx = jnp.clip(t - (pp - 1), 0, num_mb - 1)
        last = jax.lax.dynamic_index_in_dim(s_x2, pp - 1, 0, keepdims=False)
        cur = jax.lax.dynamic_index_in_dim(outputs, o_idx, 0, keepdims=False)
        new = jnp.where(t >= pp - 1, last, cur)
        outputs = jax.lax.dynamic_update_index_in_dim(outputs, new, o_idx, 0)
        return (s_x2, s_v2, outputs), None


class PipelineTrunk(nn.Module):
    """GPipe-style pipeline parallelism over a uniform block region,
    expressed entirely in GSPMD (no hand-written collectives):

    - the region's ScanUnit parameters are vmapped over a leading `stage`
      axis (logical rule "stage" -> mesh "pp"), so each pp group holds
      n_units/pp blocks;
    - activations stream through stages as a (pp, Bmb, L, D) rotating
      state; the per-tick neighbor shift lowers to a collective-permute on
      the pp axis;
    - the tick loop is an nn.scan over num_mb + pp - 1 steps with
      broadcast params.

    The reference has no pipeline parallelism at all (FSDP only,
    `distributed.py:83-100`); this exists for pods where a 10B+ model's
    optimizer state exceeds what fsdp alone can hold per chip, or where
    fsdp all-gather bandwidth (DCN multi-slice) is the binding constraint.
    Math is exact per microbatch; outputs are identical to the plain scan
    trunk (tests/test_pipeline_parallel.py).
    """

    config: DiTConfig
    cross_pattern: tuple
    n_units: int
    own_adaln: bool
    idx_offset: int

    @nn.compact
    def __call__(self, tokens, v_first, context, context_mask, mod_or_temb,
                 rope):
        cfg = self.config
        pp, num_mb = cfg.pipeline_stages, cfg.pipeline_microbatches
        if self.n_units % pp:
            raise ValueError(
                f"pipeline_stages={pp} must divide the pipelined region's "
                f"{self.n_units} scan units"
            )
        b = tokens.shape[0]
        if b % num_mb:
            # params don't depend on num_mb, so off-recipe batches (init
            # traces with batch 1, eval-time image sampling with a handful
            # of prompts) degrade to the largest microbatch count that
            # divides b instead of failing — the configured num_mb only
            # governs the training batch it was sized for
            num_mb = next(
                k for k in range(min(num_mb, b), 0, -1) if b % k == 0
            )
            # loud, once per traced shape: if THIS is the training batch,
            # the recipe is wrong — fewer microbatches grow the GPipe
            # bubble to (pp-1)/(num_mb+pp-1) idle, and a tiny microbatch
            # may stop dividing the (dp, fsdp) extent, silently defeating
            # batch-axis activation sharding (_constrain drops the hint)
            import logging

            logging.getLogger("f_lite_tpu.models.dit").warning(
                "batch %d not divisible by pipeline_microbatches=%d — "
                "degrading this program to %d microbatch(es); expected "
                "for init/eval shapes, a misconfigured recipe if it is "
                "the training step", b, cfg.pipeline_microbatches, num_mb,
            )
        bmb = b // num_mb

        def mb(x):
            # strided sample->microbatch assignment (sample i -> mb
            # i % num_mb): a reshape+transpose that KEEPS the incoming
            # (dp, fsdp)-sharded batch axis as the sharded bmb axis —
            # zero resharding, unlike a contiguous split which would
            # scatter each microbatch across the batch shards. Microbatch
            # composition is irrelevant to training semantics (the loss
            # averages over the full batch) and the inverse transpose
            # below restores original sample order exactly.
            if x is None:
                return None
            x = x.reshape(bmb, num_mb, *x.shape[1:]).swapaxes(0, 1)
            return _constrain(x, "act_mb", ACT_BATCH,
                              *(None,) * (x.ndim - 2))

        tokens_mb = mb(tokens)
        v_mb = mb(v_first)
        ctx_mb = mb(context)
        mask_mb = mb(context_mask)
        mod_mb = mb(mod_or_temb)

        s_x = jnp.zeros((pp, bmb) + tokens.shape[1:], tokens.dtype)
        s_x = _constrain(s_x, ACT_STAGE, ACT_BATCH, ACT_SEQ, None)
        if v_first is not None:
            s_v = jnp.zeros((pp, bmb) + v_first.shape[1:], v_first.dtype)
            s_v = _constrain(
                s_v, ACT_STAGE, ACT_BATCH, ACT_HEADS, None, None
            )
        else:
            s_v = None
        outputs = jnp.zeros_like(tokens_mb)

        n_ticks = num_mb + pp - 1
        step = nn.scan(
            _PipeStep,
            variable_axes={},
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(0,) + (nn.broadcast,) * 6,
            length=n_ticks,
        )(cfg, cross_pattern=self.cross_pattern,
          units=self.n_units // pp, own_adaln=self.own_adaln,
          idx_offset=self.idx_offset, num_mb=num_mb, name="pipe")
        (s_x, s_v, outputs), _ = step(
            (s_x, s_v, outputs), jnp.arange(n_ticks), tokens_mb, v_mb,
            ctx_mb, mask_mb, mod_mb, rope,
        )
        # inverse of the strided microbatch split in mb(): restore
        # original sample order
        return outputs.swapaxes(0, 1).reshape(b, *tokens.shape[1:])


class TimestepEmbed(nn.Module):
    """sinusoidal(t*1000, D) -> Linear(D, 4D) -> SiLU -> Linear(4D, D).

    Reference `model.py:448-452,551-552`; param names linear_1/linear_2 map
    to torch `time_embed.0` / `time_embed.2`.
    """

    config: DiTConfig

    @nn.compact
    def __call__(self, t):
        cfg = self.config
        emb = timestep_embedding(t * 1000.0, cfg.hidden_size)
        emb = emb.astype(cfg.dtype)
        emb = _dense(
            4 * cfg.hidden_size, use_bias=True, name="linear_1",
            kernel_axes=(EMBED, MLP), dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
        )(emb)
        emb = nn.silu(emb)
        return _dense(
            cfg.hidden_size, use_bias=True, name="linear_2",
            kernel_axes=(MLP, EMBED), dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
        )(emb)


class AdaLNHead(nn.Module):
    """SiLU -> zero-init Linear(D, n*D), chunked to (B, n, D).

    Reference `model.py:454-456` (shared, n=9), `model.py:472` (final, n=2),
    `model_v2.py:269-271` (per-block, n=9). Zero init makes every modulated
    branch an identity at init — load-bearing for bf16 stability.
    """

    config: DiTConfig
    n_chunks: int

    @nn.compact
    def __call__(self, t_emb):
        cfg = self.config
        out = _zeros_dense(
            self.n_chunks * cfg.hidden_size, use_bias=True, name="linear",
            kernel_axes=(EMBED, MLP), dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
        )(nn.silu(t_emb))
        b = out.shape[0]
        return out.reshape(b, self.n_chunks, cfg.hidden_size)


class DiT(nn.Module):
    """The full denoiser. Input/output latents are NHWC.

    forward(x (B,H,W,C), context (B,S,Ctx), context_mask (B,S) bool|None,
    t (B,)) -> velocity (B,H,W,C). Reference `model.py:525-591` (the 4-arg
    forward; mask=None reproduces the released 3-arg HF forward,
    SURVEY.md §0.1.1).
    """

    config: DiTConfig

    @nn.compact
    def __call__(self, x, context, context_mask, t, token_indices=None):
        """token_indices (B, K) int32: *sequence dropout* — run the
        transformer on only these patch positions (tech report p.5: 50%
        dropout for hi-res training speedups; described but never
        implemented in the reference code). When given, the output is
        token-space (B, K, p*p*C) instead of an unpatchified image —
        pair with the same gather on the loss target."""
        cfg = self.config
        b, height, width, c = x.shape
        gh, gw = height // cfg.patch_size, width // cfg.patch_size

        # Canonicalize the context mask to prefix form (exact — attention
        # is permutation-invariant over keys), so the prefix-length Pallas
        # kernel is correct for ANY mask, not just right-padded ones.
        if context_mask is not None:
            context, context_mask = compact_context(context, context_mask)

        # Context projection + RMS norm (`model.py:527-528`).
        context = _dense(
            cfg.hidden_size, use_bias=True, name="context_proj",
            kernel_axes=(CTX, EMBED), dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
        )(context.astype(cfg.dtype))
        context = RMSNormModule(
            cfg.hidden_size, cfg.param_dtype, name="context_norm"
        )(context)

        # Patch embed as patchify + matmul (`model.py:318-331,533`).
        tokens = patchify(x.astype(cfg.dtype), cfg.patch_size)
        if token_indices is not None:
            tokens = jnp.take_along_axis(
                tokens, token_indices[..., None], axis=1
            )
        tokens = _dense(
            cfg.hidden_size, use_bias=True, name="patch_proj",
            kernel_axes=(CTX, EMBED), dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
        )(tokens)

        # Register tokens prepended (`model.py:446,535`).
        reg = self.param(
            "register_tokens",
            nn.with_logical_partitioning(
                nn.initializers.normal(stddev=1.0), (None, None, EMBED)
            ),
            (1, cfg.n_register_tokens, cfg.hidden_size), cfg.param_dtype,
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(reg, (b, *reg.shape[1:])).astype(cfg.dtype),
             tokens],
            axis=1,
        )
        # residual-stream layout from the start (scan carries inherit
        # their entry sharding; see DiTBlock)
        tokens = _constrain(tokens, ACT_BATCH, ACT_SEQ, None)

        if cfg.use_rope:
            rope = rope_2d_freqs(
                cfg.head_dim, gh, gw, base=cfg.rope_base,
                n_register_tokens=cfg.n_register_tokens,
            )
            if token_indices is not None:
                # gather per-batch rope rows for the kept patches; register
                # rows (identity rotation) stay prepended
                nreg = cfg.n_register_tokens
                cos, sin = rope
                def _gather(tab):
                    img = jnp.take(tab[nreg:], token_indices, axis=0)
                    reg = jnp.broadcast_to(
                        tab[None, :nreg], (b, nreg, tab.shape[-1])
                    )
                    return jnp.concatenate([reg, img], axis=1)
                rope = (_gather(cos), _gather(sin))
        else:
            pos = self.param(
                "positional_embedding",
                nn.with_logical_partitioning(
                    nn.initializers.zeros, (None, None, EMBED)
                ),
                (1, cfg.pos_embed_max_len, cfg.hidden_size), cfg.param_dtype,
            )
            if token_indices is not None:
                nreg = cfg.n_register_tokens
                pos_img = jnp.take(
                    pos[0, nreg : nreg + gh * gw], token_indices, axis=0
                )
                pos_full = jnp.concatenate(
                    [jnp.broadcast_to(pos[:, :nreg], (b, nreg,
                                                      cfg.hidden_size)),
                     pos_img],
                    axis=1,
                )
                tokens = tokens + pos_full.astype(cfg.dtype)
            else:
                tokens = tokens + pos[:, : tokens.shape[1], :].astype(
                    cfg.dtype
                )
            rope = None

        # Timestep embedding + shared modulation (`model.py:551-556`).
        t_emb = TimestepEmbed(cfg, name="time_embed")(t)
        if cfg.adaln_mode == "shared":
            modulation = AdaLNHead(cfg, 9, name="adaLN_modulation")(t_emb)
        else:
            modulation = None  # per-block heads below

        if cfg.pipeline_stages > 1 and not cfg.scan_layers:
            raise ValueError("pipeline_stages > 1 requires scan_layers")
        if cfg.pipeline_stages > 1 and token_indices is not None:
            raise ValueError(
                "pipeline_stages > 1 is incompatible with sequence "
                "dropout (token_indices) — rope becomes per-sample"
            )
        if cfg.scan_layers:
            own_adaln = cfg.adaln_mode == "per_block"
            mod_or_temb = t_emb if own_adaln else modulation
            if cfg.residual_v:
                # v_first carried through the scan; block 0 selected by the
                # traced `mix` flag (see Attention)
                v_first = jnp.zeros(
                    (b, cfg.compute_heads, tokens.shape[1], cfg.head_dim),
                    cfg.dtype,
                )
            else:
                v_first = None
            carry = (tokens, v_first)
            if cfg.cross_attn_all:
                if cfg.pipeline_stages > 1:
                    tokens = PipelineTrunk(
                        cfg, cross_pattern=(True,), n_units=cfg.depth,
                        own_adaln=own_adaln, idx_offset=0,
                        name="blocks_all",
                    )(tokens, v_first, context, context_mask, mod_or_temb,
                      rope)
                    carry = (tokens, None)
                else:
                    carry, _ = _make_scan(
                        ScanUnit, cfg, (True,), cfg.depth, own_adaln,
                        cfg.gradient_checkpoint, "blocks_all",
                    )(carry, jnp.arange(cfg.depth), context, context_mask,
                      mod_or_temb, rope)
            else:
                first_n = min(cfg.cross_attn_first_n, cfg.depth)
                rest = cfg.depth - first_n
                if rest % cfg.cross_attn_period != 0:
                    raise ValueError(
                        "scan_layers requires (depth - first_n) divisible "
                        "by cross_attn_period"
                    )
                carry, _ = _make_scan(
                    ScanUnit, cfg, (True,), first_n, own_adaln,
                    False, "blocks_front",  # ref remats only idx >= 8
                )(carry, jnp.arange(first_n), context, context_mask,
                  mod_or_temb, rope)
                n_units = rest // cfg.cross_attn_period
                if n_units:
                    # the per-unit cross pattern is the same for every unit
                    # (i % period is invariant under i -> i + period)
                    pattern = tuple(
                        cfg.block_has_cross_attn(first_n + j)
                        for j in range(cfg.cross_attn_period)
                    )
                    if cfg.pipeline_stages > 1:
                        # v1: only the periodic region is pipelined; the
                        # front cross blocks above are structurally
                        # different and stay replicated over pp
                        tokens = PipelineTrunk(
                            cfg, cross_pattern=pattern, n_units=n_units,
                            own_adaln=own_adaln, idx_offset=first_n,
                            name="blocks_rest",
                        )(carry[0], carry[1], context, context_mask,
                          mod_or_temb, rope)
                        carry = (tokens, None)
                    else:
                        carry, _ = _make_scan(
                            ScanUnit, cfg, pattern, n_units, own_adaln,
                            cfg.gradient_checkpoint, "blocks_rest",
                            idx_offset=first_n,
                        )(carry, jnp.arange(n_units), context, context_mask,
                          mod_or_temb, rope)
            tokens = carry[0]
        else:
            v_first = None
            for idx in range(cfg.depth):
                do_cross = cfg.block_has_cross_attn(idx)
                if cfg.adaln_mode == "per_block":
                    block_mod = AdaLNHead(
                        cfg, 9, name=f"blocks_{idx}_adaLN"
                    )(t_emb)
                else:
                    block_mod = modulation

                # Remat blocks >= gradient_checkpoint_from, like the
                # reference's checkpointing on blocks >= 8
                # (`model.py:559-567`).
                block_cls = DiTBlock
                if (
                    cfg.gradient_checkpoint
                    and idx >= cfg.gradient_checkpoint_from
                ):
                    block_cls = nn.remat(
                        DiTBlock, prevent_cse=False,
                        policy=_remat_policy(cfg),
                    )
                tokens, v_first = block_cls(
                    cfg, do_cross_attn=do_cross, name=f"blocks_{idx}"
                )(tokens, context, context_mask, block_mod, rope, v_first)

        # Drop registers; final modulation + zero-init proj (`model.py:575-581`).
        # (gather back to replicated here: the register slice is offset by
        # n_register_tokens, which would force a resharding halo anyway,
        # and the final norm/proj is a one-time epilogue)
        tokens = _constrain(tokens, ACT_BATCH, None, None)
        tokens = tokens[:, cfg.n_register_tokens :, :]
        final_mod = AdaLNHead(cfg, 2, name="final_modulation")(t_emb)
        # modulation is tiny (B, 2, h): gather it replicated here rather
        # than letting its tp-sharded head re-shard the final norm/proj
        final_mod = _constrain(final_mod, ACT_BATCH, None, None)
        final_shift = final_mod[:, 0][:, None, :].astype(cfg.dtype)
        final_scale = final_mod[:, 1][:, None, :].astype(cfg.dtype)

        if cfg.train_bias_and_rms:
            tokens = RMSNormModule(
                cfg.hidden_size, cfg.param_dtype, name="final_norm"
            )(tokens)
        else:
            tokens = rms_norm(tokens)
        tokens = tokens * (1 + final_scale) + final_shift
        tokens = _zeros_dense(
            cfg.patch_size * cfg.patch_size * cfg.in_channels,
            use_bias=True, name="final_proj", kernel_axes=(EMBED, CTX),
            dtype=cfg.dtype, param_dtype=cfg.param_dtype,
        )(tokens)

        if token_indices is not None:
            return tokens  # token-space (B, K, p*p*C) under sequence dropout
        return unpatchify(tokens, gh, gw, cfg.patch_size, cfg.in_channels)

    def init_params(self, rng, *, text_len: int = 32, image_size: int = 64):
        """Convenience: init with tiny dummy shapes (shapes don't matter)."""
        cfg = self.config
        x = jnp.zeros((1, image_size, image_size, cfg.in_channels), cfg.dtype)
        ctx = jnp.zeros((1, text_len, cfg.cross_attn_input_size), cfg.dtype)
        mask = jnp.ones((1, text_len), jnp.bool_)
        t = jnp.zeros((1,), jnp.float32)
        # Unbox the logical-partitioning metadata: training/inference code
        # works with plain arrays; sharding specs are derived separately via
        # nn.get_partition_spec over an eval_shape (parallel/sharding.py).
        return nn.meta.unbox(self.init(rng, x, ctx, mask, t))
