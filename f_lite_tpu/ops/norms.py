"""RMS normalization primitives.

TPU-native equivalents of the reference's norm stack:
- `RMSNorm` (fp32 accumulation, optional learnable weight) — reference
  `f_lite/model.py:92-112`.
- QK-norm (independent q/k RMSNorm on head_dim, non-trainable) — reference
  `f_lite/model.py:115-131`.
- The per-block norms use liger's fused Triton RMSNorm in the reference
  (`f_lite/model.py:238,248,260`); on TPU, XLA fuses the rsqrt/mul chain into
  adjacent matmuls, so a plain jnp expression is the speed-of-light impl.

All norms compute in float32 and cast back to the input dtype, matching the
reference's explicit `.float()` upcast.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(
    x: jax.Array,
    weight: jax.Array | None = None,
    *,
    eps: float = 1e-6,
) -> jax.Array:
    """RMS-normalize the last axis in fp32, optionally scaling by `weight`."""
    x32 = x.astype(jnp.float32)
    rrms = jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    y = x32 * rrms
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    return y.astype(x.dtype)


def qk_norm(
    q: jax.Array,
    k: jax.Array,
    *,
    q_weight: jax.Array | None = None,
    k_weight: jax.Array | None = None,
    eps: float = 1e-6,
) -> tuple[jax.Array, jax.Array]:
    """Independently RMS-normalize q and k over head_dim (Flux-style QK-norm)."""
    return (
        rms_norm(q, q_weight, eps=eps),
        rms_norm(k, k_weight, eps=eps),
    )
