"""Classifier-free guidance and APG (Augmented Parallel Guidance) combines.

Reference: `f_lite/pipeline.py:276-290`.

CFG:  u + g * (c - u).
APG:  decompose (c - u) into components parallel / orthogonal to c using a
*global scalar* projection over the entire batch tensor —
`(dy*dd).sum() / (dy*dy).sum()` — then clamp the orthogonal component's
(global) std to `orthogonal_threshold` and return `c + (g-1) * orth`.
The global (not per-sample) reduction is a deliberate reference semantic;
we preserve it bit-for-bit and document it here.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class APGConfig:
    """APG configuration (reference `f_lite/pipeline.py:25-30`)."""

    enabled: bool = True
    orthogonal_threshold: float = 0.03


def cfg_combine(
    uncond: jax.Array, cond: jax.Array, guidance_scale: float
) -> jax.Array:
    """Standard CFG: u + g * (c - u)."""
    return uncond + guidance_scale * (cond - uncond)


def apg_combine(
    uncond: jax.Array,
    cond: jax.Array,
    guidance_scale: float,
    orthogonal_threshold: float = 0.03,
) -> jax.Array:
    """APG combine. Reductions are global across the whole tensor, matching
    reference `f_lite/pipeline.py:276-287`."""
    dy = cond.astype(jnp.float32)
    dd = dy - uncond.astype(jnp.float32)
    parallel = (dy * dd).sum() / (dy * dy).sum() * dy
    orth = dd - parallel
    orth_std = jnp.std(orth)
    orth_scale = jnp.minimum(1.0, orthogonal_threshold / orth_std)
    out = dy + (guidance_scale - 1.0) * orth * orth_scale
    return out.astype(cond.dtype)


def guidance_combine(
    uncond: jax.Array,
    cond: jax.Array,
    guidance_scale: float,
    apg: APGConfig | None = None,
) -> jax.Array:
    if apg is not None and apg.enabled:
        return apg_combine(uncond, cond, guidance_scale, apg.orthogonal_threshold)
    return cfg_combine(uncond, cond, guidance_scale)
