"""Flow-matching training loss with CFG dropout and timestep-decile binning.

Reference: `forward()` in `/root/reference/f_lite/train.py:353-499`:
- timesteps: 90% resolution-shifted sigmoid-normal + 10% uniform
  (`train.py:438-449`);
- 5% caption-embedding zero-out for CFG (1% on the precomputed path), with
  the attention mask set to all-ones for dropped captions
  (`train.py:423-425`, `precomputed_utils.py:210`);
- interpolate z_t = (1-t) x + t n; velocity target v = x - n;
- MSE in patchified (p=2) token space, per-sample mean then batch mean
  (`train.py:464-479`);
- per-decile loss binning for diagnostics (`train.py:485-493`).

Inputs are VAE-normalized latents (models/vae.normalize_latents applied by
the caller). All reductions in fp32.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from f_lite_tpu.ops.patching import patchify
from f_lite_tpu.ops.timesteps import sample_train_timesteps


class LossAux(NamedTuple):
    diffusion_loss: jax.Array        # scalar
    per_sample_loss: jax.Array       # (B,)
    timesteps: jax.Array             # (B,)
    bin_sums: jax.Array              # (10,) per-decile loss sums
    bin_counts: jax.Array            # (10,)


def flow_matching_loss(
    dit_apply: Callable,
    params: Any,
    rng: jax.Array,
    latents: jax.Array,       # (B, h, w, C) normalized VAE latents
    context: jax.Array,       # (B, S, Ctx)
    context_mask: jax.Array | None,
    *,
    uncond_prob: float = 0.05,
    patch_size: int = 2,
    token_keep_ratio: float = 1.0,   # sequence dropout (tech report p.5)
    timesteps: jax.Array | None = None,   # injectable for tests/parity
    noise: jax.Array | None = None,
    sample_weight: jax.Array | None = None,  # (B,) 0/1 — bs_rampup mask
) -> tuple[jax.Array, LossAux]:
    b, h, w, c = latents.shape
    k_drop, k_t, k_noise, k_tok = jax.random.split(rng, 4)

    # CFG caption dropout (`train.py:423-425`)
    if uncond_prob > 0:
        drop = jax.random.uniform(k_drop, (b,)) < uncond_prob
        context = jnp.where(drop[:, None, None], 0.0, context)
        if context_mask is not None:
            context_mask = jnp.where(
                drop[:, None], jnp.ones_like(context_mask), context_mask
            )

    if timesteps is None:
        timesteps = sample_train_timesteps(k_t, b, h * w)
    if noise is None:
        noise = jax.random.normal(k_noise, latents.shape, jnp.float32)

    t = timesteps.astype(jnp.float32)[:, None, None, None]
    x = latents.astype(jnp.float32)
    z_t = x * (1.0 - t) + noise * t
    v_target = x - noise

    n_patches = (h // patch_size) * (w // patch_size)
    token_indices = None
    if token_keep_ratio < 1.0:
        # sequence dropout: train on a random subset of image tokens
        # (tech report p.5: "50% sequence dropout" for hi-res speedups;
        # never implemented in the reference code). Per-sample random
        # subset, same static count K for jit.
        keep = max(1, int(n_patches * token_keep_ratio))
        scores = jax.random.uniform(k_tok, (b, n_patches))
        token_indices = jnp.argsort(scores, axis=1)[:, :keep]

    if token_indices is None:
        pred = dit_apply(
            params,
            z_t.astype(latents.dtype),
            context,
            context_mask,
            timesteps.astype(latents.dtype),
        )
        targ_tok = patchify(v_target, patch_size)
        pred_tok = patchify(pred.astype(jnp.float32), patch_size)
    else:
        pred_tok = dit_apply(
            params,
            z_t.astype(latents.dtype),
            context,
            context_mask,
            timesteps.astype(latents.dtype),
            token_indices,
        ).astype(jnp.float32)
        targ_tok = jnp.take_along_axis(
            patchify(v_target, patch_size), token_indices[..., None], axis=1
        )
    per_sample = jnp.mean((targ_tok - pred_tok) ** 2, axis=(1, 2))  # (B,)
    if sample_weight is None:
        loss = per_sample.mean()
        weight = jnp.ones_like(per_sample)
    else:
        # batch-size rampup (`train.py:428-433`): the reference drops
        # samples (dynamic shapes — recompile per size on TPU); weighting
        # the static-shape loss by a 0/1 mask has the same gradient
        weight = sample_weight.astype(jnp.float32)
        loss = jnp.sum(per_sample * weight) / jnp.maximum(
            jnp.sum(weight), 1.0
        )

    # decile binning (`train.py:485-493`): bin = min(int(t*10), 9)
    bins = jnp.minimum((timesteps * 10).astype(jnp.int32), 9)
    bin_sums = jax.ops.segment_sum(
        per_sample * weight, bins, num_segments=10
    )
    bin_counts = jax.ops.segment_sum(weight, bins, num_segments=10)

    return loss, LossAux(
        diffusion_loss=loss,
        per_sample_loss=per_sample,
        timesteps=timesteps,
        bin_sums=bin_sums,
        bin_counts=bin_counts,
    )
