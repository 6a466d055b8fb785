"""CFG-batched Euler flow-matching sampler as one `lax.scan` under `jit`.

Reference hot loop: `f_lite/pipeline.py:250-297` — a Python loop launching a
CUDA graph per step. TPU-native design (SURVEY.md §7.1, BASELINE.json north
star): the entire denoise trajectory is a `lax.scan` over the precomputed
(t, t_next) schedule inside a single jit — one compilation, zero host
round-trips, latents donated.

Semantics preserved:
- descending schedule i = N..1 with the resolution-shift map
  (`pipeline.py:252-257`);
- CFG batched in ONE forward: latents duplicated, context = [neg, pos]
  (`pipeline.py:262-274`) — uncond first, like the reference;
- APG or standard CFG combine (`pipeline.py:276-290`);
- update z += (t - t_next) * v (`pipeline.py:296-297`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from f_lite_tpu.ops.guidance import APGConfig, guidance_combine
from f_lite_tpu.ops.timesteps import euler_timestep_pairs, resolution_alpha


@dataclasses.dataclass(frozen=True)
class DenoiseSettings:
    """Static sampler settings (part of the jit cache key)."""

    num_inference_steps: int = 30
    guidance_scale: float = 6.0
    apg: APGConfig | None = None
    alpha: float | None = None  # None: derive from latent h*w


def denoise(
    dit_apply: Callable,
    params: Any,
    latents: jax.Array,
    prompt_embeds: jax.Array,
    negative_embeds: jax.Array,
    context_mask: jax.Array | None,
    settings: DenoiseSettings,
) -> jax.Array:
    """Run the full Euler denoise loop. latents: (B, h, w, C) NHWC.

    `dit_apply(params, x, context, context_mask, t)` is the model forward
    (typically `DiT(config).apply`). prompt/negative embeds: (B, S, Ctx).
    """
    b, lh, lw, _ = latents.shape
    alpha = settings.alpha
    if alpha is None:
        alpha = resolution_alpha(lh * lw)

    do_cfg = settings.guidance_scale >= 1.0
    schedule = euler_timestep_pairs(settings.num_inference_steps, alpha)

    if do_cfg:
        # [neg | pos] context, like `pipeline.py:266`
        context = jnp.concatenate([negative_embeds, prompt_embeds], axis=0)
        if context_mask is not None:
            context_mask = jnp.concatenate([context_mask, context_mask], axis=0)
    else:
        context = prompt_embeds

    def step(z, t_pair):
        t, t_next = t_pair[0], t_pair[1]
        dt = (t - t_next).astype(jnp.float32)
        if do_cfg:
            z_in = jnp.concatenate([z, z], axis=0)
            t_in = jnp.full((2 * b,), t, z.dtype)
            out = dit_apply(params, z_in, context, context_mask, t_in)
            uncond, cond = out[:b], out[b:]
            v = guidance_combine(
                uncond, cond, settings.guidance_scale, settings.apg
            )
        else:
            t_in = jnp.full((b,), t, z.dtype)
            v = dit_apply(params, z, context, context_mask, t_in)
        z = z + dt * v.astype(jnp.float32)
        return z, None

    z32 = latents.astype(jnp.float32)
    z_final, _ = jax.lax.scan(step, z32, schedule)
    return z_final.astype(latents.dtype)


def _denoise_schedule(
    dit_apply, params, latents, prompt_embeds, negative_embeds,
    context_mask, schedule, settings: DenoiseSettings,
):
    """Core scan over an explicit (t, t_next) schedule slice."""
    b = latents.shape[0]
    do_cfg = settings.guidance_scale >= 1.0
    if do_cfg:
        context = jnp.concatenate([negative_embeds, prompt_embeds], axis=0)
        if context_mask is not None:
            context_mask = jnp.concatenate(
                [context_mask, context_mask], axis=0
            )
    else:
        context = prompt_embeds

    def step(z, t_pair):
        t, t_next = t_pair[0], t_pair[1]
        dt = (t - t_next).astype(jnp.float32)
        if do_cfg:
            z_in = jnp.concatenate([z, z], axis=0)
            t_in = jnp.full((2 * b,), t, z.dtype)
            out = dit_apply(params, z_in, context, context_mask, t_in)
            v = guidance_combine(
                out[:b], out[b:], settings.guidance_scale, settings.apg
            )
        else:
            t_in = jnp.full((b,), t, z.dtype)
            v = dit_apply(params, z, context, context_mask, t_in)
        return z + dt * v.astype(jnp.float32), None

    z_final, _ = jax.lax.scan(step, latents.astype(jnp.float32), schedule)
    return z_final


def make_denoise_fn(
    dit_apply: Callable,
    settings: DenoiseSettings,
    donate: bool = True,
    steps_per_dispatch: int | None = None,
):
    """jit-compiled denoise closure; latents buffer donated.

    `steps_per_dispatch`: split the trajectory into several device
    dispatches of at most this many steps (one compilation — the schedule
    slice is a traced argument). Use when a single long dispatch is
    undesirable (execution watchdogs on some runtimes, or to interleave
    host work); None = the whole trajectory in one dispatch.
    """
    if steps_per_dispatch is None:
        fn = partial(denoise, dit_apply)

        def wrapped(params, latents, prompt_embeds, negative_embeds,
                    context_mask):
            return fn(
                params, latents, prompt_embeds, negative_embeds,
                context_mask, settings,
            )

        return jax.jit(wrapped, donate_argnums=(1,) if donate else ())

    runner = jax.jit(
        lambda params, z, pos, neg, mask, schedule: _denoise_schedule(
            dit_apply, params, z, pos, neg, mask, schedule, settings
        ),
        donate_argnums=(1,),
    )

    def chunked(params, latents, prompt_embeds, negative_embeds,
                context_mask):
        lh, lw = latents.shape[1], latents.shape[2]
        alpha = settings.alpha
        if alpha is None:
            alpha = resolution_alpha(lh * lw)
        schedule = euler_timestep_pairs(
            settings.num_inference_steps, alpha
        )
        n = settings.num_inference_steps
        k = steps_per_dispatch
        # pad to a multiple of k with zero-dt pairs (no-op steps) so every
        # dispatch reuses one compiled shape
        pad = (-n) % k
        if pad:
            last_t = schedule[-1, 1]
            schedule = jnp.concatenate(
                [schedule,
                 jnp.broadcast_to(jnp.stack([last_t, last_t]), (pad, 2))],
                axis=0,
            )
        out_dtype = latents.dtype
        # explicit copy: astype to the same dtype aliases, and the runner
        # donates its z argument
        z = jnp.array(latents, jnp.float32, copy=True)
        for s in range(0, n + pad, k):
            z = runner(params, z, prompt_embeds, negative_embeds,
                       context_mask, schedule[s : s + k])
        return z.astype(out_dtype)

    return chunked
