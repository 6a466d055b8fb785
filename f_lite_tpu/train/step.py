"""Sharded train-step construction: params + optimizer state on the mesh,
one jitted step = loss -> grad -> clip -> adamw -> new state.

Equivalent to the reference's per-step path `forward() -> backward() ->
clip_grad_norm_ -> optimizer.step()` (`train.py:1006-1019`) under FSDP2 —
here expressed once and compiled: XLA SPMD schedules the fsdp all-gathers /
reduce-scatters and dp all-reduces that NCCL did imperatively. Sharding
propagates from the committed placement of `state.params` (see
parallel/sharding.py); no per-collective code is needed.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from f_lite_tpu.train.loss import flow_matching_loss


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
    )


def build_step_fn(
    dit_apply: Callable,
    optimizer: optax.GradientTransformation,
    *,
    uncond_prob: float = 0.05,
    patch_size: int = 2,
    token_keep_ratio: float = 1.0,
):
    """Raw (unjitted) `step(state, rng, latents, context, mask)`."""

    def step_fn(state: TrainState, rng, latents, context, context_mask,
                sample_weight=None):
        def loss_fn(params):
            return flow_matching_loss(
                dit_apply, params, rng, latents, context, context_mask,
                uncond_prob=uncond_prob, patch_size=patch_size,
                token_keep_ratio=token_keep_ratio,
                sample_weight=sample_weight,
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        grad_norm = optax.global_norm(grads)
        metrics = {
            "loss": loss,
            "diffusion_loss": aux.diffusion_loss,
            "grad_norm": grad_norm,
            "bin_sums": aux.bin_sums,
            "bin_counts": aux.bin_counts,
        }
        return (
            TrainState(step=state.step + 1, params=params,
                       opt_state=opt_state),
            loss,
            metrics,
        )

    return step_fn


def make_train_step(dit_apply, optimizer, *, donate: bool = True, **kw):
    """Jitted step; state sharding (if any) propagates from its placement."""
    fn = build_step_fn(dit_apply, optimizer, **kw)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())
