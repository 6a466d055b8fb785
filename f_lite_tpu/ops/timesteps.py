"""Timestep embeddings, the resolution-shift map, and train-time t sampling.

Reference semantics:
- sinusoidal embedding of `t * 1000`, cos-half then sin-half
  (`f_lite/model.py:20-28`, applied at `model.py:551`).
- resolution shift `t <- t * a / (1 + (a - 1) * t)` with
  `a = 2 * sqrt(latent_h * latent_w / 64^2)` (`f_lite/pipeline.py:239-257`,
  `f_lite/train.py:438-449`).
- training timesteps: 90% sigmoid(N(0,1)) pushed through the shift map,
  10% uniform (`f_lite/train.py:443-449`).

Everything here is a pure function of arrays + static ints; safe under jit.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def timestep_embedding(
    t: jax.Array, dim: int, *, max_period: float = 10000.0
) -> jax.Array:
    """Sinusoidal embedding of shape (B, dim): [cos(t*f) | sin(t*f)], fp32.

    Matches reference `f_lite/model.py:20-28` (cos first, then sin; the
    frequency table is exp(-ln(max_period) * i / half) for i in [0, half)).
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def resolution_alpha(image_token_size: int) -> float:
    """`alpha = 2 * sqrt(hw / 64^2)` — the resolution shift strength.

    `image_token_size` is latent_h * latent_w (reference
    `f_lite/pipeline.py:240-242`).
    """
    return 2.0 * math.sqrt(image_token_size / (64.0 * 64.0))


def shift_t(t, alpha):
    """Resolution-shifted timestep: `t * a / (1 + (a - 1) * t)`."""
    return t * alpha / (1.0 + (alpha - 1.0) * t)


def euler_timestep_pairs(num_steps: int, alpha: float) -> jax.Array:
    """All (t, t_next) pairs of the descending Euler schedule, shape (N, 2).

    Step i of the reference loop (`f_lite/pipeline.py:250-257`) uses
    t = shift(i/N), t_next = shift((i-1)/N) for i = N..1.
    """
    i = jnp.arange(num_steps, 0, -1, dtype=jnp.float32)
    t = shift_t(i / num_steps, alpha)
    t_next = shift_t((i - 1.0) / num_steps, alpha)
    return jnp.stack([t, t_next], axis=-1)


def sample_train_timesteps(
    rng: jax.Array, batch_size: int, image_token_size: int
) -> jax.Array:
    """Train-time t: 90% shifted sigmoid-normal + 10% uniform, fp32 in (0,1).

    Matches reference `f_lite/train.py:438-449`.
    """
    k_norm, k_unif_mask, k_unif = jax.random.split(rng, 3)
    alpha = resolution_alpha(image_token_size)
    z = jax.random.normal(k_norm, (batch_size,), dtype=jnp.float32)
    t_sig = jax.nn.sigmoid(z)
    t_shifted = shift_t(t_sig, alpha)
    do_uniform = (
        jax.random.uniform(k_unif_mask, (batch_size,), dtype=jnp.float32) < 0.1
    )
    uniform = jax.random.uniform(k_unif, (batch_size,), dtype=jnp.float32)
    return jnp.where(do_uniform, uniform, t_shifted)
