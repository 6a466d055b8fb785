"""2D rotary position embeddings for patch grids, plus register-token identity.

Reference: `TwoDimRotary` (`f_lite/model.py:334-400`) precomputes a 512x512
fp32 table as a buffer and slices it per forward. On TPU the table would burn
HBM bandwidth for no reason — the (h, w) grid is static under jit, so we build
exactly the needed cos/sin at trace time; XLA constant-folds it.

Semantics preserved exactly:
- per-axis frequency table `1 / base**(i / dim)` for even i in [0, dim)
  where dim = head_dim // 2 (`model.py:342`);
- rows = H frequencies, cols = W frequencies, concatenated on the last axis
  to (h*w, head_dim // 2) (`model.py:347-351`);
- register tokens get identity rotation (cos=1, sin=0) *prepended*
  (`model.py:370-385`);
- rotation applied rotate-half style in fp32: for x = [x1 | x2],
  y1 = x1*cos + x2*sin, y2 = -x1*sin + x2*cos (`model.py:403-414`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_2d_freqs(
    head_dim: int,
    h: int,
    w: int,
    *,
    base: float = 10000.0,
    n_register_tokens: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables of shape (n_register + h*w, head_dim // 2), fp32."""
    dim = head_dim // 2  # rotary dim per spatial axis pair
    inv_freq = 1.0 / (
        base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    )  # (dim // 2,)
    t_h = jnp.arange(h, dtype=jnp.float32)
    t_w = jnp.arange(w, dtype=jnp.float32)
    freqs_h = jnp.einsum("h,d->hd", t_h, inv_freq)  # (h, dim//2)
    freqs_w = jnp.einsum("w,d->wd", t_w, inv_freq)  # (w, dim//2)
    # (h, w, dim//2) each, concatenated -> (h, w, dim)
    freqs = jnp.concatenate(
        [
            jnp.broadcast_to(freqs_h[:, None, :], (h, w, freqs_h.shape[-1])),
            jnp.broadcast_to(freqs_w[None, :, :], (h, w, freqs_w.shape[-1])),
        ],
        axis=-1,
    ).reshape(h * w, dim)
    cos = jnp.cos(freqs)
    sin = jnp.sin(freqs)
    if n_register_tokens > 0:
        cos = jnp.concatenate(
            [jnp.ones((n_register_tokens, dim), jnp.float32), cos], axis=0
        )
        sin = jnp.concatenate(
            [jnp.zeros((n_register_tokens, dim), jnp.float32), sin], axis=0
        )
    return cos, sin


def apply_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate-half RoPE in fp32. x: (B, H, T, D); cos/sin: (T, D // 2) or
    per-batch (B, T, D // 2) (sequence-dropout gathers)."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    if cos.ndim == 3:  # (B, T, d/2) -> broadcast over heads
        cos = cos[:, None, :, :]
        sin = sin[:, None, :, :]
    d = x32.shape[-1] // 2
    x1, x2 = x32[..., :d], x32[..., d:]
    y1 = x1 * cos + x2 * sin
    y2 = -x1 * sin + x2 * cos
    return jnp.concatenate([y1, y2], axis=-1).astype(orig_dtype)
