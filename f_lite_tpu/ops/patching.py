"""Patchify / unpatchify between NHWC images and token sequences.

The framework uses NHWC layout internally (TPU-friendly convs and reshapes);
the reference is NCHW torch. Channel-ordering contract, needed for weight
conversion and loss parity:

- patchify flattens each (p, p, C) patch in (ki, kj, c) order; the reference's
  Conv2d patch embed (`f_lite/model.py:318-331`) contracts w[d, c, ki, kj]
  with the same patch, so a converted kernel is the torch conv weight
  transposed to (ki, kj, c, d) and flattened.
- unpatchify inverts the reference rearrange
  "b (h w) (p1 p2 c) -> b c (h p1) (w p2)" (`f_lite/model.py:583-590`) in
  NHWC: output columns of the final projection are ordered (p1, p2, c).
- `patchify_for_loss` mirrors the training-loss rearrange
  "b c (h p1) (w p2) -> b (h w) (p1 p2 c)" (`f_lite/train.py:464-479`).
"""

from __future__ import annotations

import jax


def patchify(x: jax.Array, patch_size: int) -> jax.Array:
    """(B, H, W, C) -> (B, (H/p)*(W/p), p*p*C), patch-major order (ki, kj, c)."""
    b, h, w, c = x.shape
    p = patch_size
    x = x.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b, h/p, w/p, p, p, c
    return x.reshape(b, (h // p) * (w // p), p * p * c)


def unpatchify(
    tokens: jax.Array, grid_h: int, grid_w: int, patch_size: int, channels: int
) -> jax.Array:
    """(B, h*w, p*p*C) -> (B, h*p, w*p, C)."""
    b = tokens.shape[0]
    p = patch_size
    x = tokens.reshape(b, grid_h, grid_w, p, p, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b, h, p, w, p, c
    return x.reshape(b, grid_h * p, grid_w * p, channels)
