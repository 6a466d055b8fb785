"""Int8 W8A8 quantization for inference (weights stored int8; activations
quantized per token at runtime; int8xint8 -> int32 on the MXU).

v5e's MXU runs int8 at 2x the bf16 rate (measured: 329 vs 189 TF/s on
this chip — PERF.md). Scheme: symmetric per-output-channel int8 weights,
dynamic per-token activation scales, int32 accumulation, bf16 output —
the standard near-lossless deployment mode (measured ~0.8% relative
matmul error; the bf16 output quantization already sits at ~0.4%).

Only the large projection kernels quantize (qkv / proj / q / context_kv /
gate / up / down); patch/final/modulation/time-embed projections stay
bf16 (small, and final_proj is precision-sensitive zero-init).

Usage:
    cfg = DiTConfig.f_lite_7b(quantized=True, ...)
    qparams = quantize_dit_params(bf16_params)
    model.apply(qparams, ...)
or at the pipeline level: FLitePipeline.from_pretrained(path, quantize=True).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

QUANT_TARGETS = frozenset(
    {"qkv", "proj", "q", "context_kv", "gate_proj", "up_proj", "down_proj"}
)

# head-aligned projections (models/dit.py HeadProj): kernel
# (in, *split, H, D) — number of output dims after the contraction axis
_N_OUT_DIMS = {"qkv": 3, "context_kv": 3, "q": 2}


def quantize_kernel(kernel, n_out_dims: int = 1) -> dict:
    """(..., K, *out) float -> {'w8': int8, 'scale': (..., *out) f32}.

    Per-output-channel symmetric scales; the contraction axis K sits
    `n_out_dims` from the end (1 for plain (K, N) kernels, more for the
    head-aligned (K, *split, H, D) layout). Leading dims (scan `layers`
    stacking) pass through.
    """
    k = jnp.asarray(kernel, jnp.float32)
    axis = k.ndim - 1 - n_out_dims
    amax = jnp.max(jnp.abs(k), axis=axis, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    w8 = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return {"w8": w8, "scale": jnp.squeeze(scale, axis)}


def quant_matmul(x, w8, scale):
    """x (..., K) bf16 -> (..., *out) in x.dtype; dynamic per-token act
    quant. w8 (K, *out) — the scan machinery slices any leading layer axis
    before the call; scale (*out,)."""
    out_dtype = x.dtype
    xf = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    sx = jnp.where(sx == 0, 1.0, sx)
    x8 = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x8, w8,
        (((x8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # sx (..., 1) must broadcast over all of w8's output dims
    sx = sx.reshape(sx.shape[:-1] + (1,) * (w8.ndim - 1))
    return (y.astype(jnp.float32) * sx * scale).astype(out_dtype)


def quantize_dit_params(params: dict) -> dict:
    """Transform a DiT param tree: target kernels -> {w8, scale}."""

    def rec(node, name=""):
        if isinstance(node, dict):
            if (
                name in QUANT_TARGETS
                and "kernel" in node
                and not isinstance(node["kernel"], dict)
            ):
                out = dict(node)
                kernel = out.pop("kernel")
                out.update(
                    quantize_kernel(kernel, _N_OUT_DIMS.get(name, 1))
                )
                return out
            return {k: rec(v, k) for k, v in node.items()}
        return node

    return rec(params)


def dequantize_dit_params(params: dict, dtype=jnp.bfloat16) -> dict:
    """Inverse (lossy) transform, for debugging/comparison."""

    def rec(node, name=""):
        if isinstance(node, dict):
            if "w8" in node and "scale" in node:
                out = {
                    k: v for k, v in node.items()
                    if k not in ("w8", "scale")
                }
                w8, scale = node["w8"], node["scale"]
                axis = w8.ndim - 1 - _N_OUT_DIMS.get(name, 1)
                out["kernel"] = (
                    w8.astype(jnp.float32)
                    * jnp.expand_dims(scale, axis)
                ).astype(dtype)
                return out
            return {k: rec(v, k) for k, v in node.items()}
        return node

    return rec(params)
