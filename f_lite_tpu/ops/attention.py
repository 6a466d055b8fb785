"""Multi-head attention dispatch: Pallas flash kernel on TPU, XLA elsewhere.

The reference routes both self- and cross-attention through CUDA
`flash_attn_varlen_func` over ragged packed sequences
(`f_lite/model.py:203-210`). Ragged shapes are hostile to XLA/TPU, so the
TPU-native equivalent keeps *static padded* layouts and replaces cu_seqlens
packing with a key-padding mask (SURVEY.md §7.1):

- self-attention over image + register tokens is dense (no mask);
- cross-attention masks padded text keys (`kv_mask`), matching the semantics
  of the reference's varlen packing (padded keys never attend).

Layout: q (B, H, Lq, D); k, v (B, H, Lk, D); kv_mask (B, Lk) bool, True=real.
Softmax statistics accumulate in fp32 in both paths.

Mask contract: the Pallas kernel masks by per-batch *prefix length*, so its
`kv_mask` must be right-padded (True...False...). The XLA path accepts any
mask. Callers holding an arbitrary mask should canonicalize once with
`compact_context` — softmax attention is permutation-invariant over
key/value pairs, so stably moving real tokens to the front is exact (the
DiT does this for the cross-attention context, models/dit.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def attention_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    kv_mask: jax.Array | None = None,
    scale: float | None = None,
) -> jax.Array:
    """Masked SDPA with fp32 softmax — the portable fallback path."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :], logits, _NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def compact_context(
    context: jax.Array, mask: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Stably permute real tokens to the front: any mask -> prefix form.

    context (B, S, C); mask (B, S) bool, True = real token. Attention is
    permutation-invariant over key/value pairs, so reordering the
    cross-attention context is exact — it makes arbitrary masks safe for
    the prefix-length Pallas kernel. Right-padded masks (every tokenizer
    here) reduce to the identity permutation.
    """
    order = jnp.argsort(
        jnp.logical_not(mask), axis=-1, stable=True
    ).astype(jnp.int32)
    context = jnp.take_along_axis(context, order[..., None], axis=1)
    mask = jnp.take_along_axis(mask, order, axis=-1)
    return context, mask


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    kv_mask: jax.Array | None = None,
    scale: float | None = None,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Dispatch to the Pallas flash-attention kernel on TPU, XLA otherwise.

    `use_pallas=None` auto-selects; True forces the kernel (errors off-TPU
    unless interpret mode is active); False forces the XLA path.

    With `use_pallas`, `kv_mask` must be prefix-form (right-padded) — see
    the module docstring and `compact_context`.
    """
    if use_pallas is None:
        use_pallas = _on_tpu()
    if use_pallas:
        from f_lite_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, kv_mask=kv_mask, scale=scale)
    return attention_xla(q, k, v, kv_mask=kv_mask, scale=scale)
