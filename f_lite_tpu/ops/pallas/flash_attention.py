"""Pallas TPU flash attention (self + cross) with key-padding masking.

TPU-native replacement for the reference's CUDA `flash_attn_varlen_func`
(`/root/reference/f_lite/model.py:203-210`). Instead of ragged cu_seqlens
packing, sequences stay statically padded and padded *keys* are masked
(SURVEY.md §7.1): identical math, XLA/Mosaic-friendly shapes.

Masking model: per-batch *key prefix lengths* (scalar-prefetched to SMEM).
Tokenizers right-pad, so every mask the pipeline produces is a prefix mask;
`f_lite_tpu.ops.attention.attention` falls back to the XLA path for anything
else. Lengths (not 2D masks) keep the kernel's hot loop free of vector mask
loads and enable whole-k-block skipping later.

Kernel shape: grid (B, H, num_q_blocks, num_k_blocks), k innermost. Online
softmax carried in fp32 VMEM scratch across the k loop; stats live in
(block_q, 128) lane-replicated tiles (Mosaic-friendly — no sublane-1
broadcasts); QK^T and PV ride the MXU with fp32 accumulation; P is cast to
the value dtype for the PV matmul (standard flash-attention precision). The
accumulator is kept normalized every step (rescale by l_corr / l_next), so
finalization is a plain cast.

The backward pass recomputes attention with the XLA path and differentiates
that — numerically identical math (both accumulate softmax in fp32), simple
and correct; a fused Pallas backward is a later optimization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from f_lite_tpu.ops.attention import attention_xla

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fa_kernel(
    len_ref, q_ref, k_ref, v_ref, o_ref,
    m_scratch, l_scratch, acc_scratch,
    *, scale: float, num_k_blocks: int, block_k: int, masked: bool,
):
    bi = pl.program_id(0)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0, 0]  # (bq, d)
    k = k_ref[0, 0]  # (bk, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale  # (bq, bk)

    if masked:
        kv_len = len_ref[bi]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        key_ok = col < kv_len
        s = jnp.where(key_ok, s, _NEG_INF)

    m_prev = m_scratch[:]  # (bq, 128), lane-replicated
    l_prev = l_scratch[:]
    m_curr = jnp.max(s, axis=1)[:, None]  # (bq, 1)
    m_next = jnp.maximum(m_prev, m_curr)  # (bq, 128)

    k_repeats = block_k // _LANES
    p = jnp.exp(s - jnp.tile(m_next, (1, k_repeats)))  # (bq, bk) fp32
    if masked:
        # all-masked blocks would otherwise give exp(NEG_INF-NEG_INF)=1
        p = jnp.where(key_ok, p, 0.0)

    alpha = jnp.exp(m_prev - m_next)  # (bq, 128)
    l_corr = alpha * l_prev
    l_next = jnp.sum(p, axis=1)[:, None] + l_corr  # (bq, 128)
    m_scratch[:] = m_next
    l_scratch[:] = l_next

    l_next_inv_safe = jnp.where(l_next == 0.0, 1.0, 1.0 / l_next)
    d_repeats = acc_scratch.shape[-1] // _LANES
    acc_scratch[:] *= jnp.tile(l_corr * l_next_inv_safe, (1, d_repeats))
    v = v_ref[0, 0]  # (bk, d)
    o_curr = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scratch[:] += o_curr * jnp.tile(l_next_inv_safe, (1, d_repeats))

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        o_ref[0, 0] = acc_scratch[:].astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_attention(q, k, v, kv_lens, scale, block_q, block_k, interpret):
    return _flash_forward(
        q, k, v, kv_lens, scale, block_q, block_k, interpret
    )


def _flash_forward(q, k, v, kv_lens, scale, block_q, block_k, interpret):
    b, h, lq, d = q.shape
    lk = k.shape[2]

    lq_p = _round_up(lq, block_q)
    lk_p = _round_up(lk, block_k)
    d_p = _round_up(d, _LANES)

    masked = kv_lens is not None or lk_p != lk
    if kv_lens is None:
        lens = jnp.full((b,), lk, jnp.int32)
    else:
        lens = kv_lens.astype(jnp.int32)

    if lq_p != lq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, lq_p - lq), (0, 0)))
    if lk_p != lk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, lk_p - lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, lk_p - lk), (0, 0)))
    if d_p != d:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, d_p - d)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, d_p - d)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, d_p - d)))

    nq = lq_p // block_q
    nk = lk_p // block_k

    kernel = functools.partial(
        _fa_kernel,
        scale=scale, num_k_blocks=nk, block_k=block_k, masked=masked,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h, nq, nk),
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d_p),
                lambda bi, hi, qi, ki, s_: (bi, hi, qi, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_k, d_p),
                lambda bi, hi, qi, ki, s_: (bi, hi, ki, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_k, d_p),
                lambda bi, hi, qi, ki, s_: (bi, hi, ki, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d_p),
            lambda bi, hi, qi, ki, s_: (bi, hi, qi, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d_p), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, lq_p, d_p), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq_p * lk_p * d_p,
            bytes_accessed=(
                q.size + k.size + v.size + b * h * lq_p * d_p
            ) * q.dtype.itemsize,
            transcendentals=b * h * lq_p * lk_p,
        ),
        interpret=interpret,
    )(lens, q, k, v)

    if lq_p != lq or d_p != d:
        out = out[:, :, :lq, :d]
    return out


def _flash_fwd_vjp(q, k, v, kv_lens, scale, block_q, block_k, interpret):
    out = _flash_forward(q, k, v, kv_lens, scale, block_q, block_k, interpret)
    return out, (q, k, v, kv_lens)


def _flash_bwd_vjp(scale, block_q, block_k, interpret, residuals, g):
    q, k, v, kv_lens = residuals
    if kv_lens is None:
        kv_mask = None
    else:
        lk = k.shape[2]
        kv_mask = jnp.arange(lk)[None, :] < kv_lens[:, None]
    # Recompute-and-differentiate through the XLA path: identical math
    # (fp32 softmax accumulation), so gradients match the kernel's forward.
    _, vjp = jax.vjp(
        lambda q_, k_, v_: attention_xla(
            q_, k_, v_, kv_mask=kv_mask, scale=scale
        ),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_attention.defvjp(_flash_fwd_vjp, _flash_bwd_vjp)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    kv_mask: jax.Array | None = None,
    kv_lens: jax.Array | None = None,
    scale: float | None = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention. q (B,H,Lq,D); k,v (B,H,Lk,D).

    Key padding is expressed as per-batch prefix lengths: pass `kv_lens`
    (B,) int32 directly, or `kv_mask` (B,Lk) bool which is reduced to
    lengths (prefix semantics assumed — right-padded tokenizer masks).
    Unaligned shapes are padded and tail-masked by the wrapper.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if kv_lens is None and kv_mask is not None:
        kv_lens = kv_mask.astype(jnp.int32).sum(axis=-1)
    lq, lk = q.shape[2], k.shape[2]
    block_q = min(block_q, _round_up(lq, 128))
    block_k = min(block_k, _round_up(lk, 128))
    return _flash_attention(
        q, k, v, kv_lens, scale, block_q, block_k, interpret
    )
