"""Pallas TPU flash attention (self + cross) with key-padding masking.

TPU-native replacement for the reference's CUDA `flash_attn_varlen_func`
(`/root/reference/f_lite/model.py:203-210`). Instead of ragged cu_seqlens
packing, sequences stay statically padded and padded *keys* are masked
(SURVEY.md §7.1): identical math, XLA/Mosaic-friendly shapes.

Masking model: per-batch *key prefix lengths* (scalar-prefetched to SMEM).
A boolean `kv_mask` is reduced to lengths, so it MUST be prefix-form
(right-padded, True...False...) — tokenizers here right-pad, and the DiT
canonicalizes arbitrary masks upstream with
`f_lite_tpu.ops.attention.compact_context` (exact: attention is
permutation-invariant over key/value pairs).

Forward: grid (B, H, num_q_blocks, num_k_blocks), k innermost; online
softmax in fp32 VMEM scratch, stats in (block_q, 128) lane-replicated tiles
(no sublane-1 broadcasts — Mosaic layout requirement); QK^T and PV on the
MXU with fp32 accumulation; the accumulator is kept normalized every step.
When gradients are needed the forward also emits the log-sum-exp residual
(lane-replicated, like jax's reference kernel stores l/m).

Backward: two Pallas kernels, O(L) memory (never materializes the L^2
matrix — the property that makes 1024px+ training fit). D = rowsum(dO*O)
is precomputed ONCE outside the kernels (FA2), lane-replicated like lse —
recomputing it per tile cost a (bq, d) VPU reduction in every (q, k) pair
of BOTH kernels and streamed O through VMEM nk (resp. nq) times:
- dq kernel, grid (B, H, nq, nk): recompute P from (q, k, lse), then
  dP = dO V^T, dS = P (dP - D), dq += dS K * scale;
- dkv kernel, grid (B, H, nk, nq): same recompute per (k, q) tile,
  dv += P^T dO and dk += dS^T Q * scale.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
_LANES = 128


def _env_block_cap(name: str) -> int:
    """Validated env-var block cap: 0/unset = no cap; otherwise an int,
    rounded DOWN to a multiple of 128 (Mosaic sublane alignment) and
    floored at 512 (smaller caps are silently impossible — the kernels'
    minimum tuned block)."""
    raw = os.environ.get(name, "0")
    try:
        cap = int(raw)
    except ValueError:
        raise ValueError(
            f"{name}={raw!r} is not an integer (expected e.g. 2048)"
        ) from None
    if cap <= 0:
        return 0
    return max(512, cap // 128 * 128)


def _env_block(name: str, floor: int) -> int:
    """Exact block-size env override for in-program sweeps (PERF.md
    round 4): 0/unset = keep the shape-adaptive default; otherwise the
    value, 128-aligned down and floored at the kernel's minimum legal
    block. Unlike the _cap knobs this SETS the block rather than
    bounding the auto choice — the Mosaic-safety clamps downstream
    still apply."""
    raw = os.environ.get(name, "0")
    try:
        v = int(raw)
    except ValueError:
        raise ValueError(
            f"{name}={raw!r} is not an integer (expected e.g. 256)"
        ) from None
    if v <= 0:
        return 0
    return max(floor, v // 128 * 128)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fa_fwd_kernel(
    len_ref, q_ref, k_ref, v_ref, *refs,
    scale: float, num_k_blocks: int, block_k: int, masked: bool,
    save_lse: bool,
):
    if save_lse:
        o_ref, lse_ref, m_scratch, l_scratch, acc_scratch = refs
    else:
        o_ref, m_scratch, l_scratch, acc_scratch = refs
        lse_ref = None
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
    # exp on the VPU is the kernel's bottleneck at D>=256; for bf16 IO the
    # output is bf16-quantized anyway, so computing exp in bf16 (2x packed
    # VPU) costs nothing in accuracy (+11% kernel throughput measured).
    # fp32 inputs keep fp32 exp (exact parity for CPU/fp32 tests).
    exp_dtype = (
        jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    )
    p = jnp.exp(
        (s - jnp.tile(m_next, (1, k_repeats))).astype(exp_dtype)
    )  # (bq, bk)
    if masked:
        # all-masked tiles would otherwise give exp(NEG_INF-NEG_INF)=1
        p = jnp.where(key_ok, p, jnp.zeros((), exp_dtype))

    alpha = jnp.exp(m_prev - m_next)  # (bq, 128) fp32
    l_corr = alpha * l_prev
    l_next = (
        jnp.sum(p.astype(jnp.float32), axis=1)[:, None] + l_corr
    )  # (bq, 128)
    m_scratch[:] = m_next
    l_scratch[:] = l_next

    # deferred normalization: keep the accumulator UN-normalized (classic
    # flash) and divide by l once at finalize — saves one (bq, d)
    # elementwise multiply and a (bq, 128) reciprocal per k tile vs the
    # always-normalized scheme. No overflow risk: |acc| <= l * max|v| and
    # l <= L in fp32.
    d_repeats = acc_scratch.shape[-1] // _LANES
    acc_scratch[:] *= jnp.tile(alpha, (1, d_repeats))
    v = v_ref[0, 0]  # (bk, d)
    o_curr = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scratch[:] += o_curr

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        l = l_scratch[:]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (
            acc_scratch[:] * jnp.tile(l_inv, (1, d_repeats))
        ).astype(o_ref.dtype)
        if save_lse:
            safe_l = jnp.where(l == 0.0, 1.0, l)
            lse_ref[0, 0] = m_scratch[:] + jnp.log(safe_l)


def _pad_qkv(q, k, v, block_q, block_k):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    lq_p = _round_up(lq, block_q)
    lk_p = _round_up(lk, block_k)
    d_p = _round_up(d, _LANES)
    if lq_p != lq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, lq_p - lq), (0, 0)))
    if lk_p != lk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, lk_p - lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, lk_p - lk), (0, 0)))
    if d_p != d:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, d_p - d)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, d_p - d)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, d_p - d)))
    return q, k, v, (lq, lk, d, lq_p, lk_p, d_p)


def _flash_forward(q, k, v, kv_lens, scale, block_q, block_k, interpret,
                   save_lse=False):
    b, h = q.shape[:2]
    q, k, v, (lq, lk, d, lq_p, lk_p, d_p) = _pad_qkv(q, k, v, block_q,
                                                     block_k)
    masked = kv_lens is not None or lk_p != lk
    lens = (jnp.full((b,), lk, jnp.int32) if kv_lens is None
            else kv_lens.astype(jnp.int32))
    nq, nk = lq_p // block_q, lk_p // block_k

    kernel = functools.partial(
        _fa_fwd_kernel, scale=scale, num_k_blocks=nk, block_k=block_k,
        masked=masked, save_lse=save_lse,
    )
    qkv_spec = lambda which: pl.BlockSpec(
        (1, 1, block_q if which == "q" else block_k, d_p),
        (lambda bi, hi, qi, ki, s_: (bi, hi, qi, 0)) if which == "q"
        else (lambda bi, hi, qi, ki, s_: (bi, hi, ki, 0)),
    )
    out_specs = [
        pl.BlockSpec(
            (1, 1, block_q, d_p),
            lambda bi, hi, qi, ki, s_: (bi, hi, qi, 0),
        ),
    ]
    out_shape = [jax.ShapeDtypeStruct((b, h, lq_p, d_p), q.dtype)]
    if save_lse:
        out_specs.append(
            pl.BlockSpec(
                (1, 1, block_q, _LANES),
                lambda bi, hi, qi, ki, s_: (bi, hi, qi, 0),
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct((b, h, lq_p, _LANES), jnp.float32)
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h, nq, nk),
        in_specs=[qkv_spec("q"), qkv_spec("k"), qkv_spec("k")],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d_p), jnp.float32),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq_p * lk_p * d_p,
            bytes_accessed=(q.size + k.size + v.size
                            + b * h * lq_p * d_p) * q.dtype.itemsize,
            transcendentals=b * h * lq_p * lk_p,
        ),
        interpret=interpret,
    )(lens, q, k, v)
    out = outs[0]
    lse = outs[1] if save_lse else None

    if lq_p != lq or d_p != d:
        out_s = out[:, :, :lq, :d]
    else:
        out_s = out
    return out_s, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _dq_kernel(
    len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref,
    dq_scratch,
    *, scale: float, num_k_blocks: int, block_k: int, masked: bool,
):
    bi = pl.program_id(0)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0]  # (bq, 128) lane-replicated
    di = di_ref[0, 0]    # (bq, 128) lane-replicated rowsum(dO*O)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    k_repeats = block_k // _LANES
    p = jnp.exp(s - jnp.tile(lse, (1, k_repeats)))  # (bq, bk)
    if masked:
        kv_len = len_ref[bi]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        p = jnp.where(col < kv_len, p, 0.0)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    # di precomputed once outside (FA2): recomputing rowsum(dO*O) here
    # cost a (bq, d) VPU reduction per tile AND streamed O through VMEM
    # num_k_blocks times per q block
    di_full = jnp.tile(di, (1, k_repeats))
    ds = p * (dp - di_full)  # (bq, bk) fp32
    dq_scratch[:] += jax.lax.dot_general(
        ds.astype(q.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        dq_ref[0, 0] = dq_scratch[:].astype(dq_ref.dtype)


def _dkv_kernel(
    len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
    dk_ref, dv_ref, dk_scratch, dv_scratch,
    *, scale: float, num_q_blocks: int, block_k: int, masked: bool,
):
    bi = pl.program_id(0)
    ki = pl.program_id(2)
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0]
    di = di_ref[0, 0]  # (bq, 128) lane-replicated rowsum(dO*O)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, bk)
    k_repeats = block_k // _LANES
    p = jnp.exp(s - jnp.tile(lse, (1, k_repeats)))
    if masked:
        kv_len = len_ref[bi]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        p = jnp.where(col < kv_len, p, 0.0)

    p_cast = p.astype(do.dtype)
    # dv += P^T dO  (bk, d)
    dv_scratch[:] += jax.lax.dot_general(
        p_cast, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    di_full = jnp.tile(di, (1, k_repeats))
    ds = (p * (dp - di_full)).astype(q.dtype)  # (bq, bk)
    # dk += dS^T Q * scale  (bk, d)
    dk_scratch[:] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(qi == num_q_blocks - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scratch[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, kv_lens, scale, block_q, block_k, interpret,
                    di, lse, g):
    b, h = q.shape[:2]
    q_p, k_p, v_p, (lq, lk, d, lq_p, lk_p, d_p) = _pad_qkv(
        q, k, v, block_q, block_k
    )
    do = g
    if do.shape[2] != lq_p or do.shape[3] != d_p:
        do = jnp.pad(
            do, ((0, 0), (0, 0), (0, lq_p - do.shape[2]),
                 (0, d_p - do.shape[3]))
        )
    masked = kv_lens is not None or lk_p != lk
    lens = (jnp.full((b,), lk, jnp.int32) if kv_lens is None
            else kv_lens.astype(jnp.int32))
    nq, nk = lq_p // block_q, lk_p // block_k

    # di = rowsum(dO*O), precomputed by the caller over the unpadded
    # arrays (FA2); pad rows and lane-replicate like lse
    if di.shape[2] != lq_p:
        di = jnp.pad(di, ((0, 0), (0, 0), (0, lq_p - di.shape[2]), (0, 0)))
    di = jnp.broadcast_to(di, (*di.shape[:3], _LANES))
    # an overridden bwd_block_q can pad q differently than the forward
    # padded lse: align rows (extra pad rows are harmless — their do is
    # zero, so ds/dv contributions vanish and p stays finite)
    if lse.shape[2] > lq_p:
        lse = lse[:, :, :lq_p]
    elif lse.shape[2] < lq_p:
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, lq_p - lse.shape[2]),
                            (0, 0)))

    q_map = lambda bi, hi, qi, ki, s_: (bi, hi, qi, 0)
    k_map = lambda bi, hi, qi, ki, s_: (bi, hi, ki, 0)

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, scale=scale, num_k_blocks=nk, block_k=block_k,
            masked=masked,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, nq, nk),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d_p), q_map),
                pl.BlockSpec((1, 1, block_k, d_p), k_map),
                pl.BlockSpec((1, 1, block_k, d_p), k_map),
                pl.BlockSpec((1, 1, block_q, d_p), q_map),
                pl.BlockSpec((1, 1, block_q, _LANES), q_map),
                pl.BlockSpec((1, 1, block_q, _LANES), q_map),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d_p), q_map),
            scratch_shapes=[pltpu.VMEM((block_q, d_p), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, lq_p, d_p), q.dtype),
        interpret=interpret,
    )(lens, q_p, k_p, v_p, do, lse, di)

    kq_map = lambda bi, hi, ki, qi, s_: (bi, hi, qi, 0)
    kk_map = lambda bi, hi, ki, qi, s_: (bi, hi, ki, 0)
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, scale=scale, num_q_blocks=nq, block_k=block_k,
            masked=masked,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, nk, nq),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d_p), kq_map),
                pl.BlockSpec((1, 1, block_k, d_p), kk_map),
                pl.BlockSpec((1, 1, block_k, d_p), kk_map),
                pl.BlockSpec((1, 1, block_q, d_p), kq_map),
                pl.BlockSpec((1, 1, block_q, _LANES), kq_map),
                pl.BlockSpec((1, 1, block_q, _LANES), kq_map),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_k, d_p), kk_map),
                pl.BlockSpec((1, 1, block_k, d_p), kk_map),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, d_p), jnp.float32),
                pltpu.VMEM((block_k, d_p), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, lk_p, d_p), k.dtype),
            jax.ShapeDtypeStruct((b, h, lk_p, d_p), v.dtype),
        ],
        interpret=interpret,
    )(lens, q_p, k_p, v_p, do, lse, di)

    dq = dq[:, :, :lq, :d]
    dk = dk[:, :, :lk, :d]
    dv = dv[:, :, :lk, :d]
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp plumbing
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _flash_attention(q, k, v, kv_lens, scale, block_q, block_k,
                     bwd_block_q, bwd_block_k, interpret):
    out, _lse = _flash_forward(
        q, k, v, kv_lens, scale, block_q, block_k, interpret, save_lse=False
    )
    return out


def _bwd_default_bq(lq: int, d: int) -> int:
    """Default backward q block for bf16 inputs.

    Stream-budget cap for wide heads, kept 128-aligned (Mosaic rejects
    unaligned sublane dims), then the candidate that minimizes padded
    rows: bq=2048 is fastest where it tiles cleanly (the sweep shapes
    4096/16384 — PERF.md round 3), but at e.g. lq=2560 it would pad to
    4096 (+60% rows through both kernel grids) where bq=512 pads zero —
    padding waste dominates block-size economy. F_LITE_FLASH_MAX_BWD_BQ
    is the same scoped-vmem escape hatch as the forward's
    F_LITE_FLASH_MAX_BQ: accounting is program-context dependent, and
    (2048, 256) sits near the 16 MB ceiling — a differently-fused
    training program can push it over with no other recourse
    (default-block callers only)."""
    bq_max = max(512, min(2048,
                          (2048 * 256 // _round_up(d, _LANES))
                          // 128 * 128))
    cands = [b for b in (2048, 1024, 512) if b <= bq_max] or [bq_max]
    bq = min(cands, key=lambda b: (_round_up(lq, b), -b))
    cap = _env_block_cap("F_LITE_FLASH_MAX_BWD_BQ")
    if cap:
        bq = min(bq, cap)
    return bq


def _flash_fwd_vjp(q, k, v, kv_lens, scale, block_q, block_k,
                   bwd_block_q, bwd_block_k, interpret):
    # the lse output adds (bq, 128) fp32 VMEM per buffer: clamp the very
    # large inference-only q blocks on the grad path (perf-neutral there,
    # the backward kernels dominate)
    block_q = min(block_q, 512)
    block_k = min(block_k, 256)
    out, lse = _flash_forward(
        q, k, v, kv_lens, scale, block_q, block_k, interpret, save_lse=True
    )
    # residual O is the UNPADDED forward output: XLA aliases it with the
    # value already flowing downstream, so (unlike saving the padded
    # kernel buffer) it adds no extra O-sized residual and no pad copy
    return out, (q, k, v, kv_lens, out, lse)


def _flash_bwd_vjp(scale, block_q, block_k, bwd_block_q, bwd_block_k,
                   interpret, residuals, g):
    q, k, v, kv_lens, out, lse = residuals
    # Backward blocks are chosen independently of the forward's (the FA2
    # rewrite dropped O from the kernel streams, so much larger q blocks
    # fit VMEM than the round-2 (512, 256) clamp assumed). On-chip sweep
    # at B=2/8, L=4112/16400, D=256 (PERF.md round 3): (2048, 256) is the
    # fastest config everywhere it compiles — 9.9 ms vs 10.3-11.0 for
    # (512, *) at the serving shape, 161.7 TF/s at B=8 — and (2048, 512)
    # exceeds the 16 MB scoped-vmem limit by 1.2 M. fp32 inputs double
    # every dtype-sized stream (parity/audit paths only), so they keep
    # the safe (512, 256); wide heads (d_p > 256) scale bq down to hold
    # the q/do/lse/di stream budget constant.
    if bwd_block_q:  # 0/None = default, like bwd_block_k
        block_q = bwd_block_q
    elif q.dtype == jnp.bfloat16:
        block_q = _bwd_default_bq(q.shape[2], q.shape[-1])
    else:
        block_q = 512
    block_k = bwd_block_k or 256
    block_q = min(block_q, _round_up(q.shape[2], 128))
    block_k = min(block_k, _round_up(k.shape[2], 128))
    # FA2: D = rowsum(dO*O) computed ONCE over the unpadded arrays (one
    # bandwidth-bound pass) instead of per (q, k) tile inside both
    # kernels — drops O from the kernel input streams entirely
    di = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=3,
        keepdims=True,
    )  # (b, h, lq, 1)
    dq, dk, dv = _flash_backward(
        q, k, v, kv_lens, scale, block_q, block_k, interpret, di, lse, g,
    )
    return dq, dk, dv, None


_flash_attention.defvjp(_flash_fwd_vjp, _flash_bwd_vjp)


def _tail_attention(q, k, v, kv_lens, scale):
    """fp32 SDPA for a small ragged q tail (rows that don't fill a block).

    Must match the kernel's semantics exactly, including zero output for
    rows whose kv_len is 0 (the kernel's l==0 guard)."""
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if kv_lens is not None:
        col = jnp.arange(k.shape[2], dtype=jnp.int32)
        key_ok = col[None, :] < kv_lens[:, None]  # (B, Lk)
        logits = jnp.where(key_ok[:, None, None, :], logits, -1e30)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd",
        jax.nn.softmax(logits, axis=-1).astype(q.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    if kv_lens is not None:
        out = jnp.where((kv_lens > 0)[:, None, None, None], out,
                        jnp.zeros((), out.dtype))
    return out


# ragged q tails up to this many rows go through XLA instead of forcing a
# mostly-padded extra q block through the kernel (4112 = 8*512 + 16: the
# 16-row tail otherwise costs a full 512-row block, ~12% of kernel time)
_TAIL_SPLIT_MAX = 64


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    kv_mask: jax.Array | None = None,
    kv_lens: jax.Array | None = None,
    scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
    bwd_block_q: int | None = None,
    bwd_block_k: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention. q (B,H,Lq,D); k,v (B,H,Lk,D).

    Key padding is expressed as per-batch prefix lengths: pass `kv_lens`
    (B,) int32 directly, or `kv_mask` (B,Lk) bool which is reduced to
    lengths (prefix semantics assumed — right-padded tokenizer masks).
    Unaligned shapes are padded and tail-masked by the wrapper; a small
    ragged q tail is computed by XLA so the kernel's q blocks stay dense.
    Differentiable: the backward runs fused Pallas kernels with O(L) memory
    (its blocks default to (2048, 256) for bf16 / (512, 256) for fp32,
    independent of the forward's — on-chip sweep, PERF.md round 3;
    `bwd_block_q`/`bwd_block_k` override for tuning sweeps).

    Default blocks adapt to shape (on-chip sweeps at 7B serving shapes,
    v5e): a single TPU core serializes the grid, so when the (b*h) grid
    is small, fewer/larger invocations amortize the per-tile softmax
    chain — (4096, 128) measures 85 TF/s vs 79 for (512, 256) at
    B=2 H=10 L=4112 D=256; large grids (B=8) prefer (2048, 256) and
    bq=4096 there exceeds the Mosaic compiler's limits.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if kv_lens is None and kv_mask is not None:
        kv_lens = kv_mask.astype(jnp.int32).sum(axis=-1)
    b, h, lq, _ = q.shape
    lk = k.shape[2]
    if block_k is None and (env_bk := _env_block("F_LITE_FLASH_BK", 128)):
        block_k = env_bk
    if block_q is None:
        env_bq = _env_block("F_LITE_FLASH_BQ", 512)
        # effective kernel rows after the ragged-tail split below
        _tail = lq % 4096
        _eff_lq = (lq - _tail
                   if 0 < _tail <= _TAIL_SPLIT_MAX and lq > 4096 else lq)
        # bq=4096 is only safe when it covers the WHOLE q extent (nq == 1):
        # with nq > 1 Mosaic double-buffers the q/out tiles across q blocks
        # and the (4096, 128) config lands ~256K over the 16MB scoped-vmem
        # limit (measured at 2048px serving, lq=16384)
        _auto_bk128 = False
        if env_bq:
            # sweep override — still passes through the Mosaic-safety
            # clamps below (the helper's documented contract)
            block_q = env_bq
        elif lq >= 4096 and b * h <= 32 and _round_up(_eff_lq, 128) <= 4096:
            if block_k is None:
                # bk=128 is tuned FOR bq=4096; remembered so a later
                # clamp of bq re-picks the default bk instead of running
                # the untuned (2048, 128) pairing
                block_k = 128
                _auto_bk128 = True
            block_q = 4096
        elif lq >= 2048:
            block_q = 2048
        else:
            block_q = 512
        # keep the fp32 accumulator scratch <= 4MB VMEM for wide heads
        d_p = _round_up(q.shape[-1], _LANES)
        block_q = min(block_q, max(512, (4 << 20) // (4 * d_p) // 128 * 128))
        if q.dtype.itemsize > 2:
            # fp32 inputs double every dtype-sized VMEM tile (q, out, p):
            # the bf16-tuned 4096-row block exceeds the 16MB scoped limit
            # at D=256 (16.5M measured) — halve it. fp32 runs are parity/
            # quality audits, not the serving path, so bf16 perf tuning
            # is untouched.
            block_q = min(block_q, 2048)
        cap = _env_block_cap("F_LITE_FLASH_MAX_BQ")
        if cap:
            # escape hatch: XLA's scoped-vmem accounting is program-
            # context dependent — the same (4096, 128) call that fits in
            # the serving scan can land ~1% over the 16MB limit inside a
            # differently-fused program (tools/quality_audit.py). The cap
            # only applies to default-block callers.
            block_q = min(block_q, cap)
        if _auto_bk128 and block_q < 4096:
            block_k = None  # re-pick the default bk below (256)
    if block_k is None:
        # bk=256 everywhere: isolated-kernel sweeps prefer bk=512 at
        # L>=8192 (+3.5%: 150->156 TF/s at L=16384), but the full 2048px
        # serving program measures the same or slightly worse with 512
        # (86.6 vs 85.3 s p50 — fusion context changes VMEM pressure).
        # PERF.md "2048px" section; keep the simpler uniform default.
        block_k = 256
    block_q = min(block_q, _round_up(lq, 128))
    block_k = min(block_k, _round_up(lk, 128))

    # fold a power-of-two softmax scale into q (exact in bf16/fp32: pure
    # exponent shift) — removes one (bq, bk) fp32 multiply per k tile.
    # Gradients stay correct: the multiply sits outside the custom_vjp.
    frac = math.frexp(scale)[0] if scale > 0 else 0.0
    if frac == 0.5:
        q = q * jnp.asarray(scale, q.dtype)
        scale = 1.0

    tail = lq % block_q
    main = lq - tail
    if 0 < tail <= _TAIL_SPLIT_MAX and main >= block_q:
        out_main = _flash_attention(
            q[:, :, :main], k, v, kv_lens, scale, block_q, block_k,
            bwd_block_q, bwd_block_k, interpret,
        )
        out_tail = _tail_attention(q[:, :, main:], k, v, kv_lens, scale)
        return jnp.concatenate([out_main, out_tail], axis=2)
    return _flash_attention(
        q, k, v, kv_lens, scale, block_q, block_k, bwd_block_q,
        bwd_block_k, interpret
    )
