"""Forward-kernel variant sweep for the Pallas flash attention (perf lab).

Variants (cumulative):
  base   — current production kernel math (s*scale in-kernel, exp, always
           apply the key mask when any padding exists)
  prescale — fold softmax scale into q outside the kernel (removes one
           (bq,bk) fp32 multiply per tile)
  exp2   — base-2 online softmax: q pre-scaled by scale*log2(e), p=exp2(.),
           alpha=exp2(.) (VPU pow2 vs exp)
  condmask — apply the key mask only on tiles that straddle the kv_len
           boundary (lax.cond on a scalar; full tiles skip iota+cmp+selects)

Times at the 7B serving shape B=2 H=10 L=4112 D=256 (self-attn: kv_lens
= full length, but padding 4112->4352 makes the last tile masked).

    python tools/flash_variants.py
"""

from __future__ import annotations

import functools
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
_LANES = 128
_LOG2E = 1.4426950408889634


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kernel(
    len_ref, q_ref, k_ref, v_ref, o_ref, m_scratch, l_scratch, acc_scratch,
    *, scale, num_k_blocks, block_k, masked,
    prescale, use_exp2, condmask, alpha_bf16,
):
    bi = pl.program_id(0)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if not prescale:
        s = s * scale

    exp_fn = jnp.exp2 if use_exp2 else jnp.exp

    if masked:
        kv_len = len_ref[bi]
        if condmask:
            needs = kv_len < (ki + 1) * block_k

            def _apply(s):
                col = jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, 1) + ki * block_k
                return jnp.where(col < kv_len, s, _NEG_INF)

            s = jax.lax.cond(needs, _apply, lambda s: s, s)
        else:
            col = jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 1) + ki * block_k
            key_ok = col < kv_len
            s = jnp.where(key_ok, s, _NEG_INF)

    m_prev = m_scratch[:]
    l_prev = l_scratch[:]
    m_curr = jnp.max(s, axis=1)[:, None]
    m_next = jnp.maximum(m_prev, m_curr)

    k_repeats = block_k // _LANES
    p = exp_fn((s - jnp.tile(m_next, (1, k_repeats))).astype(jnp.bfloat16))
    if masked:
        if condmask:
            def _zero(p):
                col = jax.lax.broadcasted_iota(
                    jnp.int32, p.shape, 1) + ki * block_k
                return jnp.where(col < kv_len, p, jnp.zeros((), p.dtype))

            p = jax.lax.cond(needs, _zero, lambda p: p, p)
        else:
            p = jnp.where(key_ok, p, jnp.zeros((), p.dtype))

    if alpha_bf16:
        # the correction exp is as expensive as the p exp at bk=128 (both
        # (bq, 128)-shaped; p's is bf16-packed, alpha's was fp32): compute
        # it 2x-packed too. alpha <= 1 and multiplies quantities already
        # carrying bf16-p quantization, so the added 2^-8 relative error
        # is within the kernel's existing bf16 budget.
        alpha = exp_fn((m_prev - m_next).astype(jnp.bfloat16)
                       ).astype(jnp.float32)
    else:
        alpha = exp_fn(m_prev - m_next)
    l_corr = alpha * l_prev
    l_next = jnp.sum(p.astype(jnp.float32), axis=1)[:, None] + l_corr
    m_scratch[:] = m_next
    l_scratch[:] = l_next

    d_repeats = acc_scratch.shape[-1] // _LANES
    acc_scratch[:] *= jnp.tile(alpha, (1, d_repeats))
    v = v_ref[0, 0]
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


def flash_fwd(q, k, v, *, scale=None, block_q=512, block_k=256,
              prescale=False, use_exp2=False, condmask=False,
              alpha_bf16=False):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if prescale or use_exp2:
        q = (q.astype(jnp.float32)
             * (scale * (_LOG2E if use_exp2 else 1.0))).astype(q.dtype)
        prescale = True
    lq_p, lk_p = _round_up(lq, block_q), _round_up(lk, block_k)
    d_p = _round_up(d, _LANES)
    pad = lambda x, lp: jnp.pad(
        x, ((0, 0), (0, 0), (0, lp - x.shape[2]), (0, d_p - d)))
    q, k, v = pad(q, lq_p), pad(k, lk_p), pad(v, lk_p)
    masked = lk_p != lk
    lens = jnp.full((b,), lk, jnp.int32)
    nq, nk = lq_p // block_q, lk_p // block_k

    kernel = functools.partial(
        _kernel, scale=scale, num_k_blocks=nk, block_k=block_k,
        masked=masked, prescale=prescale, use_exp2=use_exp2,
        condmask=condmask, alpha_bf16=alpha_bf16,
    )
    q_map = lambda bi, hi, qi, ki, s_: (bi, hi, qi, 0)
    k_map = lambda bi, hi, qi, ki, s_: (bi, hi, ki, 0)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, nq, nk),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d_p), q_map),
                pl.BlockSpec((1, 1, block_k, d_p), k_map),
                pl.BlockSpec((1, 1, block_k, d_p), k_map),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d_p), q_map),
            scratch_shapes=[
                pltpu.VMEM((block_q, _LANES), jnp.float32),
                pltpu.VMEM((block_q, _LANES), jnp.float32),
                pltpu.VMEM((block_q, d_p), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, lq_p, d_p), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq_p * lk_p * d_p,
            bytes_accessed=(q.size + k.size + v.size
                            + b * h * lq_p * d_p) * q.dtype.itemsize,
            transcendentals=b * h * lq_p * lk_p,
        ),
    )(lens, q, k, v)
    return out[:, :, :lq, :d]


def main():
    b, h, l, d = 2, 10, 4112, 256
    if os.environ.get("SHAPE"):
        b, h, l, d = (int(x) for x in os.environ["SHAPE"].split(","))
    q = jax.random.normal(jax.random.key(0), (b, h, l, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, h, l, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, h, l, d), jnp.bfloat16)
    flops = 4 * b * h * l * l * d
    reps = 20

    variants = [
        ("base", dict()),
        ("prescale", dict(prescale=True)),
        ("exp2", dict(prescale=True, use_exp2=True)),
        ("condmask", dict(prescale=True, use_exp2=True, condmask=True)),
        ("condmask-e", dict(condmask=True)),
        ("alphabf16", dict(prescale=True, alpha_bf16=True)),
        ("all", dict(prescale=True, use_exp2=True, condmask=True,
                     alpha_bf16=True)),
    ]
    # reference output for correctness
    ref = None
    for name, kw in variants:
        bq = int(os.environ.get("BQ", "512"))
        bk = int(os.environ.get("BK", "256"))

        @jax.jit
        def run(q, k, v, kw=kw, bq=bq, bk=bk):
            def body(i, acc):
                o = flash_fwd(q + acc * 0, k, v, block_q=bq, block_k=bk,
                              **kw)
                return jnp.sum(o.astype(jnp.float32))
            return jax.lax.fori_loop(0, reps, body, 0.0)

        try:
            one = flash_fwd(q, k, v, **kw)
            if ref is None:
                ref = one
            err = float(jnp.max(jnp.abs(
                one.astype(jnp.float32) - ref.astype(jnp.float32))))
            out = float(run(q, k, v))
            t0 = time.perf_counter()
            out = float(run(q, k, v))
            dt = (time.perf_counter() - t0) / reps
            print(f"{name:12s}: {dt*1e3:7.2f} ms {flops/dt/1e12:6.1f} TF/s "
                  f"max|Δ|={err:.4f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s}: FAILED {type(e).__name__}: {str(e)[:140]}",
                  flush=True)


if __name__ == "__main__":
    main()
