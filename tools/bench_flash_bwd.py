"""Time the Pallas flash-attention forward+backward at the training
shape (PERF.md "Flash-attention fwd+bwd @ 4112 tokens" datum) on the
real chip. Chains reps through the value to defeat DCE; times with a
scalar fetch (block_until_ready returns early on this platform).

Run: python tools/bench_flash_bwd.py [--seq 4112] [--reps 20]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--heads", type=int, default=10)
    ap.add_argument("--seq", type=int, default=4112)
    ap.add_argument("--head_dim", type=int, default=256)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--bwd_bq", type=int, default=None,
                    help="override backward block_q (default: clamp 512)")
    ap.add_argument("--bwd_bk", type=int, default=None,
                    help="override backward block_k (default: clamp 256)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from f_lite_tpu.ops.pallas.flash_attention import flash_attention

    b, h, l, d = args.batch, args.heads, args.seq, args.head_dim
    key = jax.random.key(0)
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, h, l, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, l, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, l, d), jnp.bfloat16)

    def loss(q, k, v):
        o = flash_attention(q, k, v, bwd_block_q=args.bwd_bq,
                            bwd_block_k=args.bwd_bk)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    grad = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def chained(q, k, v, reps):
        def body(i, carry):
            q, k, v = carry
            dq, dk, dv = grad(q, k, v)
            # feed grads back so every rep depends on the last
            return (q + 1e-6 * dq.astype(q.dtype), k, v)

        q, k, v = jax.lax.fori_loop(0, reps, body, (q, k, v))
        return jnp.sum(q.astype(jnp.float32))

    float(chained(q, k, v, 1))  # compile + warm
    t0 = time.time()
    float(chained(q, k, v, args.reps))
    dt = (time.time() - t0) / args.reps

    # FLOPs: fwd 2 matmuls (2*l*l*d each) + bwd 5 matmuls => 7 * 2*l^2*d
    # per (b, h) slice, plus the fwd recompute... we count the standard
    # 3.5x-forward accounting used by the round-1 datum: fwd 4*l^2*d,
    # bwd 10*l^2*d (dq: s, dp, dq; dkv: s, dv, dp, dk => 7 matmuls but
    # s is shared accounting-wise per kernel) — report both ms and TF/s
    # on the 14*l^2*d total so the number is comparable to PERF.md.
    flops = 14 * l * l * d * b * h
    print(f"fwd+bwd {args.seq} tokens: {dt * 1e3:.2f} ms/call, "
          f"{flops / dt / 1e12:.1f} TF/s")


if __name__ == "__main__":
    main()
