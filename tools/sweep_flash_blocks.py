"""On-chip flash-attention block sweep at the 7B serving shape.

Times the Pallas forward at B=2 (CFG pair) H=10 L=4112 D=256 across
(block_q, block_k) configs, chained inside one jit to amortize the remote
round-trip (PERF.md methodology). Prints TF/s per config.

    PYTHONPATH=/root/.axon_site:/root/repo python tools/sweep_flash_blocks.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from f_lite_tpu.ops.pallas.flash_attention import flash_attention


def time_config(q, k, v, bq, bk, reps=20):
    @jax.jit
    def run(q, k, v):
        def body(i, acc):
            o = flash_attention(q + acc * 0, k, v, block_q=bq, block_k=bk)
            return jnp.sum(o.astype(jnp.float32))

        return jax.lax.fori_loop(0, reps, body, 0.0)

    out = float(run(q, k, v))  # compile + warmup
    t0 = time.perf_counter()
    out = float(run(q, k, v))
    dt = (time.perf_counter() - t0) / reps
    return dt, out


def main():
    b, h, l, d = 2, 10, 4112, 256
    if os.environ.get("SHAPE"):
        b, h, l, d = (int(x) for x in os.environ["SHAPE"].split(","))
    q = jax.random.normal(jax.random.key(0), (b, h, l, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, h, l, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, h, l, d), jnp.bfloat16)
    flops = 4 * b * h * l * l * d

    configs = [
        (256, 512), (256, 1024), (512, 512), (512, 1024),
        (128, 512), (256, 256), (512, 256), (1024, 512),
    ]
    env = os.environ.get("CONFIGS")
    if env:
        configs = [tuple(map(int, c.split("x"))) for c in env.split(",")]
    for bq, bk in configs:
        try:
            dt, out = time_config(q, k, v, bq, bk)
            print(f"bq={bq:5d} bk={bk:5d}: {dt*1e3:7.2f} ms "
                  f"{flops/dt/1e12:6.1f} TF/s (sum={out:.1f})", flush=True)
        except Exception as e:  # noqa: BLE001 — VMEM OOM configs
            print(f"bq={bq:5d} bk={bk:5d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
