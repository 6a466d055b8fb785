"""Isolate the round-1 batch-4 1024px denoise crash on the real chip.

Round-1 observation: batch-4 1024px quantized denoise killed the remote
worker ("kernel fault"), while batch-1 was fine. PERF.md separately
established that single dispatches longer than ~40 s trip the remote
runtime's watchdog. Hypothesis: the crash is the watchdog (batch-4 30-step
single dispatch ~= 4 x 14 s > 40 s), not a kernel bug at batch shapes.

Probes (each prints a line; run stages via PROBE=a|b|c|d):
  a. Pallas flash attention alone at B=8 H=10 L=4112 D=256 (the batch-4
     CFG self-attention shape) — chained reps inside one jit.
  b. int8 W8A8 matmul at batch-4 token shapes.
  c. batch-4 1024px 30-step denoise with steps_per_dispatch=5 (each
     dispatch ~10 s, under the watchdog).
  d. batch-4 single-dispatch 30-step denoise (expected to trip the
     watchdog — run LAST, worker needs ~3 min to recover).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp


def probe_a():
    from f_lite_tpu.ops.pallas.flash_attention import flash_attention

    b, h, l, d = 8, 10, 4112, 256
    q = jax.random.normal(jax.random.key(0), (b, h, l, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, h, l, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, h, l, d), jnp.bfloat16)

    reps = 20

    @jax.jit
    def run(q, k, v):
        def body(i, acc):
            o = flash_attention(q + acc * 0, k, v)
            return jnp.sum(o.astype(jnp.float32))

        return jax.lax.fori_loop(0, reps, body, 0.0)

    out = float(run(q, k, v))  # compile+run
    t0 = time.perf_counter()
    out = float(run(q, k, v))
    dt = (time.perf_counter() - t0) / reps
    flops = 4 * b * h * l * l * d
    print(f"probe_a flash B=8: {dt*1e3:.2f} ms/call "
          f"{flops/dt/1e12:.1f} TF/s sum={out:.3f}")


def probe_b():
    from f_lite_tpu.quant import quant_matmul, quantize_kernel

    tokens, din, dout = 8 * 4112, 2560, 3 * 2560
    x = jax.random.normal(jax.random.key(0), (tokens, din), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (din, dout), jnp.bfloat16)
    qw = quantize_kernel(w)

    reps = 30

    @jax.jit
    def run(x):
        def body(i, acc):
            y = quant_matmul(x + acc * 0, qw["w8"], qw["scale"])
            return jnp.sum(y.astype(jnp.float32))

        return jax.lax.fori_loop(0, reps, body, 0.0)

    out = float(run(x))
    t0 = time.perf_counter()
    out = float(run(x))
    dt = (time.perf_counter() - t0) / reps
    flops = 2 * tokens * din * dout
    print(f"probe_b quant_matmul B=8 tokens: {dt*1e3:.2f} ms/call "
          f"{flops/dt/1e12:.1f} TF/s sum={out:.3f}")


def _denoise(batch, steps_per_dispatch, quantized=True):
    from f_lite_tpu.models.dit import DiT, DiTConfig
    from f_lite_tpu.sampling.euler import DenoiseSettings, make_denoise_fn

    dtype = jnp.bfloat16
    cfg = DiTConfig.f_lite_7b(dtype=dtype, param_dtype=dtype,
                              scan_layers=True, quantized=quantized)
    model = DiT(cfg)
    shapes = jax.eval_shape(
        lambda: model.init_params(jax.random.key(0), text_len=128,
                                  image_size=64)
    )
    params = jax.tree.map(
        lambda s: (jnp.ones(s.shape, s.dtype) if s.dtype == jnp.int8
                   else jnp.zeros(s.shape, s.dtype)),
        shapes,
    )
    lh = lw = 128
    latents = jax.random.normal(
        jax.random.key(1), (batch, lh, lw, cfg.in_channels), dtype
    )
    pos = jax.random.normal(
        jax.random.key(2), (batch, 128, cfg.cross_attn_input_size), dtype
    )
    neg = jnp.zeros_like(pos)
    mask = jnp.ones((batch, 128), jnp.bool_)
    settings = DenoiseSettings(num_inference_steps=30, guidance_scale=6.0)
    fn = make_denoise_fn(model.apply, settings, donate=False,
                         steps_per_dispatch=steps_per_dispatch)
    t0 = time.perf_counter()
    z = fn(params, latents, pos, neg, mask)
    s = float(jnp.sum(z.astype(jnp.float32)))
    t1 = time.perf_counter()  # includes compile
    t0 = time.perf_counter()
    z = fn(params, latents, pos, neg, mask)
    s = float(jnp.sum(z.astype(jnp.float32)))
    dt = time.perf_counter() - t0
    print(f"denoise batch={batch} spd={steps_per_dispatch}: {dt:.2f} s "
          f"({dt/batch:.2f} s/img) sum={s:.3f}")


def probe_c():
    _denoise(batch=4, steps_per_dispatch=5)


def probe_d():
    _denoise(batch=4, steps_per_dispatch=None)


if __name__ == "__main__":
    which = os.environ.get("PROBE", "ab")
    for ch in which:
        globals()[f"probe_{ch}"]()
