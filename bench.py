"""Benchmark harness: F-Lite-7B 1024px 30-step generation on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric (BASELINE.md north star): 1024px 30-step images/min/chip.
The reference publishes no perf numbers; the north-star target is 7B
1024x1024 30-step < 4 s p50 on v5e-8, i.e. 32 chip-seconds/image ==
1.875 images/min/chip. `vs_baseline` = measured / 1.875 (>1 beats target).

The timed path is the full latent trajectory (30-step CFG-batched Euler
scan, one jit) + bf16 VAE decode — the compute-dominant 95%+ of prompt->PNG
(`SURVEY.md §3.1`); text encoding is excluded (cached-embedding serving
path, `precomputed_utils.py` semantics). Weights are zero-filled: values
don't affect TPU kernel timing.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("F_LITE_BENCH_STEPS", "30")

TARGET_IMAGES_PER_MIN_PER_CHIP = 60.0 / 32.0  # north-star: 4s p50 on 8 chips


def main():
    import jax
    import jax.numpy as jnp

    from f_lite_tpu.models.dit import DiT, DiTConfig
    from f_lite_tpu.models.vae import AutoencoderKL, VAEConfig
    from f_lite_tpu.sampling.euler import DenoiseSettings, make_denoise_fn

    steps = int(os.environ["F_LITE_BENCH_STEPS"])
    height = width = int(os.environ.get("F_LITE_BENCH_SIZE", "1024"))
    batch = int(os.environ.get("F_LITE_BENCH_BATCH", "1"))
    dtype = jnp.bfloat16

    # scan_layers: same math/perf as unrolled (verified), 8.8x faster compile
    quantized = os.environ.get("F_LITE_BENCH_QUANT", "1") == "1"
    cfg = DiTConfig.f_lite_7b(dtype=dtype, param_dtype=dtype,
                              scan_layers=True, quantized=quantized)
    model = DiT(cfg)
    shapes = jax.eval_shape(
        lambda: model.init_params(jax.random.key(0), text_len=128,
                                  image_size=64)
    )
    if quantized:
        # non-zero int8 weights so the MXU path is exercised realistically
        params = jax.tree.map(
            lambda s: (jnp.ones(s.shape, s.dtype) if s.dtype == jnp.int8
                       else jnp.zeros(s.shape, s.dtype)),
            shapes,
        )
    else:
        params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    vae_cfg = VAEConfig.flux(dtype=dtype, param_dtype=dtype)
    vae = AutoencoderKL(vae_cfg)
    vae_shapes = jax.eval_shape(
        lambda: vae.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3), dtype))
    )
    vae_params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), vae_shapes
    )

    lh, lw = height // 8, width // 8
    text_len = 128
    latents = jax.random.normal(
        jax.random.key(1), (batch, lh, lw, cfg.in_channels), dtype
    )
    pos = jax.random.normal(
        jax.random.key(2), (batch, text_len, cfg.cross_attn_input_size),
        dtype,
    )
    neg = jnp.zeros_like(pos)
    mask = jnp.ones((batch, text_len), jnp.bool_)

    settings = DenoiseSettings(num_inference_steps=steps, guidance_scale=6.0)
    spd = os.environ.get("F_LITE_BENCH_DISPATCH_STEPS")
    denoise = make_denoise_fn(
        model.apply, settings, donate=False,
        steps_per_dispatch=int(spd) if spd else None,
    )

    def _decode(p, z):
        z = z / vae_cfg.scaling_factor + vae_cfg.shift_factor
        if batch > 1:
            # sliced decode (the `enable_slicing` memory mode): per-sample
            # map keeps peak decoder activations batch-independent
            return jax.lax.map(
                lambda zi: vae.apply(
                    p, zi[None], method=AutoencoderKL.decode
                )[0],
                z,
            )
        return vae.apply(p, z, method=AutoencoderKL.decode)

    decode = jax.jit(_decode)

    def run():
        z = denoise(params, latents, pos, neg, mask)
        img = decode(vae_params, z)
        return float(jnp.sum(img.astype(jnp.float32)))  # force materialize

    run()  # compile + warmup
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    p50 = sorted(times)[len(times) // 2]
    images_per_min = 60.0 * batch / p50

    mode = "int8-weight-only" if quantized else "bf16"
    print(json.dumps({
        "metric": (
            f"F-Lite-7B {height}px {steps}-step images/min/chip ({mode})"
        ),
        "value": round(images_per_min, 4),
        "unit": "images/min/chip",
        "vs_baseline": round(
            images_per_min / TARGET_IMAGES_PER_MIN_PER_CHIP, 4
        ),
        "p50_seconds_per_image": round(p50 / batch, 3),
        "mode": mode,
    }))


if __name__ == "__main__":
    main()
