"""Capture a jax.profiler trace of the denoise hot path.

The reference has no profiler integration (SURVEY.md §5.1); this is the
perf-debugging entry point: writes a TensorBoard-loadable trace of N
denoise steps (and optionally the VAE decode) for a given model config.

  python tools/profile_forward.py --out /tmp/trace --steps 4 --size 512
  tensorboard --logdir /tmp/trace   # -> Profile tab
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="converted checkpoint dir (default: zeros 7B)")
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--text_len", type=int, default=128)
    p.add_argument("--scan_layers", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from f_lite_tpu.models.dit import DiT, DiTConfig
    from f_lite_tpu.sampling.euler import DenoiseSettings, make_denoise_fn

    if args.checkpoint:
        from f_lite_tpu.pipeline import FLitePipeline

        pipe = FLitePipeline.from_pretrained(args.checkpoint,
                                             load_text_encoder=False)
        model, params = pipe.dit_model, pipe.dit_params
    else:
        cfg = DiTConfig.f_lite_7b(
            dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
            scan_layers=args.scan_layers,
        )
        model = DiT(cfg)
        shapes = jax.eval_shape(
            lambda: model.init_params(jax.random.key(0),
                                      text_len=args.text_len, image_size=64)
        )
        params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    cfg = model.config
    lat = args.size // 8
    latents = jax.random.normal(
        jax.random.key(1), (args.batch, lat, lat, cfg.in_channels),
        cfg.dtype,
    )
    pos = jnp.zeros(
        (args.batch, args.text_len, cfg.cross_attn_input_size), cfg.dtype
    )
    neg = jnp.zeros_like(pos)
    mask = jnp.ones((args.batch, args.text_len), jnp.bool_)

    fn = make_denoise_fn(
        model.apply, DenoiseSettings(num_inference_steps=args.steps),
        donate=False,
    )
    # warmup/compile outside the trace
    float(jnp.sum(fn(params, latents, pos, neg, mask).astype(jnp.float32)))

    jax.profiler.start_trace(args.out)
    t0 = time.perf_counter()
    out = fn(params, latents, pos, neg, mask)
    val = float(jnp.sum(out.astype(jnp.float32)))
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"traced {args.steps} steps in {dt:.2f}s -> {args.out}  "
          f"(checksum {val:.3e})")


if __name__ == "__main__":
    main()
