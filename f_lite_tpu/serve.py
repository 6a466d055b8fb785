"""Batched serving: many prompts -> PNGs at maximum chip utilization.

The north-star serving mode (BASELINE.json): drive the denoiser in fixed-
shape batches straight from precomputed text-embedding caches (the
`precompute_embeddings.py` serving path), optionally tensor-parallel over
an ICI mesh. One jit compilation per (batch, resolution, steps) key; the
denoise trajectory is the scan-under-jit sampler, so steady-state serving
is one dispatch per batch.

  python -m f_lite_tpu.serve --model <dir> --prompts prompts.txt \
      --batch_size 4 --width 1024 --height 1024 --steps 30 \
      [--precomputed_dir <cache>] [--tp 4] --output_dir outs/
"""

from __future__ import annotations

import argparse
import json
import logging
import time
from pathlib import Path

from f_lite_tpu.utils.image import save_with_metadata

logger = logging.getLogger("f_lite_tpu.serve")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="batched F-Lite serving")
    p.add_argument("--model", required=True)
    p.add_argument("--prompts", required=True,
                   help="text file, one prompt per line")
    # batch 1 is the optimal single-chip config (PERF.md: batch-1 already
    # saturates the MXU at 7B/1024px; batching pays off across chips)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--guidance_scale", type=float, default=6.0)
    p.add_argument("--guidance_interval", type=float, nargs=2,
                   default=None, metavar=("LO", "HI"),
                   help="CFG only while the schedule t is inside "
                        "[LO, HI]; other steps run conditional-only at "
                        "half the model cost")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--precomputed_dir", type=str, default=None,
                   help="serve text embeddings from a precompute cache")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel ways over local devices")
    p.add_argument("--output_dir", type=str, default="outputs")
    p.add_argument("--no_text_encoder", action="store_true")
    p.add_argument("--quantize", action="store_true",
                   help="int8 weight-only DiT projections (~1.7x matmuls)")
    p.add_argument("--steps_per_dispatch", type=int, default=None,
                   help="split the denoise trajectory into dispatches of "
                        "at most N steps; default auto-bounds dispatch "
                        "wall time (long-dispatch watchdogs), 0 forces a "
                        "single dispatch")
    from f_lite_tpu.sampling.euler import SAMPLERS

    p.add_argument("--sampler", choices=SAMPLERS, default="euler",
                   help="'ab2' = second-order multistep integration at "
                        "the same per-step cost (step-count saving "
                        "depends on the trained field's smoothness — "
                        "see PERF.md 'ab2 sampler')")
    return p.parse_args(argv)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)

    import jax
    import numpy as np

    from f_lite_tpu.pipeline import FLitePipeline
    from f_lite_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()

    prompts = [
        l.strip() for l in Path(args.prompts).read_text().splitlines()
        if l.strip()
    ]
    if not prompts:
        raise SystemExit(f"no prompts in {args.prompts}")

    pad_heads_to = None
    if args.tp > 1:
        # tp must divide the attention head count; if it doesn't (7B: 10
        # heads, 10B: 12 on a v5e-8), zero-pad heads to the next multiple
        # — exact, see DiTConfig.padded_heads
        dit_cfg = json.loads(
            (Path(args.model) / "dit" / "config.json").read_text()
        )
        heads = dit_cfg.get("num_heads", 12)
        if heads % args.tp:
            pad_heads_to = -(-heads // args.tp) * args.tp
            logger.info("padding %d heads -> %d for tp=%d",
                        heads, pad_heads_to, args.tp)

    pipe = FLitePipeline.from_pretrained(
        args.model,
        load_text_encoder=not (args.precomputed_dir or args.no_text_encoder),
        quantize=args.quantize,
        pad_heads_to=pad_heads_to,
    )
    if args.precomputed_dir:
        from f_lite_tpu.text.encoder import PrecomputedTextEncoder

        pipe.text_encoder = PrecomputedTextEncoder(args.precomputed_dir)
    elif args.no_text_encoder:
        from f_lite_tpu.text.encoder import ZeroTextEncoder

        pipe.text_encoder = ZeroTextEncoder(
            embed_dim=pipe.dit_model.config.cross_attn_input_size
        )

    if args.tp > 1:
        from f_lite_tpu.parallel import create_mesh, infer_param_shardings, \
            shard_params

        mesh = create_mesh(dp=1, fsdp=1, tp=args.tp,
                           devices=jax.devices()[: args.tp])
        model = pipe.dit_model

        def boxed_init():
            return model.init(jax.random.key(0), *_dummy_inputs(model.config))

        shardings = infer_param_shardings(boxed_init, mesh)
        pipe.dit_params = shard_params(pipe.dit_params, shardings)
        # engage the model's activation sharding annotations for every
        # denoise trace below (clean Megatron collective schedule)
        from f_lite_tpu.parallel.mesh import use_mesh_rules

        use_mesh_rules(mesh)
        logger.info("sharded DiT tensor-parallel over %d chips", args.tp)

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    # pad the final batch so every dispatch reuses one compiled shape
    bs = args.batch_size
    n = len(prompts)
    padded = prompts + [prompts[-1]] * ((-n) % bs)

    results = []
    # PNG encode+write happens on threads so the chip starts the next
    # batch's denoise while the host serializes the previous images
    from concurrent.futures import ThreadPoolExecutor

    saver = ThreadPoolExecutor(2)
    pending = []
    t_start = time.perf_counter()
    for bi in range(0, len(padded), bs):
        chunk = padded[bi : bi + bs]
        t0 = time.perf_counter()
        out = pipe(
            prompt=chunk,
            height=args.height, width=args.width,
            num_inference_steps=args.steps,
            guidance_scale=args.guidance_scale,
            guidance_interval=args.guidance_interval,
            seed=args.seed + bi,
            steps_per_dispatch=args.steps_per_dispatch,
            sampler=args.sampler,
        )
        dt = time.perf_counter() - t0
        for j, img in enumerate(out.images):
            idx = bi + j
            if idx >= n:
                break
            f = out_dir / f"{idx:05d}.png"
            pending.append(saver.submit(save_with_metadata, img, f, {
                "prompt": prompts[idx], "seed": args.seed + bi,
                "width": args.width, "height": args.height,
                "steps": args.steps,
                "guidance_scale": args.guidance_scale,
                "guidance_interval": args.guidance_interval,
                "sampler": args.sampler,
                "model": args.model,
                "quantize": args.quantize or None,
                # one seed draws the whole batch: exact reproduction
                # needs the same batch composition (--from_png warns)
                "batch_size": bs, "batch_index": j,
            }))
            results.append({"prompt": prompts[idx], "file": str(f)})
        logger.info("batch %d: %.2fs (%.2fs/image)",
                    bi // bs, dt, dt / len(chunk))
    for fut in pending:
        fut.result()  # surface write errors; all files durable
    saver.shutdown()
    wall = time.perf_counter() - t_start
    manifest = {
        "images": results,
        "wall_s": wall,
        "images_per_min": 60.0 * n / wall,
    }
    (out_dir / "manifest.json").write_text(json.dumps(manifest, indent=2))
    print(json.dumps({
        "images": n, "wall_s": round(wall, 2),
        "images_per_min": round(60.0 * n / wall, 2),
    }))
    return manifest


def _dummy_inputs(cfg):
    import jax.numpy as jnp

    return (
        jnp.zeros((1, 32, 32, cfg.in_channels), cfg.dtype),
        jnp.zeros((1, 32, cfg.cross_attn_input_size), cfg.dtype),
        jnp.ones((1, 32), jnp.bool_),
        jnp.zeros((1,), cfg.dtype),
    )


if __name__ == "__main__":
    main()
