"""Image-generation CLI: `python -m f_lite_tpu.generate`.

Flag parity with the reference CLI (`/root/reference/f_lite/generate.py:
13-26`): prompt, model, negative_prompt, guidance_scale=6,
num_inference_steps=30, width=1344, height=896, seed, num_images,
output_file (multi-image `_N` suffix naming, `generate.py:102-111`), APG.
`--cpu_offload` is accepted for CLI compatibility and maps to VAE tiling
(the TPU memory lever; weights are bf16-resident).
"""

from __future__ import annotations

import argparse
import logging
import time
from pathlib import Path

logger = logging.getLogger("f_lite_tpu.generate")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Generate images with an F-Lite model on TPU"
    )
    p.add_argument("--prompt", type=str, default=None,
                   help="required unless --from_png supplies one")
    p.add_argument("--from_png", type=str, default=None,
                   help="re-generate from a parameter-stamped output PNG: "
                        "its embedded f-lite:* metadata becomes the "
                        "defaults, and any flag you pass explicitly "
                        "overrides it")
    p.add_argument("--model", type=str, default="Freepik/F-Lite",
                   help="converted checkpoint dir, a diffusers-layout "
                        "snapshot dir (converted on first use), or an HF "
                        "hub repo id like the default")
    p.add_argument("--negative_prompt", type=str, default=None)
    p.add_argument("--guidance_scale", type=float, default=6.0)
    p.add_argument("--num_inference_steps", type=int, default=30)
    p.add_argument("--width", type=int, default=1344)
    p.add_argument("--height", type=int, default=896)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_images", type=int, default=1)
    p.add_argument("--output_file", type=str, default="output.png")
    p.add_argument("--apg", action="store_true",
                   help="use APG guidance instead of plain CFG")
    p.add_argument("--apg_orthogonal_threshold", type=float, default=0.03)
    p.add_argument("--cpu_offload", action="store_true",
                   help="compat flag: enables tiled VAE decode")
    p.add_argument("--vae_tiling", action="store_true")
    p.add_argument("--no_text_encoder", action="store_true",
                   help="use the hermetic pseudo text encoder (debug)")
    p.add_argument("--quantize", action="store_true",
                   help="int8 W8A8 DiT projections (dynamic act quant) (~1.7x matmuls)")
    p.add_argument("--lora_path", type=str, default=None,
                   help="LoRA checkpoint (dir or .safetensors) merged "
                        "into the DiT at load (`pt.py:108-136`)")
    p.add_argument("--lora_scale", type=float, default=1.0)
    p.add_argument("--image", type=str, default=None,
                   help="input image for image-to-image (resized to "
                        "--width x --height, VAE-encoded, partially "
                        "noised per --strength)")
    p.add_argument("--strength", type=float, default=0.8,
                   help="img2img noising strength in (0, 1]: 1.0 = full "
                        "text-to-image, small values stay close to the "
                        "input image")
    p.add_argument("--mask", type=str, default=None,
                   help="inpainting mask (requires --image): white = "
                        "repaint, black = keep; resized to the latent "
                        "grid. Use --strength 1.0 to fully regenerate "
                        "the masked region")
    p.add_argument("--guidance_interval", type=float, nargs=2,
                   default=None, metavar=("LO", "HI"),
                   help="apply CFG only while the schedule t is inside "
                        "[LO, HI]; other steps run conditional-only at "
                        "half the model cost (limited-interval guidance)")
    from f_lite_tpu.sampling.euler import SAMPLERS

    p.add_argument("--sampler", choices=SAMPLERS, default="euler",
                   help="'ab2' = second-order multistep integration at "
                        "the same per-step cost (step-count saving "
                        "depends on the trained field's smoothness — "
                        "see PERF.md 'ab2 sampler')")
    return p


def generate_images(args) -> list[Path]:
    from f_lite_tpu.ops.guidance import APGConfig
    from f_lite_tpu.pipeline import FLitePipeline

    text_encoder = None
    if args.no_text_encoder:
        from f_lite_tpu.text.encoder import ZeroTextEncoder

        text_encoder = "zero"

    pipe = FLitePipeline.from_pretrained(
        args.model, load_text_encoder=not args.no_text_encoder,
        quantize=args.quantize,
        lora_path=args.lora_path, lora_scale=args.lora_scale,
    )
    if args.no_text_encoder:
        from f_lite_tpu.text.encoder import ZeroTextEncoder

        pipe.text_encoder = ZeroTextEncoder(
            embed_dim=pipe.dit_model.config.cross_attn_input_size
        )
    if args.cpu_offload or args.vae_tiling:
        pipe.enable_vae_tiling()

    apg = (
        APGConfig(enabled=True,
                  orthogonal_threshold=args.apg_orthogonal_threshold)
        if args.apg else None
    )

    init_image = mask_image = None
    if args.image:
        from PIL import Image

        init_image = Image.open(args.image)
        if args.mask:
            mask_image = Image.open(args.mask)
    elif args.mask:
        raise SystemExit("--mask requires --image")

    t0 = time.perf_counter()
    out = pipe(
        prompt=args.prompt,
        negative_prompt=args.negative_prompt,
        height=args.height,
        width=args.width,
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale,
        num_images_per_prompt=args.num_images,
        seed=args.seed,
        apg_config=apg,
        image=init_image,
        strength=args.strength,
        mask_image=mask_image,
        guidance_interval=args.guidance_interval,
        sampler=args.sampler,
    )
    dt = time.perf_counter() - t0

    base = Path(args.output_file)
    meta = {
        "prompt": args.prompt,
        "negative_prompt": args.negative_prompt,
        "width": args.width, "height": args.height,
        "steps": args.num_inference_steps,
        "guidance_scale": args.guidance_scale,
        "guidance_interval": args.guidance_interval,
        "sampler": args.sampler,
        "seed": args.seed, "model": args.model,
        "image": args.image,
        "strength": args.strength if args.image else None,
        "mask": args.mask,
        "apg": args.apg or None,
        "quantize": args.quantize or None,
        "lora_path": args.lora_path,
    }

    def _save(img, path, index):
        if hasattr(img, "save"):  # PIL image (normal path)
            from f_lite_tpu.utils.image import save_with_metadata

            save_with_metadata(
                img, path,
                {**meta, "num_images": args.num_images,
                 "image_index": index},
            )
            return path
        # VAE-less checkpoint: the pipeline returns raw latents — write
        # them as .npy instead of crashing on PIL-only .save
        import numpy as np

        path = path.with_suffix(".npy")
        np.save(path, np.asarray(img))
        logger.warning("no VAE in checkpoint: wrote latents to %s", path)
        return path

    paths = []
    if len(out.images) == 1:
        paths.append(_save(out.images[0], base, 1))
    else:
        for i, img in enumerate(out.images, 1):
            p = base.with_name(f"{base.stem}_{i}{base.suffix}")
            paths.append(_save(img, p, i))
    logger.info("generated %d image(s) in %.2fs -> %s",
                len(paths), dt, ", ".join(map(str, paths)))
    try:  # rich console output like the reference CLI (`generate.py:10-11`)
        from rich.console import Console

        console = Console()
        console.print(
            f"[bold green]generated {len(paths)} image(s) "
            f"in {dt:.2f}s[/]"
        )
        for p in paths:
            console.print(f"  [cyan]{p}[/]")
    except ImportError:
        print(f"generated {len(paths)} image(s) in {dt:.2f}s")
        for p in paths:
            print(f"  {p}")
    return paths


# --from_png metadata key -> CLI arg name
_PNG_META_ARGS = [
    ("prompt", "prompt"), ("negative_prompt", "negative_prompt"),
    ("width", "width"), ("height", "height"),
    ("steps", "num_inference_steps"),
    ("guidance_scale", "guidance_scale"),
    ("guidance_interval", "guidance_interval"), ("seed", "seed"),
    ("model", "model"), ("image", "image"), ("strength", "strength"),
    ("mask", "mask"), ("apg", "apg"), ("quantize", "quantize"),
    ("lora_path", "lora_path"), ("num_images", "num_images"),
    ("sampler", "sampler"),
]


def _apply_png_metadata(args, parser):
    """Fill args still at their parser default from the PNG's embedded
    parameters (an explicitly-passed flag wins; passing a flag at its
    default value counts as unset — acceptable for a convenience path)."""
    from f_lite_tpu.utils.image import read_metadata

    meta = read_metadata(args.from_png)
    if not meta:
        raise SystemExit(f"{args.from_png} has no f-lite metadata")
    defaults = vars(parser.parse_args([]))
    for mk, arg in _PNG_META_ARGS:
        if mk in meta and getattr(args, arg) == defaults[arg]:
            setattr(args, arg, meta[mk])
    # one seed draws the whole batch: a file that was image k of N (or
    # batch position k in serve.py) only reappears as the k-th output of
    # an identically-batched run — --from_png restores num_images above;
    # serve.py's batched draws are not reproducible at batch 1
    if meta.get("image_index", 1) > 1:
        logger.warning(
            "--from_png source was image %s of %s: it reproduces as the "
            "%s-th output of this run, not the first",
            meta["image_index"], meta.get("num_images"),
            meta["image_index"],
        )
    if "batch_index" in meta and meta["batch_index"] > 0:
        logger.warning(
            "--from_png source was batch position %s of a serve.py batch "
            "(batch_size=%s): exact reproduction needs the same batch "
            "composition; this run will differ",
            meta["batch_index"], meta.get("batch_size"),
        )
    return args


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.from_png:
        args = _apply_png_metadata(args, parser)
    if args.prompt is None:
        parser.error("--prompt is required (or --from_png with metadata)")
    from f_lite_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()
    return generate_images(args)


if __name__ == "__main__":
    main()
