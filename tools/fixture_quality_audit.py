"""Quality audits grounded in the TRAINED shapes fixture (not random weights).

Loads the pixel-space DiT trained by the quality-fixture run (trainer
`--pixel_space` on tools/make_shapes_dataset.py data), samples it across
serving variants, and scores each variant with machine-checkable prompt
adherence — does the generated image contain a shape of the captioned
color and the captioned geometry?

Adherence classifiers (no learned judge, pure geometry):
- color: mean RGB over non-background pixels -> nearest COLORS anchor;
- shape: fill ratio of the shape's bounding box — triangle 0.5,
  circle pi/4, square 1.0 -> nearest.

Variants:
- full CFG (g=6) euler@N        — the baseline + committed sample grid
- no CFG (g=1)                  — shows guidance materially lifts adherence
- limited-interval CFG windows  — the GI serving preset's cost in adherence
  and PSNR on a trained field (QUALITY_GI.json measured divergence on
  random weights; this grounds it in images)
- euler@N/2, ab2@N/2, ab2@N     — sampler-order claims on a SMOOTH trained
  velocity field (SAMPLER_AB2.json's open question)
- int8 W8A8                     — quantization drift in adherence + PSNR

The reference's counterpart for all of this is eyeballing eval images
during training (`train.py:1100-1155`); here the check is quantitative and
rerunnable in CI. Writes one JSON artifact + PNG grids.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))
from make_shapes_dataset import BACKGROUND, COLORS, SHAPES, caption_for  # noqa: E402


# ---------------------------------------------------------------------------
# adherence classifiers
# ---------------------------------------------------------------------------

def classify(img: np.ndarray) -> tuple[str | None, str | None]:
    """img: (H, W, 3) float in [-1, 1] -> (color_name, shape_name)."""
    rgb = (np.clip(img, -1, 1) + 1.0) * 127.5  # [0, 255]
    bg = np.asarray(BACKGROUND, np.float32)
    dist = np.linalg.norm(rgb - bg, axis=-1)
    mask = dist > 60.0
    if mask.mean() < 0.02:  # no discernible shape
        return None, None
    mean_rgb = rgb[mask].mean(axis=0)
    color = min(
        COLORS, key=lambda c: np.linalg.norm(mean_rgb - np.asarray(COLORS[c]))
    )
    ys, xs = np.nonzero(mask)
    bh = ys.max() - ys.min() + 1
    bw = xs.max() - xs.min() + 1
    fill = mask.sum() / float(bh * bw)
    ratios = {"triangle": 0.5, "circle": np.pi / 4, "square": 0.97}
    shape = min(ratios, key=lambda s: abs(fill - ratios[s]))
    return color, shape


def adherence(images: np.ndarray, prompts: list[tuple[str, str]]) -> dict:
    """images: (B, H, W, 3) in [-1,1]; prompts: [(color, shape)] * B."""
    color_ok = shape_ok = both_ok = blank = 0
    for img, (color, shape) in zip(images, prompts):
        c, s = classify(img)
        if c is None:
            blank += 1
            continue
        color_ok += c == color
        shape_ok += s == shape
        both_ok += (c == color) and (s == shape)
    n = len(prompts)
    return {
        "n": n,
        "color_acc": round(color_ok / n, 4),
        "shape_acc": round(shape_ok / n, 4),
        "both_acc": round(both_ok / n, 4),
        "blank_frac": round(blank / n, 4),
    }


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 2.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return round(float(10 * np.log10(peak * peak / mse)), 2)


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pipeline", default="artifacts/fixture_run/pipeline")
    ap.add_argument("--out", default="QUALITY_FIXTURE.json")
    ap.add_argument("--grid_dir", default="artifacts/fixture_run")
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--guidance_scale", type=float, default=6.0)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16",
                    help="compute dtype. On CPU hosts (chip down) float32 "
                         "avoids the ~4x bf16-emulation slowdown; all "
                         "variants share the dtype so the comparative "
                         "claims are unchanged.")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from f_lite_tpu.pipeline import FLitePipeline
    from f_lite_tpu.quant import quantize_dit_params
    from f_lite_tpu.sampling.euler import DenoiseSettings, make_denoise_fn
    from f_lite_tpu.text.encoder import ZeroTextEncoder
    from f_lite_tpu.utils.image import make_image_grid

    pipe = FLitePipeline.from_pretrained(args.pipeline,
                                         dtype=getattr(jnp, args.dtype),
                                         load_text_encoder=False)
    model = pipe.dit_model
    cfg = model.config
    assert pipe.vae is None, "fixture pipelines are pixel-space (no VAE)"
    dtype = cfg.dtype

    enc = ZeroTextEncoder(embed_dim=cfg.cross_attn_input_size, seq_len=32)
    classes = [(c, s) for c in COLORS for s in SHAPES]
    prompts = [caption_for(c, s) for c, s in classes]
    embeds, mask = enc.encode(prompts)
    b = len(prompts) * args.seeds
    pos = jnp.asarray(np.tile(embeds, (args.seeds, 1, 1)), dtype)
    msk = jnp.asarray(np.tile(mask, (args.seeds, 1)))
    neg = jnp.zeros_like(pos)
    truth_classes = classes * args.seeds

    latents = jax.random.normal(
        jax.random.key(0), (b, args.size, args.size, cfg.in_channels), dtype
    )

    params = pipe.dit_params
    qparams = quantize_dit_params(params)
    qmodel = type(model)(dataclasses.replace(cfg, quantized=True))

    def sample(settings, p=params, m=model):
        fn = make_denoise_fn(m.apply, settings, donate=False)
        z = fn(p, latents, pos, neg, msk)
        return np.asarray(z.astype(jnp.float32))

    g = args.guidance_scale
    n = args.steps
    runs: dict[str, dict] = {}
    images: dict[str, np.ndarray] = {}

    def record(name, imgs, ref=None, extra=None):
        images[name] = imgs
        row = adherence(imgs, truth_classes)
        if ref is not None:
            row["psnr_db_vs_full"] = psnr(imgs, images[ref])
            row["mse_vs_full"] = round(
                float(np.mean((imgs - images[ref]) ** 2)), 6
            )
        if extra:
            row.update(extra)
        runs[name] = row
        print(name, "->", row, flush=True)

    record(f"full_cfg_euler@{n}",
           sample(DenoiseSettings(num_inference_steps=n, guidance_scale=g)))
    full = f"full_cfg_euler@{n}"
    record("no_cfg", sample(
        DenoiseSettings(num_inference_steps=n, guidance_scale=1.0)))
    for lo, hi in ((0.1, 0.9), (0.17, 0.87)):
        record(f"gi{lo:g}-{hi:g}", sample(DenoiseSettings(
            num_inference_steps=n, guidance_scale=g,
            guidance_interval=(lo, hi))), ref=full)
    record(f"euler@{n // 2}", sample(
        DenoiseSettings(num_inference_steps=n // 2, guidance_scale=g)),
        ref=full)
    record(f"ab2@{n // 2}", sample(DenoiseSettings(
        num_inference_steps=n // 2, guidance_scale=g, method="ab2")),
        ref=full)
    record(f"ab2@{n}", sample(DenoiseSettings(
        num_inference_steps=n, guidance_scale=g, method="ab2")), ref=full)
    record("int8_w8a8", sample(
        DenoiseSettings(num_inference_steps=n, guidance_scale=g),
        p=qparams, m=qmodel), ref=full)

    # sampler-order headline on the trained (smooth) field: does ab2 at
    # half the steps match euler at full? (SAMPLER_AB2.json could not
    # answer this on random weights)
    ab2_half = runs[f"ab2@{n // 2}"]
    euler_half = runs[f"euler@{n // 2}"]
    order_headline = {
        "claim": f"ab2@{n // 2} closer to full-step trajectory than "
                 f"euler@{n // 2} (trained field)",
        "holds": ab2_half["mse_vs_full"] < euler_half["mse_vs_full"],
        "ab2_half_mse": ab2_half["mse_vs_full"],
        "euler_half_mse": euler_half["mse_vs_full"],
    }

    grid_dir = Path(args.grid_dir)
    grid_dir.mkdir(parents=True, exist_ok=True)
    grids = {}
    for name in (full, "no_cfg", "gi0.1-0.9", "int8_w8a8"):
        # one sample per class, labeled grid
        imgs = images[name][: len(classes)]
        grid = make_image_grid(imgs, nrow=len(SHAPES))
        p = grid_dir / f"grid_{name.replace('@', '_at_')}.png"
        grid.save(p)
        grids[name] = str(p)

    out = {
        "pipeline": str(args.pipeline),
        "model": {
            "hidden_size": cfg.hidden_size, "depth": cfg.depth,
            "num_heads": cfg.num_heads, "in_channels": cfg.in_channels,
            "residual_v": cfg.residual_v,
        },
        "protocol": {
            "classes": len(classes), "seeds": args.seeds,
            "samples_per_variant": b, "steps": n, "guidance_scale": g,
            "size_px": args.size,
            "adherence": "geometric classifiers (color anchor + bbox fill "
                         "ratio), tools/fixture_quality_audit.py",
        },
        "runs": runs,
        "order_headline": order_headline,
        "grids": grids,
    }
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
