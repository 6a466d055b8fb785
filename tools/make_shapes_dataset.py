"""Procedural colored-shapes dataset for the trained quality fixture.

Writes N PNGs of a single colored shape (circle / square / triangle) on a
neutral gray background plus a `data.json` metadata table consumable by
`ImageDataset(root_dir_type="json", base_url="file://")`. Captions are
"a {color} {shape}" over a small closed vocabulary, so the hermetic
`ZeroTextEncoder` (hash-seeded per-caption embeddings) gives the DiT a
distinct, deterministic conditioning vector per class — class-conditional
training with no pretrained text encoder and zero egress.

This is the data half of the standing quality fixture: a pixel-space DiT
trained on it (trainer `--pixel_space`) produces directly viewable samples
whose prompt adherence is machine-checkable (dominant shape color vs the
caption's color word — see tools/fixture_quality_audit.py), grounding the
GI / sampler-order / int8 quality audits in a *trained* velocity field
instead of random weights (the reference's analogous grounding is eval-time
image sampling during training, `train.py:1100-1155`).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np
from PIL import Image, ImageDraw

# mid-range, clearly separated RGB anchors (classification by nearest
# anchor stays unambiguous even through bf16 sampling noise)
COLORS = {
    "red": (220, 40, 40),
    "green": (40, 180, 60),
    "blue": (50, 80, 220),
    "yellow": (230, 210, 50),
    "purple": (150, 60, 200),
    "cyan": (60, 200, 210),
    "orange": (235, 140, 40),
    "white": (245, 245, 245),
}
SHAPES = ("circle", "square", "triangle")
BACKGROUND = (110, 110, 110)


def caption_for(color: str, shape: str) -> str:
    return f"a {color} {shape}"


def all_captions() -> list[str]:
    return [caption_for(c, s) for c in COLORS for s in SHAPES]


def draw_sample(size: int, color: str, shape: str,
                rng: np.random.RandomState) -> Image.Image:
    img = Image.new("RGB", (size, size), BACKGROUND)
    d = ImageDraw.Draw(img)
    # radius 30-45% of the image, center jittered so the field the model
    # learns is a distribution, not a single image per class
    r = size * rng.uniform(0.30, 0.45)
    margin = r + 1
    cx = rng.uniform(margin, size - margin)
    cy = rng.uniform(margin, size - margin)
    rgb = COLORS[color]
    if shape == "circle":
        d.ellipse([cx - r, cy - r, cx + r, cy + r], fill=rgb)
    elif shape == "square":
        d.rectangle([cx - r, cy - r, cx + r, cy + r], fill=rgb)
    else:  # triangle, apex up
        d.polygon(
            [(cx, cy - r), (cx - r, cy + r), (cx + r, cy + r)], fill=rgb
        )
    return img


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/shapes")
    ap.add_argument("--per_class", type=int, default=400)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    out = Path(args.out).resolve()
    img_dir = out / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(args.seed)

    rows = []
    for color in COLORS:
        for shape in SHAPES:
            for k in range(args.per_class):
                name = f"{color}_{shape}_{k:04d}.png"
                p = img_dir / name
                draw_sample(args.size, color, shape, rng).save(p)
                rows.append({
                    "media_path": str(p),
                    "captions": [caption_for(color, shape)],
                    "width": args.size,
                    "height": args.size,
                    "source_id": f"{color}/{shape}/{k}",
                    # ground truth for the adherence metric
                    "color": color,
                    "shape": shape,
                })
    # stable shuffle so sequential batches mix classes
    order = np.random.RandomState(args.seed + 1).permutation(len(rows))
    rows = [rows[i] for i in order]
    (out / "data.json").write_text(json.dumps(rows))
    print(f"wrote {len(rows)} images + data.json under {out}")


if __name__ == "__main__":
    main()
