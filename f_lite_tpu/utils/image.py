"""Image postprocessing: decoded tensors -> PIL, plus grid assembly.

Reference equivalents: `pipeline.py:324-327` (uint8 PIL postprocess) and
`f_lite/utils.py:6-22` (torchvision make_grid -> PIL).
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def to_pil_images(decoded: np.ndarray) -> list[Image.Image]:
    """(B, H, W, 3) in [-1, 1] -> list of PIL images (uint8).

    Matches `(x/2+0.5).clamp(0,1) * 255 round` (`pipeline.py:324-326`).
    """
    from f_lite_tpu import native

    x = native.denormalize_to_u8(np.asarray(decoded, dtype=np.float32))
    return [Image.fromarray(img) for img in x]


def save_with_metadata(img: Image.Image, path, params: dict) -> None:
    """Save a PNG with the generation parameters embedded as tEXt chunks.

    Every parameter lands as its own `f-lite:<key>` entry plus one
    combined JSON blob under `f-lite:parameters`, so images are
    reproducible from the file alone (the A1111/ComfyUI convention of
    parameter-stamped outputs). Non-PNG suffixes fall back to a plain
    save (JPEG has no tEXt)."""
    if str(path).lower().endswith((".png",)):
        img.save(path, pnginfo=_png_info(params))
    else:
        img.save(path)


def _png_info(params: dict):
    import json

    from PIL.PngImagePlugin import PngInfo

    info = PngInfo()
    clean = {k: v for k, v in params.items() if v is not None}
    for k, v in clean.items():
        info.add_text(f"f-lite:{k}", str(v))
    info.add_text("f-lite:parameters", json.dumps(clean))
    return info


def png_bytes_with_metadata(img: Image.Image, params: dict) -> bytes:
    """PNG-encode with the same tEXt parameter stamping as
    `save_with_metadata`, returned as bytes (HTTP serving path)."""
    import io

    buf = io.BytesIO()
    img.save(buf, format="PNG", pnginfo=_png_info(params))
    return buf.getvalue()


def read_metadata(path) -> dict:
    """Read back the `f-lite:parameters` blob from a stamped PNG
    (empty dict if absent)."""
    import json

    with Image.open(path) as im:
        raw = im.info.get("f-lite:parameters")
    return json.loads(raw) if raw else {}


def make_image_grid(
    images: list[Image.Image] | np.ndarray,
    nrow: int = 3,
    padding: int = 2,
) -> Image.Image:
    """Tile images into a grid (reference `utils.py:6-22`)."""
    if not isinstance(images, (list, tuple)):
        images = to_pil_images(images)
    if len(images) == 0:
        raise ValueError("no images to grid")
    w, h = images[0].size
    ncol = min(nrow, len(images))
    nrows = -(-len(images) // ncol)
    grid = Image.new(
        "RGB",
        (ncol * w + (ncol - 1) * padding, nrows * h + (nrows - 1) * padding),
        (0, 0, 0),
    )
    for i, img in enumerate(images):
        r, c = divmod(i, ncol)
        grid.paste(img, (c * (w + padding), r * (h + padding)))
    return grid
