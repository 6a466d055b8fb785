"""ComfyUI node for F-Lite on TPU.

Reference: `/root/reference/f_lite/comfyui.py` (FLiteNode with model
dropdown, pipeline cache keyed on load options, APG toggle) and the root
`__init__.py` module-aliasing shim. This node drives the JAX pipeline and
hands ComfyUI a torch tensor at the boundary (ComfyUI's IMAGE format:
(B, H, W, 3) float in [0, 1]).

Install: symlink/copy the repo into ComfyUI/custom_nodes and ensure
f_lite_tpu is importable; ComfyUI discovers NODE_CLASS_MAPPINGS below.

The model dropdown lists HF hub repo ids, which `from_pretrained`
resolves directly (snapshot_download + on-the-fly conversion + cache —
convert/ingest.py), matching the reference node's auto-download
(`comfyui.py:45-60`). A local converted dir or diffusers snapshot dir
path works too.
"""

from __future__ import annotations

import numpy as np

_PIPELINE_CACHE: dict = {}

MODEL_CHOICES = [
    "Freepik/F-Lite",
    "Freepik/F-Lite-Texture",
    "Freepik/F-Lite-7B",
]


def _get_pipeline(model_path: str, vae_tiling: bool):
    key = (model_path, vae_tiling)
    pipe = _PIPELINE_CACHE.get(key)
    if pipe is None:
        from f_lite_tpu.pipeline import FLitePipeline

        pipe = FLitePipeline.from_pretrained(model_path)
        if vae_tiling:
            pipe.enable_vae_tiling()
        _PIPELINE_CACHE.clear()  # one resident pipeline (like the ref cache)
        _PIPELINE_CACHE[key] = pipe
    return pipe


class FLiteNode:
    """Text-to-image via the f-lite-tpu pipeline."""

    CATEGORY = "F-Lite"
    FUNCTION = "generate"
    RETURN_TYPES = ("IMAGE",)

    @classmethod
    def INPUT_TYPES(cls):
        from f_lite_tpu.sampling.euler import SAMPLERS

        return {
            "required": {
                "model": (MODEL_CHOICES, {"default": MODEL_CHOICES[0]}),
                "prompt": ("STRING", {"multiline": True, "default": ""}),
                "negative_prompt": ("STRING", {"multiline": True,
                                               "default": ""}),
                "width": ("INT", {"default": 1344, "min": 256, "max": 2048,
                                  "step": 16}),
                "height": ("INT", {"default": 896, "min": 256, "max": 2048,
                                   "step": 16}),
                "steps": ("INT", {"default": 30, "min": 1, "max": 100}),
                "guidance_scale": ("FLOAT", {"default": 6.0, "min": 0.0,
                                             "max": 20.0, "step": 0.5}),
                "seed": ("INT", {"default": 0, "min": 0,
                                 "max": 2**31 - 1}),
                "use_apg": ("BOOLEAN", {"default": False}),
                "vae_tiling": ("BOOLEAN", {"default": False}),
            },
            "optional": {
                # image-to-image (beyond the reference node): plug any
                # IMAGE output in and set strength < 1.0
                "image": ("IMAGE",),
                # inpainting (with image): ComfyUI MASK, 1 = repaint,
                # 0 = keep; soft values blend
                "mask": ("MASK",),
                "strength": ("FLOAT", {"default": 0.8, "min": 0.05,
                                       "max": 1.0, "step": 0.05}),
                # "ab2" integrates at second order at the same per-step
                # cost (see sampling/euler.py; validate step-count
                # savings on your checkpoint)
                "sampler": (list(SAMPLERS), {"default": "euler"}),
            },
        }

    def generate(self, model, prompt, negative_prompt, width, height,
                 steps, guidance_scale, seed, use_apg, vae_tiling,
                 image=None, mask=None, strength=0.8, sampler="euler"):
        from f_lite_tpu.ops.guidance import APGConfig

        init_images = None
        if image is not None:
            # ComfyUI IMAGE: (B, H, W, 3) float in [0, 1] (torch or np).
            # Hand the pipeline PIL images so it resizes to (width, height)
            from PIL import Image as PILImage

            arr = np.asarray(image, np.float32)
            if arr.ndim == 3:
                arr = arr[None]
            init_images = [
                PILImage.fromarray(
                    np.clip(a * 255.0, 0, 255).astype(np.uint8)
                )
                for a in arr
            ]
            if len(init_images) == 1:
                init_images = init_images[0]

        mask_images = None
        if mask is not None:
            if image is None:
                raise ValueError(
                    "mask requires an image input (inpainting repaints "
                    "the masked region of the supplied image)"
                )
            # ComfyUI MASK: (H, W) or (B, H, W) float in [0, 1], 1 =
            # masked/repaint — same polarity as the pipeline. Hand the
            # pipeline per-frame (H, W) float arrays (it bilinear-resizes
            # to the latent grid; a (B, H, W) array would be misread as
            # (H, W, C)). A single mask broadcasts over batched IMAGE
            # frames inside the pipeline (_preprocess_mask).
            m = np.asarray(mask, np.float32)
            if m.ndim == 2:
                m = m[None]
            mask_images = list(m) if m.shape[0] > 1 else m[0]

        pipe = _get_pipeline(model, vae_tiling)
        # a batched IMAGE input (B frames) generates one variation per
        # frame: the single prompt is repeated to match the image batch
        n_per_prompt = (
            len(init_images) if isinstance(init_images, list) else 1
        )
        out = pipe(
            prompt=prompt,
            negative_prompt=negative_prompt or None,
            width=width, height=height,
            num_inference_steps=steps,
            guidance_scale=guidance_scale,
            seed=seed,
            num_images_per_prompt=n_per_prompt,
            apg_config=APGConfig(enabled=True) if use_apg else None,
            output_type="np",
            image=init_images,
            mask_image=mask_images,
            strength=strength,
            sampler=sampler,
        )
        # ComfyUI IMAGE: torch float tensor (B, H, W, 3) in [0, 1]
        imgs = np.clip(np.asarray(out.images) / 2.0 + 0.5, 0.0, 1.0)
        try:
            import torch

            return (torch.from_numpy(imgs.astype(np.float32)),)
        except ImportError:  # headless testing without torch
            return (imgs.astype(np.float32),)


NODE_CLASS_MAPPINGS = {"FLiteTPU": FLiteNode}
NODE_DISPLAY_NAME_MAPPINGS = {"FLiteTPU": "F-Lite (TPU)"}
