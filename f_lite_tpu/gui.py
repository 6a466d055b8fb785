"""Gradio GUI for F-Lite on TPU.

Reference: `/root/reference/f_lite_gradio_gui.py` (931 L). Feature parity:
- preset resolutions (`f_lite_gradio_gui.py:71-83`);
- `{a|b}` choice and `__file__` wildcard expansion (`:111-147`) — the pure
  expansion logic lives here (testable without gradio);
- prompt prefix/suffix, APG controls, negative prompt;
- seed lock vs shuffle-every-generation;
- "generate forever" loop with cooperative cancellation (`:87-109`);
- SuperPrompt prompt enhancement (torch-CPU, optional);
- dated output files (`:394-405`), pipeline singleton (`:173-194`).

`python -m f_lite_tpu.gui --model <dir>` (requires gradio installed).
"""

from __future__ import annotations

import datetime
import random
import re
import threading
from pathlib import Path

PRESET_RESOLUTIONS = {
    "1344x896 (landscape)": (1344, 896),
    "896x1344 (portrait)": (896, 1344),
    "1024x1024 (square)": (1024, 1024),
    "1152x864": (1152, 864),
    "1280x720 (16:9)": (1280, 720),
    "512x512 (fast)": (512, 512),
}

_WILDCARD_RE = re.compile(r"\{([^{}]*)\}")
_FILE_RE = re.compile(r"__([A-Za-z0-9_\-/]+)__")


def expand_wildcards(
    prompt: str, rng: random.Random | None = None,
    wildcard_dir: str | Path = "wildcards", max_depth: int = 10,
) -> str:
    """Expand `{a|b|c}` choices and `__name__` wildcard-file references.

    `__name__` resolves to a random line of `{wildcard_dir}/name.txt`.
    Nested constructs expand up to `max_depth` passes
    (`f_lite_gradio_gui.py:111-147` semantics).
    """
    rng = rng or random.Random()
    wdir = Path(wildcard_dir)

    for _ in range(max_depth):
        changed = False

        def choice_sub(m):
            nonlocal changed
            changed = True
            options = m.group(1).split("|")
            return rng.choice(options)

        prompt = _WILDCARD_RE.sub(choice_sub, prompt)

        def file_sub(m):
            nonlocal changed
            name = m.group(1)
            f = wdir / f"{name}.txt"
            if not f.exists():
                return m.group(0)
            lines = [
                l.strip() for l in f.read_text().splitlines() if l.strip()
            ]
            if not lines:
                return ""
            changed = True
            return rng.choice(lines)

        prompt = _FILE_RE.sub(file_sub, prompt)
        if not changed:
            break
    return prompt


def compose_prompt(prompt: str, prefix: str = "", suffix: str = "") -> str:
    parts = [p.strip() for p in (prefix, prompt, suffix) if p and p.strip()]
    return ", ".join(parts)


def dated_output_path(output_dir: str | Path, ext: str = "png") -> Path:
    """`outputs/YYYY-MM-DD/HHMMSS_<rand>.png` (`:394-405` semantics)."""
    now = datetime.datetime.now()
    d = Path(output_dir) / now.strftime("%Y-%m-%d")
    d.mkdir(parents=True, exist_ok=True)
    return d / f"{now.strftime('%H%M%S')}_{random.randrange(16**4):04x}.{ext}"


class SuperPromptEnhancer:
    """T5-based prompt expansion (roborovski/superprompt-v1), torch-CPU,
    lazy-loaded (`f_lite_gradio_gui.py:38-68`)."""

    def __init__(self, model_path: str = "roborovski/superprompt-v1"):
        self.model_path = model_path
        self._model = None
        self._tok = None

    def enhance(self, prompt: str, max_new_tokens: int = 256) -> str:
        if self._model is None:
            from transformers import AutoTokenizer, T5ForConditionalGeneration

            self._tok = AutoTokenizer.from_pretrained(self.model_path)
            self._model = T5ForConditionalGeneration.from_pretrained(
                self.model_path
            )
        inp = self._tok(
            f"Expand the following prompt to add more detail: {prompt}",
            return_tensors="pt",
        )
        out = self._model.generate(**inp, max_new_tokens=max_new_tokens)
        return self._tok.decode(out[0], skip_special_tokens=True)


class GenerationController:
    """Cooperative cancellation for generate-forever (`:87-109`)."""

    def __init__(self):
        self._stop = threading.Event()

    def request_stop(self):
        self._stop.set()

    def reset(self):
        self._stop.clear()

    @property
    def should_stop(self) -> bool:
        return self._stop.is_set()


_PIPE = None


def get_pipeline(model_path: str):
    global _PIPE
    if _PIPE is None:
        from f_lite_tpu.pipeline import FLitePipeline

        _PIPE = FLitePipeline.from_pretrained(model_path)
    return _PIPE


def build_app(model_path: str, output_dir: str = "outputs",
              wildcard_dir: str = "wildcards"):
    import gradio as gr

    from f_lite_tpu.ops.guidance import APGConfig

    controller = GenerationController()
    enhancer = SuperPromptEnhancer()

    def generate(prompt, negative, prefix, suffix, preset, steps, guidance,
                 use_apg, apg_threshold, seed, lock_seed, forever,
                 use_superprompt, init_image=None, mask_image=None,
                 strength=0.8, sampler="euler"):
        controller.reset()
        pipe = get_pipeline(model_path)
        width, height = PRESET_RESOLUTIONS[preset]
        images = []
        while True:
            actual_seed = seed if lock_seed else random.randrange(2**31)
            p = expand_wildcards(prompt, wildcard_dir=wildcard_dir)
            p = compose_prompt(p, prefix, suffix)
            if use_superprompt:
                p = enhancer.enhance(p)
            out = pipe(
                prompt=p,
                negative_prompt=negative or None,
                width=width, height=height,
                num_inference_steps=int(steps),
                guidance_scale=guidance,
                seed=int(actual_seed),
                apg_config=APGConfig(
                    enabled=True, orthogonal_threshold=apg_threshold
                ) if use_apg else None,
                # Stop lands mid-trajectory at the next dispatch boundary
                # (the reference GUI's step-callback cancel, `:87-109`)
                callback=lambda done, total: controller.should_stop,
                image=init_image,
                # a mask uploaded without an input image is ignored (the
                # accordion pairs them; the pipeline would reject it)
                mask_image=mask_image if init_image is not None else None,
                strength=float(strength),
                sampler=sampler,
            )
            img = out.images[0]
            path = dated_output_path(output_dir)
            from f_lite_tpu.utils.image import save_with_metadata

            save_with_metadata(img, path, {
                "prompt": p, "negative_prompt": negative or None,
                "width": width, "height": height, "steps": int(steps),
                "guidance_scale": guidance, "seed": int(actual_seed),
                "apg": bool(use_apg) or None,
                "strength": float(strength) if init_image is not None
                else None,
                "inpaint": (init_image is not None and
                            mask_image is not None) or None,
                "sampler": sampler,
                "model": model_path,
            })
            images.append(img)
            yield images, str(path), actual_seed
            if not forever or controller.should_stop:
                return

    with gr.Blocks(title="F-Lite TPU") as app:
        gr.Markdown("# F-Lite (TPU)")
        with gr.Row():
            with gr.Column():
                prompt = gr.Textbox(label="Prompt", lines=3)
                negative = gr.Textbox(label="Negative prompt", lines=1)
                prefix = gr.Textbox(label="Prefix", lines=1)
                suffix = gr.Textbox(label="Suffix", lines=1)
                preset = gr.Dropdown(
                    list(PRESET_RESOLUTIONS), label="Resolution",
                    value="1344x896 (landscape)",
                )
                steps = gr.Slider(1, 100, 30, step=1, label="Steps")
                guidance = gr.Slider(0, 20, 6.0, step=0.5, label="CFG")
                use_apg = gr.Checkbox(label="APG guidance", value=False)
                apg_threshold = gr.Slider(
                    0.0, 0.2, 0.03, step=0.005,
                    label="APG orthogonal threshold",
                )
                seed = gr.Number(label="Seed", value=0, precision=0)
                lock_seed = gr.Checkbox(label="Lock seed", value=False)
                forever = gr.Checkbox(label="Generate forever", value=False)
                use_superprompt = gr.Checkbox(
                    label="SuperPrompt enhance", value=False
                )
                from f_lite_tpu.sampling.euler import SAMPLERS

                sampler = gr.Dropdown(
                    list(SAMPLERS), label="Sampler", value="euler",
                )
                with gr.Accordion("Image to image", open=False):
                    init_image = gr.Image(
                        label="Input image (optional)", type="pil",
                    )
                    mask_image = gr.Image(
                        label="Inpaint mask (optional; white = repaint, "
                              "black = keep, gray blends)", type="pil",
                    )
                    strength = gr.Slider(
                        0.05, 1.0, 0.8, step=0.05, label="Strength",
                    )
                go = gr.Button("Generate", variant="primary")
                stop = gr.Button("Stop")
            with gr.Column():
                gallery = gr.Gallery(label="Results")
                last_path = gr.Textbox(label="Saved to")
                used_seed = gr.Number(label="Used seed", precision=0)
        go.click(
            generate,
            [prompt, negative, prefix, suffix, preset, steps, guidance,
             use_apg, apg_threshold, seed, lock_seed, forever,
             use_superprompt, init_image, mask_image, strength,
             sampler],
            [gallery, last_path, used_seed],
        )
        stop.click(lambda: controller.request_stop(), [], [])
    return app


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--output_dir", default="outputs")
    p.add_argument("--wildcard_dir", default="wildcards")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--share", action="store_true")
    args = p.parse_args(argv)
    try:
        import gradio  # noqa: F401
    except ImportError:
        raise SystemExit(
            "gradio is not installed; the GUI requires `pip install gradio`"
        )
    app = build_app(args.model, args.output_dir, args.wildcard_dir)
    app.queue().launch(server_port=args.port, share=args.share)


if __name__ == "__main__":
    main()
