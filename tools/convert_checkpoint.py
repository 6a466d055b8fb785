"""Convert reference-format checkpoints to the f-lite-tpu layout.

Reference equivalents: `pt.py` (raw .pt -> pipeline, depth inference,
prefix stripping) and `f_lite_to_hf.py` (converter CLI with a smoke-test
image before saving).

Inputs:
- `--pt model.pt`            raw torch DiT state dict (released F-Lite .pt)
- `--hf_dir <dir>`           diffusers save_pretrained layout: DiT weights
                             under dit_model/ (or transformer/), VAE under
                             vae/, text encoder + tokenizer as HF dirs
- `--export_torch <dir>`     REVERSE direction: a framework checkpoint dir
                             (dit/config.json + flax_params.safetensors) ->
                             the reference's diffusers repo layout
                             (`f_lite_to_hf.py:57-132`: dit_model/, vae/,
                             model_index.json) plus, with `--pt_file`, a raw
                             torch `.pt` state dict loadable by `pt.py:15`.
Output: `--output_dir` in the layout `FLitePipeline.from_pretrained` reads
(dit/config.json + flax_params.safetensors, vae/..., text_encoder passthru),
or — for `--export_torch` — the reference-consumable layout above.

A `--test_image` smoke test (like `f_lite_to_hf.py:100-120`) generates a
small image through the converted pipeline before declaring success.

Usage:
  python tools/convert_checkpoint.py --pt f_lite_7b.pt --width 2560 \
      --output_dir ./f-lite-7b-tpu
  python tools/convert_checkpoint.py --hf_dir Freepik_F-Lite_snapshot \
      --output_dir ./f-lite-tpu --test_image
  python tools/convert_checkpoint.py --export_torch ./f-lite-7b-tpu \
      --output_dir ./f-lite-7b-hf --pt_file ./f_lite_7b_roundtrip.pt
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logger = logging.getLogger("convert")


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--pt", type=str, help="raw .pt DiT state dict")
    src.add_argument("--hf_dir", type=str, help="diffusers-layout dir")
    src.add_argument("--export_torch", type=str, metavar="CKPT_DIR",
                     help="reverse: framework checkpoint dir -> torch/HF")
    src.add_argument("--export_lora", type=str, metavar="LORA_PATH",
                     help="reverse: framework LoRA factors (trainer "
                          "--use_lora dir or .safetensors) -> the "
                          "reference's peft lora_weights.pt "
                          "(model.py:487-495 / pt.py:108-136 format)")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--pt_file", type=str, default=None,
                   help="(with --export_torch) also write a raw torch .pt "
                        "state dict at this path (pt.py:15-compatible)")
    # .pt-path architecture flags (`pt.py:24-33` defaults)
    p.add_argument("--width", type=int, default=3072)
    p.add_argument("--head_dim", type=int, default=256)
    p.add_argument("--patch_size", type=int, default=2)
    p.add_argument("--mlp_ratio", type=float, default=4.0)
    p.add_argument("--cross_attn_input_size", type=int, default=4096)
    p.add_argument("--residual_v", action="store_true", default=True)
    p.add_argument("--no_residual_v", dest="residual_v",
                   action="store_false")
    p.add_argument("--train_bias_and_rms", action="store_true")
    p.add_argument("--vae_dir", type=str, default=None,
                   help="diffusers VAE dir (config.json + safetensors)")
    p.add_argument("--text_encoder_dir", type=str, default=None)
    p.add_argument("--tokenizer_dir", type=str, default=None)
    p.add_argument("--test_image", action="store_true")
    p.add_argument("--strict", action="store_true",
                   help="fail (instead of warn) when the source ships "
                        "keys the conversion doesn't consume or lacks "
                        "keys the config implies — a loud replacement "
                        "for the reference's silent strict=False load "
                        "(pt.py:98-101); see convert/manifest.py")
    return p.parse_args(argv)


def _dit_config_from_sd(sd, args, hf_config=None):
    """Moved to f_lite_tpu.convert.ingest; this wrapper adapts the
    argparse namespace to the kwargs core."""
    from f_lite_tpu.convert.ingest import dit_config_from_state_dict

    return dit_config_from_state_dict(
        sd, hf_config,
        width=args.width, head_dim=args.head_dim,
        patch_size=getattr(args, "patch_size", 2),
        mlp_ratio=args.mlp_ratio,
        cross_attn_input_size=args.cross_attn_input_size,
        residual_v=args.residual_v,
        train_bias_and_rms=getattr(args, "train_bias_and_rms", False),
    )


def _hf_component_class(subdir: Path) -> str:
    """Concrete transformers class for a copied text_encoder/tokenizer dir.

    diffusers resolves model_index.json entries with
    getattr(transformers, name).from_pretrained(subdir): a tokenizer dir
    under "AutoModel" crashes (no weights there), so read the real class —
    tokenizer_config.json's tokenizer_class (e.g. T5Tokenizer) or model
    config.json's architectures[0] (e.g. T5EncoderModel) — falling back to
    the Auto loaders, which both classes of dir support."""
    tok_cfg = subdir / "tokenizer_config.json"
    if tok_cfg.exists():
        cls = json.loads(tok_cfg.read_text()).get("tokenizer_class")
        return cls or "AutoTokenizer"
    model_cfg = subdir / "config.json"
    if model_cfg.exists():
        arch = json.loads(model_cfg.read_text()).get("architectures") or []
        if arch:
            return arch[0]
    return "AutoTokenizer" if "tokenizer" in subdir.name else "AutoModel"


def export_torch(args):
    """Framework checkpoint -> reference-consumable torch/HF formats.

    Mirrors the reference converter's output layout (`f_lite_to_hf.py`:
    `pipe.save_pretrained` produces dit_model/, vae/, text_encoder/,
    tokenizer/ + model_index.json). The DiT/VAE safetensors carry the
    reference's exact torch key set and shapes, so the dirs load through
    the reference's own `pt.py` / diffusers paths shape-wise.
    """
    import numpy as np

    from f_lite_tpu.convert import invert_dit_params, invert_vae_params
    from f_lite_tpu.convert.jax_to_torch import (
        reference_dit_config,
        reference_vae_config,
    )
    from f_lite_tpu.models.dit import DiTConfig
    from f_lite_tpu.models.vae import VAEConfig
    from f_lite_tpu.pipeline import _config_kwargs, load_params_safetensors

    ck = Path(args.export_torch)
    out = Path(args.output_dir)
    cfg_d = json.loads((ck / "dit" / "config.json").read_text())
    cfg = DiTConfig(**_config_kwargs(DiTConfig, cfg_d))
    params = {"params": load_params_safetensors(
        ck / "dit" / "flax_params.safetensors"
    )}
    sd = invert_dit_params(params, cfg)
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    logger.info(
        "inverted DiT: width=%d depth=%d heads=%d (%d tensors)",
        cfg.hidden_size, cfg.depth, cfg.num_heads, len(sd),
    )

    from safetensors.numpy import save_file

    (out / "dit_model").mkdir(parents=True, exist_ok=True)
    save_file(sd, str(out / "dit_model" / "diffusion_pytorch_model.safetensors"))
    (out / "dit_model" / "config.json").write_text(
        json.dumps(reference_dit_config(cfg), indent=2)
    )

    index = {
        "_class_name": "FLitePipeline",
        "dit_model": ["f_lite.model", "DiT"],
    }
    vae_ck = ck / "vae"
    if vae_ck.exists():
        # the component entry exists only when the subdir is written —
        # diffusers-style consumers resolve every model_index.json entry
        index["vae"] = ["diffusers", "AutoencoderKL"]
        vcfg_d = json.loads((vae_ck / "config.json").read_text())
        vcfg = VAEConfig(**_config_kwargs(VAEConfig, {
            **vcfg_d,
            "block_out_channels": tuple(vcfg_d["block_out_channels"]),
        }))
        vsd = invert_vae_params(
            {"params": load_params_safetensors(
                vae_ck / "flax_params.safetensors"
            )},
            vcfg,
        )
        vsd = {k: np.asarray(v, np.float32) for k, v in vsd.items()}
        (out / "vae").mkdir(exist_ok=True)
        save_file(vsd, str(out / "vae" / "diffusion_pytorch_model.safetensors"))
        (out / "vae" / "config.json").write_text(
            json.dumps(reference_vae_config(vcfg), indent=2)
        )
        logger.info("inverted VAE (%d tensors)", len(vsd))
    for sub in ("text_encoder", "tokenizer"):
        if (ck / sub).exists():
            shutil.copytree(ck / sub, out / sub, dirs_exist_ok=True)
            index[sub] = ["transformers", _hf_component_class(out / sub)]
    (out / "model_index.json").write_text(json.dumps(index, indent=2))

    if args.pt_file:
        import torch

        torch.save(
            {k: torch.from_numpy(v) for k, v in sd.items()}, args.pt_file
        )
        logger.info("raw torch state dict written to %s", args.pt_file)
    logger.info("torch/HF export written to %s", out)
    return out


def export_lora(args):
    """Framework LoRA factors -> the reference's peft `lora_weights.pt`.

    The output loads through the reference's own
    `set_peft_model_state_dict` paths (inference `pt.py:108-136`, resume
    `train.py:768-771`); the opposite direction needs no tool — the
    pipeline's `lora_path=` accepts a reference `lora_weights.pt`
    directly (train/lora.py `load_lora_weights`)."""
    import numpy as np
    import torch

    from f_lite_tpu.convert import lora_to_peft_state_dict
    from f_lite_tpu.train.lora import load_lora_weights

    sd = lora_to_peft_state_dict(load_lora_weights(args.export_lora))
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    path = out / "lora_weights.pt"
    # explicit copy: jnp-backed arrays are non-writable and torch warns
    torch.save(
        {k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
        str(path),
    )
    logger.info("peft LoRA state dict (%d tensors) written to %s",
                len(sd), path)
    return path


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)
    if args.export_torch:
        return export_torch(args)
    if args.export_lora:
        return export_lora(args)

    from f_lite_tpu.convert.ingest import convert_reference_checkpoint

    out = convert_reference_checkpoint(
        args.output_dir,
        pt=args.pt,
        hf_dir=args.hf_dir,
        vae_dir=args.vae_dir,
        text_encoder_dir=args.text_encoder_dir,
        tokenizer_dir=args.tokenizer_dir,
        width=args.width,
        head_dim=args.head_dim,
        patch_size=args.patch_size,
        mlp_ratio=args.mlp_ratio,
        cross_attn_input_size=args.cross_attn_input_size,
        residual_v=args.residual_v,
        train_bias_and_rms=args.train_bias_and_rms,
        strict="error" if args.strict else None,
    )

    if args.test_image:
        # smoke test like `f_lite_to_hf.py:100-120`
        import jax.numpy as jnp

        from f_lite_tpu.pipeline import FLitePipeline
        from f_lite_tpu.text.encoder import ZeroTextEncoder

        pipe = FLitePipeline.from_pretrained(
            out, dtype=jnp.bfloat16, load_text_encoder=False
        )
        dit_cfg_d = json.loads((out / "dit" / "config.json").read_text())
        pipe.text_encoder = ZeroTextEncoder(
            embed_dim=dit_cfg_d["cross_attn_input_size"], seq_len=32
        )
        o = pipe(prompt="a photo of a cat", height=256, width=256,
                 num_inference_steps=4, seed=1,
                 return_latents=pipe.vae is None)
        img = o.images[0]
        if hasattr(img, "save"):
            img.save(out / "test_image.png")
        logger.info("smoke test image generated")

    return out


if __name__ == "__main__":
    main()
