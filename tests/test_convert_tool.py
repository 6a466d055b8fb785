"""Converter-tool tests: .pt and HF-layout inputs -> loadable pipeline with
output parity against the torch oracle."""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, "tools")

from f_lite_tpu.models.dit import DiTConfig
from f_lite_tpu.pipeline import FLitePipeline
from torch_oracle import make_random_state_dict, oracle_dit_forward

CFG = DiTConfig(
    in_channels=16, patch_size=2, hidden_size=64, depth=3, num_heads=4,
    mlp_ratio=4.0, cross_attn_input_size=48, residual_v=True,
    use_pallas_attention=False,
)


def _oracle_output(sd, cfg, seed=0):
    rs = np.random.RandomState(seed)
    x = rs.randn(1, cfg.in_channels, 16, 16).astype(np.float32)
    ctx = rs.randn(1, 8, cfg.cross_attn_input_size).astype(np.float32)
    t = rs.rand(1).astype(np.float32)
    mask = np.ones((1, 8), bool)
    ref = oracle_dit_forward(
        sd, cfg, torch.from_numpy(x), torch.from_numpy(ctx),
        torch.from_numpy(mask), torch.from_numpy(t),
    ).numpy()
    return x, ctx, mask, t, ref


class TestConvertPT:
    def test_pt_roundtrip_parity(self, tmp_path):
        from convert_checkpoint import main as convert_main

        sd = make_random_state_dict(CFG, seed=3)
        # wrap with the torch prefixes pt.py strips
        torch.save(
            {f"module.{k}": v for k, v in sd.items()},
            tmp_path / "model.pt",
        )
        out = convert_main([
            "--pt", str(tmp_path / "model.pt"),
            "--head_dim", "16",
            "--output_dir", str(tmp_path / "conv"),
        ])
        cfg_d = json.loads((out / "dit" / "config.json").read_text())
        assert cfg_d["depth"] == 3
        assert cfg_d["hidden_size"] == 64
        assert cfg_d["cross_attn_input_size"] == 48
        assert cfg_d["residual_v"] is True

        pipe = FLitePipeline.from_pretrained(
            out, dtype=jnp.float32, load_text_encoder=False
        )
        x, ctx, mask, t, ref = _oracle_output(sd, CFG)
        got = pipe.dit_model.apply(
            pipe.dit_params,
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(ctx), jnp.asarray(mask), jnp.asarray(t),
        )
        got = np.asarray(got).transpose(0, 3, 1, 2)
        assert ((got - ref) ** 2).mean() < 1e-9

    def test_hf_layout(self, tmp_path):
        from safetensors.numpy import save_file

        from convert_checkpoint import main as convert_main

        sd = make_random_state_dict(CFG, seed=4)
        hf = tmp_path / "hf"
        (hf / "dit_model").mkdir(parents=True)
        save_file(
            {k: v.numpy() for k, v in sd.items()},
            str(hf / "dit_model" / "diffusion_pytorch_model.safetensors"),
        )
        (hf / "dit_model" / "config.json").write_text(json.dumps({
            "in_channels": 16, "patch_size": 2, "hidden_size": 64,
            "depth": 3, "num_heads": 4, "mlp_ratio": 4.0,
            "cross_attn_input_size": 48, "residual_v": True,
        }))
        out = convert_main([
            "--hf_dir", str(hf),
            "--output_dir", str(tmp_path / "conv"),
        ])
        pipe = FLitePipeline.from_pretrained(
            out, dtype=jnp.float32, load_text_encoder=False
        )
        x, ctx, mask, t, ref = _oracle_output(sd, CFG, seed=1)
        got = pipe.dit_model.apply(
            pipe.dit_params,
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(ctx), jnp.asarray(mask), jnp.asarray(t),
        )
        got = np.asarray(got).transpose(0, 3, 1, 2)
        assert ((got - ref) ** 2).mean() < 1e-9

    def test_smoke_image(self, tmp_path):
        from convert_checkpoint import main as convert_main

        sd = make_random_state_dict(CFG, seed=5)
        torch.save(dict(sd), tmp_path / "m.pt")
        out = convert_main([
            "--pt", str(tmp_path / "m.pt"),
            "--head_dim", "16",
            "--output_dir", str(tmp_path / "conv"),
            "--test_image",
        ])
        # no VAE supplied -> smoke test runs latent-only; converted dir valid
        assert (out / "dit" / "flax_params.safetensors").exists()
