"""Batched serving CLI: prompts file -> PNGs + manifest; padded final
batch; tp sharding path on the virtual mesh."""

import json

import jax
import jax.numpy as jnp
import pytest

from f_lite_tpu.models.dit import DiT, DiTConfig
from f_lite_tpu.models.vae import AutoencoderKL, VAEConfig
from f_lite_tpu.pipeline import FLitePipeline
from f_lite_tpu.text.encoder import ZeroTextEncoder


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("model")
    cfg = DiTConfig(
        in_channels=4, patch_size=2, hidden_size=64, depth=2, num_heads=4,
        mlp_ratio=2.0, cross_attn_input_size=32, use_pallas_attention=False,
    )
    dit = DiT(cfg)
    params = dit.init_params(jax.random.key(0), text_len=8, image_size=8)
    vae = AutoencoderKL(VAEConfig.tiny())
    vparams = vae.init(jax.random.key(1), jnp.zeros((1, 8, 8, 3)))
    pipe = FLitePipeline(dit, params, vae, vparams,
                         ZeroTextEncoder(32, 8))
    pipe.save_pretrained(d)
    return d


class TestServe:
    def test_batch_serving(self, model_dir, tmp_path):
        from f_lite_tpu.serve import main

        pf = tmp_path / "prompts.txt"
        pf.write_text("a cat\na dog\na bird\na fish\na horse\n")
        out = tmp_path / "outs"
        manifest = main([
            "--model", str(model_dir),
            "--prompts", str(pf),
            "--batch_size", "2",
            "--width", "16", "--height", "16",
            "--steps", "1",
            "--no_text_encoder",
            "--output_dir", str(out),
        ])
        assert len(manifest["images"]) == 5  # padded batch trimmed
        assert (out / "00004.png").exists()
        m = json.loads((out / "manifest.json").read_text())
        assert m["images_per_min"] > 0
        # every PNG carries its generation parameters
        from f_lite_tpu.utils.image import read_metadata

        meta = read_metadata(out / "00002.png")
        assert meta["prompt"] == "a bird" and meta["steps"] == 1

    def test_tp_serving(self, model_dir, tmp_path):
        from f_lite_tpu.serve import main

        pf = tmp_path / "p.txt"
        pf.write_text("x\ny\n")
        out = tmp_path / "o2"
        manifest = main([
            "--model", str(model_dir),
            "--prompts", str(pf),
            "--batch_size", "2",
            "--width", "16", "--height", "16",
            "--steps", "1",
            "--tp", "4",
            "--no_text_encoder",
            "--output_dir", str(out),
        ])
        assert len(manifest["images"]) == 2
